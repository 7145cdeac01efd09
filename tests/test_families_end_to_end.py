"""Simulate-then-filter smoke+tracking tests for every observation family
(the capability checklist of SURVEY.md section 2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import composablestatespacemodels_tpu as cssm
from composablestatespacemodels_tpu.models import (brownian_params,
                                                   gen_brownian_params,
                                                   ou_params, parameters)

CASES = {
    "poisson": (lambda: cssm.poisson(cssm.ou_process(1)),
                lambda: parameters(None, ou_params(1.0, 0.3, 0.3, 1.0, 0.3))),
    "linear": (lambda: cssm.linear(cssm.brownian_motion(1)),
               lambda: parameters(jnp.log(0.5),
                                  brownian_params(0.0, 1.0, 0.3))),
    "seasonal": (lambda: cssm.seasonal(24, 2, cssm.ou_process(4)),
                 lambda: parameters(jnp.log(0.5),
                                    ou_params(0.5, 0.2, 0.3, 0.5, 0.2))),
    "bernoulli": (lambda: cssm.bernoulli(cssm.ou_process(1)),
                  lambda: parameters(None,
                                     ou_params(0.0, 0.5, 0.3, 0.0, 0.5))),
    "beta": (lambda: cssm.beta(cssm.ou_process(1)),
             lambda: parameters(jnp.log(2.0),
                                ou_params(0.5, 0.2, 0.3, 0.5, 0.3))),
    "students_t": (lambda: cssm.students_t(cssm.ou_process(1), df=5),
                   lambda: parameters(jnp.log(0.4),
                                      ou_params(1.0, 0.3, 0.3, 1.0, 0.4))),
    "negative_binomial": (
        lambda: cssm.negative_binomial(cssm.ou_process(1)),
        lambda: parameters(jnp.log(3.0), ou_params(1.0, 0.3, 0.3, 1.0, 0.3))),
    "zero_inflated_poisson": (
        lambda: cssm.zero_inflated_poisson(cssm.ou_process(1)),
        lambda: parameters(0.0, ou_params(1.0, 0.3, 0.3, 1.0, 0.3))),
    "gen_brownian_linear": (
        lambda: cssm.linear(cssm.gen_brownian_motion(1)),
        lambda: parameters(jnp.log(0.5),
                           gen_brownian_params(0.0, 0.5, 0.05, 0.2))),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_family_simulate_filter_roundtrip(name, key):
    make_model, make_params = CASES[name]
    model, params = make_model(), make_params()
    sim = cssm.simulate_regular(model, params, jax.random.fold_in(key, 1),
                                150, dt=0.5)
    data = sim.to_timeseries()

    # observations respect the family's support
    ys = np.asarray(sim.ys)
    if name in ("poisson", "negative_binomial", "zero_inflated_poisson"):
        assert (ys >= 0).all() and np.allclose(ys, np.round(ys))
    if name == "bernoulli":
        assert set(np.unique(ys)) <= {0.0, 1.0}
    if name == "beta":
        assert (ys > 0).all() and (ys < 1).all()

    res = cssm.bootstrap_filter(model, params, data, 1000,
                                jax.random.fold_in(key, 2), store="summary")
    assert np.isfinite(float(res.ll))
    assert bool((res.ess >= 1).all())

    # filtered eta should correlate with the generative eta for
    # informative-observation families
    if name not in ("bernoulli",):
        corr = np.corrcoef(np.asarray(res.summary.eta_mean),
                           np.asarray(sim.etas))[0, 1]
        assert corr > 0.3, f"{name}: eta tracking corr {corr:.2f}"

    # ll discriminates against mangled parameters
    from composablestatespacemodels_tpu.models import add_flat, param_size
    far = add_flat(params, 3.0 * jnp.ones(param_size(params)))
    lls_true = [float(cssm.log_likelihood(model, params, data, 500,
                                          jax.random.fold_in(key, 10 + i)))
                for i in range(2)]
    lls_far = [float(cssm.log_likelihood(model, far, data, 500,
                                         jax.random.fold_in(key, 20 + i)))
               for i in range(2)]
    assert np.mean(lls_true) > np.mean(lls_far), f"{name}: ll not informative"
