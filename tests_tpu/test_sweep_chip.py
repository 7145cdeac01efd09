"""On-chip gate for the fused small-N PF sweep kernel (ops/sweep_kernel).

Validates, on the REAL Mosaic compiler and PRNG:
* the linear-Gaussian sweep's ll estimator is unbiased against the exact
  Kalman likelihood (B chains with identical params = B iid estimates);
* the flagship composed model's sweep agrees with the XLA bootstrap
  filter's estimate within joint MC error;
* determinism: the same (key, params) reproduces the ll bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

import composablestatespacemodels_tpu as cssm
from composablestatespacemodels_tpu.models import (branch, brownian_motion,
                                                   brownian_params, leaf,
                                                   ou_params, param_node,
                                                   parameters)


def _bcast(params, b):
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (b,) + jnp.shape(x)), params)


def test_sweep_ll_unbiased_vs_kalman(key):
    model = cssm.linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), 120,
                                dt=0.5)
    data = sim.to_timeseries()
    kf = cssm.kalman_filter(model, params, data)
    b = 64
    pf_all = cssm.make_pf_loglik_chains(model, data, 128)
    lls = np.asarray(pf_all(key, _bcast(params, b)))
    assert np.isfinite(lls).all()
    err = abs(lls.mean() - float(kf.ll))
    sd = lls.std() / np.sqrt(b)
    assert err < max(4 * sd, 0.5), (lls.mean(), float(kf.ll), sd)


def test_sweep_ll_matches_xla_filter_flagship(key):
    model = (cssm.poisson(cssm.ou_process(1))
             + cssm.seasonal(24, 3, cssm.ou_process(6)))
    params = branch(
        leaf(param_node(None, ou_params(1.0, 0.2, 0.3, 1.0, 0.3))),
        leaf(param_node(None, ou_params(0.2, 0.2, 0.25, 0.2, 0.2))))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), 100,
                                dt=1.0)
    data = sim.to_timeseries()
    b = 64
    pf_all = cssm.make_pf_loglik_chains(model, data, 100)
    lls = np.asarray(pf_all(key, _bcast(params, b)))
    assert np.isfinite(lls).all()
    xla = np.asarray([float(cssm.log_likelihood(
        model, params, data, 100, jax.random.fold_in(key, i)))
        for i in range(8)])
    joint_sd = np.sqrt(lls.var() / b + xla.var() / 8)
    err = abs(lls.mean() - xla.mean())
    assert err < max(4 * joint_sd, 1.0), (lls.mean(), xla.mean(), joint_sd)


def test_sweep_deterministic(key):
    model = cssm.linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), 40,
                                dt=0.5)
    data = sim.to_timeseries()
    pf_all = cssm.make_pf_loglik_chains(model, data, 100)
    p8 = _bcast(params, 8)
    a = np.asarray(pf_all(key, p8))
    bb = np.asarray(pf_all(key, p8))
    np.testing.assert_array_equal(a, bb)
    c = np.asarray(pf_all(jax.random.fold_in(key, 1), p8))
    assert (a != c).any()
    # chains see independent streams even with identical params
    assert np.unique(a).size > 4


def test_sweep_multichunk_ll_unbiased_vs_kalman(key):
    """N=256 and N=512 multi-chunk sweeps (VERDICT r4 #2 gate): ll
    unbiased against the exact Kalman likelihood on the real chip."""
    model = cssm.linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), 120,
                                dt=0.5)
    data = sim.to_timeseries()
    kf = cssm.kalman_filter(model, params, data)
    for n, b in ((256, 32), (512, 16)):
        pf_all = cssm.make_pf_loglik_chains(model, data, n)
        lls = np.asarray(pf_all(jax.random.fold_in(key, n),
                                _bcast(params, b)))
        assert np.isfinite(lls).all(), n
        err = abs(lls.mean() - float(kf.ll))
        sd = lls.std() / np.sqrt(b)
        assert err < max(4 * sd, 0.5), (n, lls.mean(), float(kf.ll), sd)


def test_sweep_multichunk_matches_xla_filter_flagship(key):
    """N=256 flagship composed-model sweep agrees with the XLA bootstrap
    filter within joint MC error, and reproduces bitwise."""
    model = (cssm.poisson(cssm.ou_process(1))
             + cssm.seasonal(24, 3, cssm.ou_process(6)))
    params = branch(
        leaf(param_node(None, ou_params(1.0, 0.2, 0.3, 1.0, 0.3))),
        leaf(param_node(None, ou_params(0.2, 0.2, 0.25, 0.2, 0.2))))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), 100,
                                dt=1.0)
    data = sim.to_timeseries()
    b = 32
    pf_all = cssm.make_pf_loglik_chains(model, data, 256)
    p_b = _bcast(params, b)
    lls = np.asarray(pf_all(key, p_b))
    assert np.isfinite(lls).all()
    xla = np.asarray([float(cssm.log_likelihood(
        model, params, data, 256, jax.random.fold_in(key, i)))
        for i in range(8)])
    joint_sd = np.sqrt(lls.var() / b + xla.var() / 8)
    err = abs(lls.mean() - xla.mean())
    assert err < max(4 * joint_sd, 1.0), (lls.mean(), xla.mean(), joint_sd)
    np.testing.assert_array_equal(lls, np.asarray(pf_all(key, p_b)))
