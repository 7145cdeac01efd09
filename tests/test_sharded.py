"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest).

Validates: sharded PF ll matches the single-device filter statistically,
shard-count invariance of the resampling positions, and chain-parallel PMMH.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu import (kalman_filter, linear,
                                            log_likelihood, poisson,
                                            simulate_regular)
from composablestatespacemodels_tpu.models import (brownian_motion,
                                                   brownian_params, leaf,
                                                   ou_params, ou_process,
                                                   param_node, parameters,
                                                   perturb, seasonal, branch)
from composablestatespacemodels_tpu.parallel import (
    CHAIN_AXIS, PARTICLE_AXIS, make_mesh, particle_mesh,
    sharded_log_likelihood, sharded_pmmh)


@pytest.fixture(scope="module")
def lg_case():
    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = simulate_regular(model, params, jax.random.PRNGKey(0), 60, dt=0.5)
    return model, params, sim.to_timeseries()


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_ll_matches_kalman(lg_case, key):
    model, params, data, = lg_case
    mesh = particle_mesh()
    kf = kalman_filter(model, params, data)
    lls = [float(sharded_log_likelihood(model, params, data, 2048,
                                        jax.random.fold_in(key, i), mesh)[0])
           for i in range(5)]
    np.testing.assert_allclose(np.mean(lls), float(kf.ll), rtol=0.03)


def test_sharded_ll_composed_model(key):
    model = poisson(ou_process(1)) + seasonal(24, 2, ou_process(4))
    params = branch(
        leaf(param_node(None, ou_params(1.0, 0.2, 0.3, 1.0, 0.3))),
        leaf(param_node(None, ou_params(0.2, 0.2, 0.3, 0.2, 0.2))))
    sim = simulate_regular(model, params, key, 50, dt=1.0)
    data = sim.to_timeseries()
    mesh = particle_mesh()
    ll, ll_hist, ess, xf = sharded_log_likelihood(model, params, data, 1024,
                                                  key, mesh)
    assert np.isfinite(float(ll))
    assert ll_hist.shape == (50,)
    assert xf.shape == (1024, 5)
    # compare against single-device filter (statistically)
    lls_single = [float(log_likelihood(model, params, data, 1024,
                                       jax.random.fold_in(key, i)))
                  for i in range(4)]
    lls_shard = [float(sharded_log_likelihood(
        model, params, data, 1024, jax.random.fold_in(key, 10 + i), mesh)[0])
        for i in range(4)]
    assert abs(np.mean(lls_single) - np.mean(lls_shard)) < 3.0


def test_sharded_ess_bounds(lg_case, key):
    model, params, data = lg_case
    mesh = particle_mesh()
    _, _, ess, _ = sharded_log_likelihood(model, params, data, 512, key, mesh)
    assert bool((ess >= 1).all()) and bool((ess <= 512).all())


def test_mesh_shapes():
    m = make_mesh(2, 4)
    assert m.shape[CHAIN_AXIS] == 2
    assert m.shape[PARTICLE_AXIS] == 4
    with pytest.raises(ValueError):
        make_mesh(3, 3)


def test_sharded_pmmh_chains(lg_case, key):
    model, params, data = lg_case
    mesh = make_mesh(2, 4)
    res = sharded_pmmh(model, params, data, 256, key, 50, mesh,
                       proposal=perturb(0.01))
    assert res.lls.shape == (2, 50)
    assert res.accepted.shape == (2, 50)
    assert bool(jnp.isfinite(res.lls).all())
    # chains evolve independently
    assert float(jnp.abs(res.lls[0] - res.lls[1]).max()) > 0
    rates = np.asarray(res.acceptance_rate())
    assert (rates > 0).all()


def test_sharded_pf_not_divisible_raises(lg_case, key):
    model, params, data = lg_case
    mesh = particle_mesh()
    with pytest.raises(ValueError):
        sharded_log_likelihood(model, params, data, 1000 + 3, key, mesh)
