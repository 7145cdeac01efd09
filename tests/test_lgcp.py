"""LGCP simulation (thinning) + fine-grid filter (BASELINE.json config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu import lgcp, simulate_lgcp
from composablestatespacemodels_tpu.inference.lgcp import lgcp_filter
from composablestatespacemodels_tpu.models import (brownian_motion,
                                                   brownian_params,
                                                   gen_brownian_motion,
                                                   gen_brownian_params, leaf,
                                                   param_node, parameters)
from composablestatespacemodels_tpu.utils.data import TimeSeries


@pytest.fixture(scope="module")
def lgcp_model():
    model = lgcp(brownian_motion(1))
    params = parameters(None, brownian_params(1.0, 0.05, 0.05))
    return model, params


def test_simulate_lgcp_produces_events(lgcp_model):
    model, params = lgcp_model
    events, grid = simulate_lgcp(model, params, jax.random.PRNGKey(2),
                                 0.0, 5.0, precision=2)
    assert len(events) > 0
    ts = np.asarray(events.ts)
    assert (ts >= 0).all() and (ts <= 5.0).all()
    assert (np.diff(ts) > 0).all()  # strictly increasing event times
    assert np.asarray(events.ys).min() == 1.0
    # grid covers [0, 5] at step 0.01
    assert abs(float(grid.ts[0])) < 1e-6
    assert len(grid) >= 500


def test_lgcp_event_rate_tracks_intensity():
    """Higher latent intensity => more events."""
    model = lgcp(brownian_motion(1))
    lo = parameters(None, brownian_params(0.0, 0.01, 0.01))
    hi = parameters(None, brownian_params(2.0, 0.01, 0.01))
    ev_lo, _ = simulate_lgcp(model, lo, jax.random.PRNGKey(3), 0.0, 10.0, 2)
    ev_hi, _ = simulate_lgcp(model, hi, jax.random.PRNGKey(3), 0.0, 10.0, 2)
    # rates ~ exp(0)=1/unit vs exp(2)~7.4/unit
    assert len(ev_hi) > len(ev_lo)


def test_lgcp_filter_runs(lgcp_model, key):
    model, params = lgcp_model
    events, _ = simulate_lgcp(model, params, key, 0.0, 4.0, precision=2)
    if len(events) < 3:
        pytest.skip("too few events simulated")
    data = TimeSeries(events.ts, events.ys,
                      jnp.ones(events.ts.shape, dtype=bool))
    res = lgcp_filter(model, params, data, 300, key, precision=1)
    assert np.isfinite(float(res.ll))
    assert res.ess.shape == (len(events),)
    assert bool((res.ess >= 1).all())
    assert res.eta_mean.shape == (len(events),)
    assert bool((res.eta_mean > 0).all())


def test_lgcp_filter_discriminates_parameters(key):
    """The filter's ll should prefer parameters near the generating ones."""
    model = lgcp(gen_brownian_motion(1))
    true_p = parameters(None, gen_brownian_params(1.5, 0.01, 0.0, 0.01))
    events, _ = simulate_lgcp(model, true_p, key, 0.0, 8.0, precision=2)
    if len(events) < 5:
        pytest.skip("too few events")
    data = TimeSeries(events.ts, events.ys,
                      jnp.ones(events.ts.shape, dtype=bool))
    far_p = parameters(None, gen_brownian_params(-2.0, 0.01, 0.0, 0.01))
    lls_true = [float(lgcp_filter(model, true_p, data, 200,
                                  jax.random.fold_in(key, i)).ll)
                for i in range(3)]
    lls_far = [float(lgcp_filter(model, far_p, data, 200,
                                 jax.random.fold_in(key, 10 + i)).ll)
               for i in range(3)]
    assert np.mean(lls_true) > np.mean(lls_far)


def test_lgcp_filter_zero_dt_step(lgcp_model, key):
    model, params = lgcp_model
    ts = jnp.asarray([0.5, 0.5, 1.0])  # repeated time => dt == 0 path
    data = TimeSeries(ts, jnp.ones_like(ts), jnp.ones(ts.shape, dtype=bool))
    res = lgcp_filter(model, params, data, 100, key, precision=1)
    assert np.isfinite(float(res.ll))
