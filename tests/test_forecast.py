"""Forecasting: from a filtering state and from a posterior sample
(reference ParticleFilter.scala:368-410, Data.scala:202-231)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu import (bootstrap_filter, forecast,
                                            forecast_times, linear, pmmh,
                                            make_pf_loglik, simulate_regular)
from composablestatespacemodels_tpu.inference.filter import (
    forecast_from_posterior)
from composablestatespacemodels_tpu.inference.resampling import (
    posterior_sample, sample_many, sample_one)
from composablestatespacemodels_tpu.models import (brownian_motion,
                                                   brownian_params, ou_params,
                                                   ou_process, parameters,
                                                   perturb)
from composablestatespacemodels_tpu.utils import io as cio


@pytest.fixture(scope="module")
def fitted():
    model = linear(ou_process(1))
    params = parameters(jnp.log(0.3), ou_params(1.0, 0.5, 0.3, 1.0, 0.4))
    sim = simulate_regular(model, params, jax.random.PRNGKey(0), 80, dt=1.0)
    res = bootstrap_filter(model, params, sim.to_timeseries(), 2000,
                           jax.random.PRNGKey(1), store="summary")
    return model, params, sim, res


def test_forecast_brackets_future(fitted, key):
    model, params, sim, res = fitted
    t_last = float(sim.ts[-1])
    fc = forecast(model, params, res.final_particles, t_last, t_last + 1.0,
                  key)
    assert float(fc.obs_lower) < float(fc.obs_mean) < float(fc.obs_upper)
    # the OU is mean-reverting to mu=1: a short-horizon forecast stays sane
    assert abs(float(fc.eta_mean)) < 10


def test_forecast_times_widens(fitted, key):
    model, params, sim, res = fitted
    t_last = float(sim.ts[-1])
    ts = t_last + jnp.arange(1.0, 11.0)
    fc = forecast_times(model, params, res.final_particles, t_last, ts, key)
    width = np.asarray(fc.state_upper[:, 0] - fc.state_lower[:, 0])
    # uncertainty grows (at least initially) away from the data
    assert width[-1] >= width[0]


def test_forecast_from_posterior(fitted, key):
    model, params, sim, res = fitted
    pf_ll = make_pf_loglik(model, sim.to_timeseries(), 100)
    post = pmmh(key, params, pf_ll, perturb(0.01), 200).thin(50)
    t_last = float(sim.ts[-1])
    ts = t_last + jnp.arange(1.0, 6.0)
    fc = forecast_from_posterior(model, post.params, key, t_last, ts,
                                 n_samples=64,
                                 state_samples=res.final_particles[:64])
    assert fc.obs_mean.shape == (5,)
    assert bool((fc.obs_lower <= fc.obs_upper).all())
    assert np.isfinite(np.asarray(fc.obs_mean)).all()


def test_forecast_csv(tmp_path, fitted, key):
    model, params, sim, res = fitted
    t_last = float(sim.ts[-1])
    ts = t_last + jnp.arange(1.0, 4.0)
    fc = forecast_times(model, params, res.final_particles, t_last, ts, key)
    p = str(tmp_path / "fc.csv")
    cio.write_forecast_csv(p, fc)
    rows = open(p).read().strip().split("\n")
    assert len(rows) == 3
    assert len(rows[0].split(",")) == 8  # t + 6 summaries + 1 state dim


def test_filter_json(tmp_path, fitted):
    model, params, sim, res = fitted
    p = str(tmp_path / "filtered.json")
    cio.write_filter_json(p, res)
    import json
    rec = json.loads(open(p).readline())
    assert set(rec) >= {"time", "eta", "etaIntervals", "state", "ess", "ll"}


def test_sampling_utils(key):
    xs = {"a": jnp.arange(100.0), "b": jnp.arange(200.0).reshape(100, 2)}
    one = sample_one(key, xs)
    assert one["a"].shape == ()
    many = sample_many(key, 10, xs)
    assert many["a"].shape == (10,)
    assert len(np.unique(np.asarray(many["a"]))) == 10  # no replacement
    post = posterior_sample(key, xs, 500)
    assert post["a"].shape == (500,)
