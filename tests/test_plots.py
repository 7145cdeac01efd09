"""Figure-output smoke tests (the in-library replacement for R/Plots.R).

Each helper must produce a non-trivial PNG from real pipeline outputs.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from composablestatespacemodels_tpu import (bootstrap_filter, forecast_times,
                                            linear, simulate_regular)
from composablestatespacemodels_tpu.inference import pmmh as pm
from composablestatespacemodels_tpu.models import (brownian_motion,
                                                   brownian_params,
                                                   parameters, perturb)
from composablestatespacemodels_tpu.utils import plots


@pytest.fixture(scope="module")
def pipeline(key=jax.random.PRNGKey(11)):
    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = simulate_regular(model, params, key, 40, dt=0.5)
    data = sim.to_timeseries()
    res = bootstrap_filter(model, params, data, 256, key, store="summary")
    return model, params, sim, data, res


def _check_png(path):
    assert os.path.exists(path)
    assert os.path.getsize(path) > 2000
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_plot_simulation(tmp_path, pipeline):
    _, _, sim, _, _ = pipeline
    p = str(tmp_path / "sim.png")
    plots.plot_simulation(sim, p)
    _check_png(p)


def test_plot_filtering(tmp_path, pipeline):
    _, _, _, data, res = pipeline
    p = str(tmp_path / "filt.png")
    plots.plot_filtering(res.summary, data, p, show_states=True)
    _check_png(p)


def test_plot_forecast(tmp_path, pipeline):
    model, params, _, data, res = pipeline
    key = jax.random.PRNGKey(3)
    fc = forecast_times(model, params, res.final_particles,
                        float(data.ts[-1]),
                        jnp.linspace(21.0, 25.0, 8), key)
    p = str(tmp_path / "fc.png")
    plots.plot_forecast(fc, data, p)
    _check_png(p)


def test_plot_pilot_run(tmp_path):
    p = str(tmp_path / "pilot.png")
    plots.plot_pilot_run([100, 200, 400, 800], [2.0, 1.1, 0.4, 0.2], p)
    _check_png(p)


def test_plot_posterior_and_diagnostics(tmp_path, pipeline):
    model, params, _, data, _ = pipeline
    pf_ll = pm.make_pf_loglik(model, data, 64)
    res = pm.pmmh(jax.random.PRNGKey(5), params, pf_ll, perturb(0.05), 40)
    p = str(tmp_path / "post.png")
    plots.plot_posterior(res, path=p, burn_in=5)
    _check_png(p)
    p2 = str(tmp_path / "diag.png")
    plots.plot_diagnostics(res, path=p2)
    _check_png(p2)
    # stacked chains overlay
    res2 = pm.pmmh_chains(jax.random.PRNGKey(6), params, pf_ll,
                          perturb(0.05), 30, 2)
    p3 = str(tmp_path / "post2.png")
    plots.plot_posterior(res2, path=p3)
    _check_png(p3)
