"""SDE transition-moment tests against closed forms (SURVEY.md section 7 step 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from composablestatespacemodels_tpu.models import (
    brownian_motion, brownian_params, compose_sde, gen_brownian_motion,
    gen_brownian_params, ou_params, ou_process)


def _moments(step_fn, x0, dt, key, n=20000):
    keys = jax.random.split(key, n)
    xs = jax.vmap(lambda k: step_fn(k, x0, dt))(keys)
    return jnp.mean(xs, axis=0), jnp.var(xs, axis=0)


def test_brownian_exact_moments(key):
    sde = brownian_motion(2)
    p = brownian_params([0.5, -0.5], 1.0, [2.0, 0.5])
    x0 = jnp.asarray([1.0, -1.0])
    dt = 0.3
    mean, var = _moments(lambda k, x, d: sde.step(p, k, x, d), x0, dt, key)
    np.testing.assert_allclose(mean, x0, atol=0.03)
    # sigma is the variance rate: var = sigma * dt
    np.testing.assert_allclose(var, [2.0 * dt, 0.5 * dt], rtol=0.05)


def test_gen_brownian_exact_moments(key):
    sde = gen_brownian_motion(2)
    p = gen_brownian_params(0.0, 1.0, [1.0, -2.0], 1.5)
    x0 = jnp.asarray([0.0, 0.0])
    dt = 0.2
    mean, var = _moments(lambda k, x, d: sde.step(p, k, x, d), x0, dt, key)
    np.testing.assert_allclose(mean, [1.0 * dt, -2.0 * dt], atol=0.03)
    np.testing.assert_allclose(var, 1.5 * dt, rtol=0.05)


def test_ou_exact_moments(key):
    sde = ou_process(1)
    phi, mu, sigma = 0.4, 2.0, 0.7
    p = ou_params(0.0, 1.0, phi, mu, sigma)
    x0 = jnp.asarray([5.0])
    dt = 0.8
    mean, var = _moments(lambda k, x, d: sde.step(p, k, x, d), x0, dt, key)
    want_mean = mu + (5.0 - mu) * np.exp(-phi * dt)
    want_var = sigma**2 / (2 * phi) * (1 - np.exp(-2 * phi * dt))
    np.testing.assert_allclose(mean, want_mean, rtol=0.01)
    np.testing.assert_allclose(var, want_var, rtol=0.05)


def test_ou_euler_maruyama_close_to_exact_small_dt(key):
    sde = ou_process(1)
    p = ou_params(0.0, 1.0, 0.3, 1.0, 0.5)
    x0 = jnp.asarray([2.0])
    dt = 0.01
    k1, k2 = jax.random.split(key)
    mean_e, var_e = _moments(lambda k, x, d: sde.step(p, k, x, d), x0, dt, k1)
    mean_a, var_a = _moments(
        lambda k, x, d: sde.step_euler_maruyama(p, k, x, d), x0, dt, k2)
    np.testing.assert_allclose(mean_e, mean_a, rtol=1e-3)
    np.testing.assert_allclose(var_e, var_a, rtol=0.1)


def test_initial_state_moments(key):
    sde = ou_process(3)
    p = ou_params([1.0, 2.0, 3.0], [0.5], 0.3, 0.0, 1.0)
    xs = sde.initial_state(p, key, (50000,))
    np.testing.assert_allclose(jnp.mean(xs, axis=0), [1.0, 2.0, 3.0],
                               atol=0.02)
    np.testing.assert_allclose(jnp.var(xs, axis=0), 0.5, rtol=0.05)


def test_composed_sde_blockwise(key):
    left = ou_process(1)
    right = brownian_motion(2)
    sde = compose_sde(left, right)
    assert sde.dim == 3
    pl = ou_params(0.0, 1.0, 0.5, 1.0, 0.3)
    pr = brownian_params(0.0, 1.0, 0.2)
    x0 = jnp.asarray([4.0, 1.0, -1.0])
    dt = 0.5
    mean, var = _moments(lambda k, x, d: sde.step((pl, pr), k, x, d), x0, dt,
                         key)
    want_ou_mean = 1.0 + (4.0 - 1.0) * np.exp(-0.5 * dt)
    np.testing.assert_allclose(mean[0], want_ou_mean, rtol=0.01)
    np.testing.assert_allclose(mean[1:], x0[1:], atol=0.02)
    np.testing.assert_allclose(var[1:], 0.2 * dt, rtol=0.06)


def test_param_recycling_in_sde(key):
    # scalar params recycled to dimension (Sde.scala:177-179)
    sde = ou_process(8)
    p = ou_params(0.0, 1.0, 0.3, 0.5, 0.4)
    x = sde.initial_state(p, key, (16,))
    assert x.shape == (16, 8)
    x1 = sde.step(p, key, x, 0.1)
    assert x1.shape == (16, 8)


def test_simulate_path_shape(key):
    sde = brownian_motion(2)
    p = brownian_params(0.0, 1.0, 1.0)
    ts, xs = sde.simulate(p, key, 0.0, 0.1, 100)
    assert ts.shape == (101,)
    assert xs.shape == (101, 2)
    # Brownian variance grows linearly: var(x_t) ~ c0 + sigma * t
    assert float(jnp.abs(xs[-1]).max()) < 50


def test_transition_coeffs_match_step_moments(key):
    sde = ou_process(2)
    p = ou_params(0.0, 1.0, [0.3, 0.6], [1.0, -1.0], 0.5)
    dt = 0.7
    a, b, q = sde.transition_coeffs(p, dt)
    x0 = jnp.asarray([2.0, 3.0])
    mean, var = _moments(lambda k, x, d: sde.step(p, k, x, d), x0, dt, key)
    np.testing.assert_allclose(mean, a * x0 + b, rtol=0.02)
    np.testing.assert_allclose(var, q, rtol=0.06)
