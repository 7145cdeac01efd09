"""Model composition tests, mirroring the reference ModelTest.scala:11-139:
combined dimensions, left-biased observation, componentwise f, and the
noise-free fixture pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu.models import (
    Branch, Leaf, branch, brownian_motion, brownian_params, compose, leaf,
    linear, observation, ou_params, ou_process, param_node, parameters,
    poisson, seasonal)


def _linear_params(scale=1.0):
    return parameters(jnp.log(scale), brownian_params(0.5, 1.0, 1.0))


def test_composed_dimension():
    m = poisson(ou_process(1)) + seasonal(24, 4, ou_process(8))
    assert m.dim == 9
    assert m.slices() == [(0, 1), (1, 8)]
    assert len(m.components()) == 2


def test_three_model_composition_dimension():
    m = (linear(brownian_motion(1)) + seasonal(24, 2, ou_process(4))
         + seasonal(168, 3, ou_process(6)))
    assert m.dim == 11
    assert m.slices() == [(0, 1), (1, 4), (5, 6)]


def test_left_biased_observation():
    m = poisson(ou_process(1)) + seasonal(24, 4, ou_process(8))
    assert isinstance(m.obs, observation.Poisson)
    m2 = seasonal(24, 4, ou_process(8)) + poisson(ou_process(1))
    assert isinstance(m2.obs, observation.Gaussian)


def test_composed_f_is_sum():
    m = linear(brownian_motion(1)) + linear(brownian_motion(1))
    x = jnp.asarray([2.0, 3.0])
    np.testing.assert_allclose(m.f(x, 0.0), 5.0)


def test_seasonal_design_vector():
    m = seasonal(24, 2, ou_process(4))
    t = 3.0
    freq = 2 * np.pi / 24
    want = [np.cos(freq * t), np.sin(freq * t),
            np.cos(2 * freq * t), np.sin(2 * freq * t)]
    np.testing.assert_allclose(m.design_vector(t), want, rtol=1e-5, atol=1e-6)
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(m.f(x, t), np.dot(want, x), rtol=1e-5)


def test_f_batched_over_particles():
    m = poisson(ou_process(1)) + seasonal(24, 1, ou_process(2))
    x = jnp.ones((16, 3))
    g = m.f(x, 1.0)
    assert g.shape == (16,)


def test_component_f_decomposition():
    m = linear(brownian_motion(1)) + seasonal(24, 1, ou_process(2))
    x = jnp.asarray([5.0, 1.0, 2.0])
    g0 = m.component_f(x, 7.0, 0)
    g1 = m.component_f(x, 7.0, 1)
    np.testing.assert_allclose(g0 + g1, m.f(x, 7.0), rtol=1e-5)
    np.testing.assert_allclose(g0, 5.0)
    d = m.decompose(x, 7.0)
    assert d.shape == (2,)
    np.testing.assert_allclose(d[0] + d[1], m.f(x, 7.0), rtol=1e-5)


def test_validate_params_structure():
    m = poisson(ou_process(1)) + seasonal(24, 4, ou_process(8))
    good = branch(
        leaf(param_node(None, ou_params(0.0, 1.0, 0.3, 0.0, 0.5))),
        leaf(param_node(jnp.log(1.0), ou_params(0.0, 1.0, 0.3, 0.0, 0.5))))
    m.validate_params(good)  # no raise

    with pytest.raises(TypeError):
        m.validate_params(
            leaf(param_node(None, ou_params(0.0, 1.0, 0.3, 0.0, 0.5))))

    leaf_model = poisson(ou_process(1))
    with pytest.raises(TypeError):
        leaf_model.validate_params(good)


def test_validate_requires_scale():
    m = linear(brownian_motion(1))
    with pytest.raises(ValueError):
        m.validate_params(leaf(param_node(None, brownian_params(0, 1, 1))))


def test_validate_scale_must_be_scalar():
    m = linear(brownian_motion(1))
    with pytest.raises(ValueError, match="scalar"):
        m.validate_params(
            leaf(param_node(jnp.asarray([0.5]), brownian_params(0, 1, 1))))


def test_validate_wrong_sde_params():
    m = linear(brownian_motion(1))
    with pytest.raises(TypeError):
        m.validate_params(
            leaf(param_node(0.0, ou_params(0.0, 1.0, 0.3, 0.0, 0.5))))


def test_seasonal_harmonics_dim_check():
    m = seasonal(24, 4, ou_process(6))  # needs 8 dims
    with pytest.raises(ValueError):
        m.validate_params(
            leaf(param_node(0.0, ou_params(0.0, 1.0, 0.3, 0.0, 0.5))))


def test_composed_observation_passthrough(key):
    """Composing with a no-noise linear model: observation mean == eta ==
    combined f (ModelTest.scala:72-86 analogue)."""
    m = linear(brownian_motion(1)) + linear(brownian_motion(1))
    p = branch(_linear_params(1e-6), leaf(
        param_node(jnp.log(1e-6), brownian_params(0.5, 1.0, 1.0))))
    x = jnp.asarray([1.5, 2.5])
    gamma = m.f(x, 0.0)
    y = m.sample_obs(key, p, gamma)
    np.testing.assert_allclose(y, 4.0, atol=1e-3)


def test_step_advances_composed_state(key):
    m = poisson(ou_process(1)) + seasonal(24, 4, ou_process(8))
    p = branch(
        leaf(param_node(None, ou_params(0.0, 1.0, 0.3, 0.0, 0.5))),
        leaf(param_node(jnp.log(1.0), ou_params(0.0, 1.0, 0.3, 0.0, 0.5))))
    x0 = m.initial_state(p, key, (32,))
    assert x0.shape == (32, 9)
    x1 = m.step(p, key, x0, 0.1)
    assert x1.shape == (32, 9)
    assert not np.allclose(np.asarray(x0), np.asarray(x1))


def test_leaf_hash_eq_contract():
    """Equal trees must hash equally (round-1 defect: Leaf hashed id())."""
    from composablestatespacemodels_tpu.models import branch, leaf

    a = branch(leaf(jnp.asarray([1.0, 2.0])), leaf(jnp.asarray(3.0)))
    b = branch(leaf(jnp.asarray([1.0, 2.0])), leaf(jnp.asarray(3.0)))
    assert a == b
    assert hash(a) == hash(b)
    assert {a: 1}[b] == 1


def test_model_is_hashable_static():
    m1 = poisson(ou_process(1)) + seasonal(24, 4, ou_process(8))
    m2 = poisson(ou_process(1)) + seasonal(24, 4, ou_process(8))
    assert m1 == m2
    assert hash(m1) == hash(m2)

    @jax.jit
    def f(x):
        return m1.f(x, 0.5)

    out = f(jnp.ones((4, 9)))
    assert out.shape == (4,)


def test_leaf_hash_eq_mixed_types():
    """Equal-but-differently-typed leaf values must hash equally
    (review finding: float64 vs float32 bytes split equal leaves), and
    equality is shape-strict so it stays coherent with the hash."""
    import numpy as np

    from composablestatespacemodels_tpu.models import leaf

    a, b = leaf(1.0), leaf(np.float32(1.0))
    assert a == b and hash(a) == hash(b)
    assert {a: 1}[b] == 1
    c = leaf(np.asarray([1.0, 2.0], np.float32))
    d = leaf(np.asarray([1.0, 2.0], np.float64))
    assert c == d and hash(c) == hash(d)
    # broadcastable values are NOT equal leaves (shape-strict equality)
    assert leaf(np.ones(3)) != leaf(1.0)
    # int/float equal values hash equally
    e, f = leaf(3), leaf(3.0)
    assert e == f and hash(e) == hash(f)


def test_bare_param_node_full_surface(key):
    """A bare ParamNode is a valid single-leaf parameter everywhere the
    validator accepts it (review finding: obs_scale rejected it)."""
    from composablestatespacemodels_tpu import (log_likelihood, poisson,
                                                simulate_regular)
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       param_node)

    m = poisson(brownian_motion(1))
    p = param_node(None, brownian_params(0.0, 1.0, 0.3))
    m.validate_params(p)
    sim = simulate_regular(m, p, key, 10)
    ll = float(log_likelihood(m, p, sim.to_timeseries(), 64, key))
    assert np.isfinite(ll)


def test_leaf_hash_eq_param_node_values():
    """ParamNode leaves (the library's primary leaf type) satisfy the
    hash/eq contract, including vector-valued fields."""
    import numpy as np

    from composablestatespacemodels_tpu.models import (brownian_params, leaf,
                                                       param_node)

    a = leaf(param_node(0.5, brownian_params(
        np.asarray([0.0, 0.5]), np.asarray([1.0, 1.0]),
        np.asarray([1.0, 2.0]))))
    b = leaf(param_node(0.5, brownian_params(
        np.asarray([0.0, 0.5]), np.asarray([1.0, 1.0]),
        np.asarray([1.0, 2.0]))))
    assert a == b
    assert hash(a) == hash(b)
    assert {a: 1}[b] == 1
    c = leaf(param_node(0.5, brownian_params(
        np.asarray([0.0, 0.6]), np.asarray([1.0, 1.0]),
        np.asarray([1.0, 2.0]))))
    assert a != c
