"""Parameter tree tests, mirroring the reference ParameterTest.scala:19-77
(flatten round-trips, add-commutativity) plus bijector round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu.models import (
    BrownianParams, GenBrownianParams, OuParams, add_flat, bijectors, branch,
    brownian_params, covariance_params, flatten_params, gen_brownian_params,
    leaf, ou_params, param_names, param_node, param_repeat, param_size,
    perturb, perturb_mvn, perturb_mvn_eigen)


def make_tree():
    p1 = param_node(jnp.log(2.0), ou_params(0.1, 1.0, 0.3, 0.5, 0.4))
    p2 = param_node(None, brownian_params([0.0, 1.0], [1.0, 2.0], 0.5))
    return branch(leaf(p1), leaf(p2))


def test_bijector_roundtrip():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        bijectors.logistic(bijectors.logit(x)), x, rtol=1e-4)
    v = jnp.asarray([0.3, 2.0, 10.0])
    np.testing.assert_allclose(
        bijectors.from_log(bijectors.to_log(v)), v, rtol=1e-4)


def test_constrained_constructors_store_unconstrained():
    p = ou_params(0.0, 1.0, 0.5, 0.0, 2.0)
    np.testing.assert_allclose(p.c0, 0.0, atol=1e-7)       # log(1) = 0
    np.testing.assert_allclose(p.phi, 0.0, atol=1e-7)      # logit(0.5) = 0
    np.testing.assert_allclose(p.sigma, np.log(2.0), rtol=1e-6)


def test_flatten_order_matches_reference():
    # m0 ++ c0 ++ phi ++ mu ++ sigma, scale first (Parameters.scala:88-95)
    p = param_node(jnp.asarray(7.0),
                   OuParams(*[jnp.asarray([float(i)]) for i in range(1, 6)]))
    flat = flatten_params(p)
    np.testing.assert_allclose(flat, [7.0, 1.0, 2.0, 3.0, 4.0, 5.0])


def test_flatten_tree_left_to_right():
    tree = make_tree()
    flat = flatten_params(tree)
    # leaf 1: scale + 5 OU params = 6; leaf 2: 2+2+1 Brownian = 5
    assert flat.shape == (11,)
    assert param_size(tree) == 11
    names = param_names(tree)
    assert names[0] == "scale"
    assert len(names) == 11
    assert "phi_0" in names and "mu_0" in names


def test_add_flat_roundtrip():
    tree = make_tree()
    delta = jnp.arange(11.0)
    tree2 = add_flat(tree, delta)
    np.testing.assert_allclose(
        flatten_params(tree2), flatten_params(tree) + delta, rtol=1e-6)
    # adding commutes with flatten (ParameterTest.scala:62-76)
    tree3 = add_flat(tree2, -delta)
    np.testing.assert_allclose(
        flatten_params(tree3), flatten_params(tree), atol=1e-5)


def test_param_repeat():
    v = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(param_repeat(v, 7),
                               [1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(param_repeat(v, 2), [1.0, 2.0])


def test_perturb_preserves_structure(key):
    tree = make_tree()
    prop = perturb(0.05)
    tree2 = prop(key, tree)
    assert (jax.tree_util.tree_structure(tree2)
            == jax.tree_util.tree_structure(tree))
    d = flatten_params(tree2) - flatten_params(tree)
    assert float(jnp.std(d)) > 0


def test_perturb_mvn_statistics(key):
    dim = 11
    tree = make_tree()
    cov = jnp.diag(jnp.full((dim,), 0.25))
    prop_c = perturb_mvn(jnp.linalg.cholesky(cov))
    prop_e = perturb_mvn_eigen(cov)
    keys = jax.random.split(key, 4000)
    flat0 = flatten_params(tree)
    for prop in (prop_c, prop_e):
        samples = jax.vmap(lambda k: flatten_params(prop(k, tree)))(keys)
        d = samples - flat0[None, :]
        np.testing.assert_allclose(jnp.std(d, axis=0), 0.5, rtol=0.12)
        np.testing.assert_allclose(jnp.mean(d, axis=0), 0.0, atol=0.05)


def test_covariance_params(key):
    tree = make_tree()
    keys = jax.random.split(key, 5000)
    prop = perturb(0.09)
    samples = jax.vmap(lambda k: prop(k, tree))(keys)
    cov = covariance_params(samples)
    assert cov.shape == (11, 11)
    np.testing.assert_allclose(jnp.diag(cov), 0.09, rtol=0.15)


def test_gen_brownian_flatten_order():
    p = GenBrownianParams(*[jnp.asarray([float(i)]) for i in range(1, 5)])
    np.testing.assert_allclose(flatten_params(p), [1.0, 2.0, 3.0, 4.0])


def test_brownian_flatten_order():
    p = BrownianParams(*[jnp.asarray([float(i)]) for i in range(1, 4)])
    np.testing.assert_allclose(flatten_params(p), [1.0, 2.0, 3.0])
