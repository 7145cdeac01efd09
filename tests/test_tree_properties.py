"""Property tests for the tree algebra and parameter arithmetic.

Mirrors the reference's ScalaCheck suites: random-tree Monoid laws
(TreeTests.scala:16-35) and the add/plus commutativity properties on
parameter trees (ParameterTest.scala:62-76), with numpy-RNG generators
instead of ScalaCheck (depth <= 6, 50 trials).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu.models.params import (add_flat,
                                                          flatten_params,
                                                          ou_params,
                                                          param_node)
from composablestatespacemodels_tpu.models.tree import (EmptyTree, Leaf,
                                                        Tree, branch,
                                                        construct_tree_left,
                                                        leaf)

RNG = np.random.default_rng(7)


def random_tree(depth: int = 0) -> Tree:
    """Random tree of float leaves, geometric-ish in depth (<= 6)."""
    r = RNG.random()
    if depth >= 6 or r < 0.4:
        return leaf(float(RNG.normal()))
    if r < 0.45 and depth > 0:
        return EmptyTree()
    return branch(random_tree(depth + 1), random_tree(depth + 1))


def random_param_tree(depth: int = 0) -> Tree:
    if depth >= 3 or RNG.random() < 0.5:
        vals = RNG.normal(size=5)
        return leaf(param_node(float(RNG.normal()), ou_params(*vals)))
    return branch(random_param_tree(depth + 1), random_param_tree(depth + 1))


@pytest.mark.parametrize("trial", range(25))
def test_concat_monoid_laws(trial):
    """concat (the composition Monoid, Tree.scala:154-157): associativity
    and Empty as identity, up to flatten order (the reference's Eq instance
    compares flattened leaves, Tree.scala:163-167)."""
    a, b, c = random_tree(), random_tree(), random_tree()
    lhs = a.concat(b).concat(c)
    rhs = a.concat(b.concat(c))
    assert lhs.flatten() == rhs.flatten()
    e = EmptyTree()
    assert e.concat(a).flatten() == a.flatten()
    assert a.concat(e).flatten() == a.flatten()


@pytest.mark.parametrize("trial", range(25))
def test_map_functor_laws(trial):
    t = random_tree()
    assert t.map(lambda x: x).flatten() == t.flatten()
    f = lambda x: x * 2.0
    g = lambda x: x + 1.0
    comp = t.map(lambda x: g(f(x))).flatten()
    seq = t.map(f).map(g).flatten()
    assert comp == seq


@pytest.mark.parametrize("trial", range(25))
def test_zip_with_plus_commutes(trial):
    """Leafwise plus commutes (ParameterTest.scala:62-68)."""
    t = random_tree()
    u = t.map(lambda x: float(RNG.normal()))
    ab = t.zip_with(u, lambda a, b: a + b).flatten()
    ba = u.zip_with(t, lambda a, b: a + b).flatten()
    np.testing.assert_allclose(ab, ba)


def test_zip_with_shape_mismatch_raises():
    a = branch(leaf(1.0), leaf(2.0))
    b = leaf(3.0)
    with pytest.raises((ValueError, TypeError)):
        a.zip_with(b, lambda x, y: x + y)


@pytest.mark.parametrize("trial", range(10))
def test_construct_tree_left_preserves_order(trial):
    n = int(RNG.integers(1, 12))
    vals = [float(v) for v in RNG.normal(size=n)]
    t = construct_tree_left(vals)
    assert t.flatten() == vals
    assert t.n_leaves() == n
    for i in range(n):
        assert t.get_node(i) == vals[i]


@pytest.mark.parametrize("trial", range(10))
def test_fold_agrees_with_flatten(trial):
    t = random_tree()
    total = t.fold(0.0, lambda x: x, lambda a, b: a + b)
    np.testing.assert_allclose(total, sum(t.flatten()), rtol=1e-12)


@pytest.mark.parametrize("trial", range(10))
def test_add_flat_is_translation(trial):
    """Addable: adding a flat vector then flattening == flattening then
    adding (ParameterTest.scala:70-76)."""
    p = random_param_tree()
    flat = flatten_params(p)
    delta = jnp.asarray(RNG.normal(size=flat.shape[0]).astype(np.float32))
    moved = add_flat(p, delta)
    flat2 = flatten_params(moved)
    np.testing.assert_allclose(np.asarray(flat2),
                               np.asarray(flat + delta), rtol=1e-5,
                               atol=1e-6)


# -- monadic ops (Tree.scala:87-91, 115-137) --------------------------------


def test_flat_map_left_identity():
    f = lambda v: branch(leaf(v), leaf(v + 1))
    assert leaf(3).flat_map(f) == f(3)


def test_flat_map_right_identity_random_trees():
    for seed in range(10):
        t = random_tree()
        assert t.flat_map(leaf) == t


def test_flat_map_associativity():
    f = lambda v: branch(leaf(v), leaf(-v))
    g = lambda v: leaf(v * 2)
    for seed in range(5):
        t = random_tree()
        assert t.flat_map(f).flat_map(g) == t.flat_map(
            lambda v: f(v).flat_map(g))


def test_traverse_plain_map_equivalence():
    t = branch(leaf(1.0), branch(leaf(2.0), leaf(3.0)))
    assert t.traverse(lambda v: v + 1) == t.map(lambda v: v + 1)


def test_traverse_none_propagates():
    t = branch(leaf(1.0), branch(leaf(-2.0), leaf(3.0)))
    assert t.traverse(lambda v: v if v > 0 else None) is None
    assert t.traverse(lambda v: v) == t


def test_traverse_fail_fast():
    t = branch(leaf(1.0), leaf(-1.0))

    def f(v):
        if v < 0:
            raise ValueError("neg")
        return v

    with pytest.raises(ValueError, match="neg"):
        t.traverse(f)
