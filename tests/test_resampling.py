"""Resampling tests: particle-count preservation (SamplingTest.scala:7-23)
plus distributional correctness (weighted-mean preservation) the reference
lacks (SURVEY.md section 4 gaps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu.inference import resampling as rs

SCHEMES = ["systematic", "stratified", "multinomial", "residual"]


@pytest.mark.parametrize("scheme", SCHEMES + ["identity"])
def test_preserves_particle_count(key, scheme):
    n = 1000
    w = jax.random.uniform(key, (n,))
    idx = rs.get_scheme(scheme)(key, w)
    assert idx.shape == (n,)
    assert int(idx.min()) >= 0 and int(idx.max()) < n


@pytest.mark.parametrize("scheme", SCHEMES)
def test_weighted_mean_preserved(key, scheme):
    """Resampled unweighted mean ~ weighted mean of the inputs."""
    n = 4000
    kx, kw, kr = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n,))
    w = jax.random.uniform(kw, (n,)) ** 2 + 0.01
    target = jnp.sum(x * w) / jnp.sum(w)

    keys = jax.random.split(kr, 50)
    means = jax.vmap(
        lambda k: jnp.mean(x[rs.get_scheme(scheme)(k, w)]))(keys)
    np.testing.assert_allclose(jnp.mean(means), target, atol=0.03)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_degenerate_weight_selects_single_particle(key, scheme):
    n = 128
    w = jnp.zeros((n,)).at[17].set(1.0)
    idx = rs.get_scheme(scheme)(key, w)
    assert bool(jnp.all(idx == 17))


def test_systematic_low_variance_vs_multinomial(key):
    """Systematic resampling has lower Monte-Carlo variance."""
    n = 1000
    kx, kw, kr = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n,))
    w = jax.random.uniform(kw, (n,)) + 0.01
    keys = jax.random.split(kr, 200)
    var_sys = jnp.var(jax.vmap(
        lambda k: jnp.mean(x[rs.systematic_indices(k, w)]))(keys))
    var_mult = jnp.var(jax.vmap(
        lambda k: jnp.mean(x[rs.multinomial_indices(k, w)]))(keys))
    assert float(var_sys) < float(var_mult)


def test_residual_deterministic_part(key):
    # particle with weight k/n appears at least floor(k) times
    n = 100
    w = jnp.ones((n,)) / (2 * n)
    w = w.at[0].set(0.5 + 1.0 / (2 * n))  # wn[0] > 0.5 => >= 50 copies
    idx = rs.residual_indices(key, w)
    assert int(jnp.sum(idx == 0)) >= 50


def test_exp_normalise(key):
    logw = jax.random.normal(key, (256,)) * 5
    w = rs.exp_normalise(logw)
    np.testing.assert_allclose(jnp.sum(w), 1.0, rtol=1e-5)
    assert bool(jnp.all(w >= 0))


def test_effective_sample_size():
    n = 512
    np.testing.assert_allclose(
        rs.effective_sample_size(jnp.ones((n,))), n)
    w = jnp.zeros((n,)).at[0].set(1.0)
    np.testing.assert_allclose(rs.effective_sample_size(w), 1)


def test_resample_gathers_pytrees(key):
    n = 64
    particles = {"x": jnp.arange(n, dtype=jnp.float32),
                 "y": jnp.ones((n, 3))}
    w = jnp.zeros((n,)).at[5].set(1.0)
    out = rs.resample(key, particles, w)
    assert bool(jnp.all(out["x"] == 5))
    assert out["y"].shape == (n, 3)


def test_indices_subsample_size(key):
    w = jax.random.uniform(key, (1000,))
    idx = rs.systematic_indices(key, w, n=100)
    assert idx.shape == (100,)


def test_multinomial_counts_match_lookup_multiset(key):
    """multinomial_counts-based ancestors are the sorted multiset of the
    per-position searchsorted lookup for the same key (the TPU fast path,
    Resampling.scala:92-96 semantics)."""
    for trial in range(5):
        k = jax.random.fold_in(key, trial)
        n = 512
        w = jnp.exp(3.0 * jax.random.normal(k, (n,)))
        counts = rs.multinomial_counts(k, w)
        got = rs._ancestors_from_counts(counts, n)
        # monotonise the reference cdf: the tree-structured f32 prefix sum
        # can dip by a ulp (see _monotone_counts), which the counts path
        # corrects and a raw searchsorted would not
        cdf = jax.lax.associative_scan(
            jnp.maximum, rs._cumsum(rs._normalise(w)))
        want = rs._lookup(cdf, jax.random.uniform(k, (n,), w.dtype))
        np.testing.assert_array_equal(np.asarray(got),
                                      np.sort(np.asarray(want)))


def test_multinomial_counts_subsample_and_degenerate(key):
    w = jnp.zeros((256,)).at[17].set(1.0)
    counts = rs.multinomial_counts(key, w, n=64)
    got = rs._ancestors_from_counts(counts, 64)
    assert got.shape == (64,)
    np.testing.assert_array_equal(np.asarray(got), 17)
    # monotone + closing invariants
    assert int(counts[-1]) == 64
    assert bool(jnp.all(jnp.diff(counts) >= 0))


def test_multinomial_counts_weighted_mean(key):
    """Distributional check: resampled mean estimates the weighted mean."""
    n = 4096
    x = jax.random.normal(key, (n,))
    w = jnp.exp(jax.random.normal(jax.random.fold_in(key, 1), (n,)))
    target = jnp.sum(x * w) / jnp.sum(w)
    keys = jax.random.split(jax.random.fold_in(key, 2), 50)

    def one(k):
        anc = rs._ancestors_from_counts(rs.multinomial_counts(k, w), n)
        return jnp.mean(x[anc])

    means = jax.vmap(one)(keys)
    se = jnp.std(means) / np.sqrt(50)
    assert abs(float(jnp.mean(means) - target)) < 5 * float(se) + 1e-3
