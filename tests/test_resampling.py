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


def test_iid_sorted_permuted_matches_lookup_distribution(key):
    """The TPU residual fill (_iid_draws_sorted_permuted: counts-based
    sorted multinomial + random slot permutation) is distributed as iid
    lookups, INCLUDING any fixed prefix of slots (the property
    residual_indices' K-dependent mask relies on -- a sorted prefix would
    bias toward low ancestors)."""
    w = jnp.asarray([0.05, 0.1, 0.15, 0.2, 0.5])
    m, n, trials = 5, 40, 300
    counts_full = np.zeros(m)
    counts_prefix = np.zeros(m)
    slot_means = np.zeros(n)
    for i in range(trials):
        idx = np.asarray(rs._iid_draws_sorted_permuted(
            jax.random.fold_in(key, i), w, n))
        counts_full += np.bincount(idx, minlength=m)
        counts_prefix += np.bincount(idx[:11], minlength=m)  # odd prefix
        slot_means += idx
    for counts, total in ((counts_full, n * trials),
                          (counts_prefix, 11 * trials)):
        freq = counts / total
        se = np.sqrt(np.asarray(w) * (1 - np.asarray(w)) / total)
        assert (np.abs(freq - np.asarray(w)) < 5 * se + 1e-3).all(), freq
    # no slot-position structure left after the permutation
    slot_means /= trials
    assert slot_means.std() < 0.5, slot_means.std()


def test_residual_multiset_parity_tpu_vs_lookup(key):
    """residual_indices' two fill paths (lookup vs sorted+permuted) agree
    in distribution: compare ancestor frequencies over many keys."""
    w = jnp.asarray([0.02, 0.08, 0.3, 0.6])
    m, n, trials = 4, 32, 300
    wn = np.asarray(w) / np.asarray(w).sum()
    ki = np.floor(wn * n).astype(int)
    residual = np.maximum(wn * n - ki, 0)
    r_total = n - ki.sum()
    expected = ki + r_total * residual / residual.sum()

    def run(fill_tpu):
        counts = np.zeros(m)
        for i in range(trials):
            k = jax.random.fold_in(key, i)
            kk = jnp.asarray(ki, jnp.int32)
            det = jnp.repeat(jnp.arange(m), kk, total_repeat_length=n)
            safe = jnp.asarray(residual)
            if fill_tpu:
                multi = rs._iid_draws_sorted_permuted(k, safe, n)
            else:
                cdf = rs._cumsum(rs._normalise(safe))
                multi = rs._lookup(cdf, jax.random.uniform(k, (n,)))
            idx = np.asarray(jnp.where(jnp.arange(n) < int(ki.sum()),
                                       det, multi))
            counts += np.bincount(idx, minlength=m)
        return counts / trials

    f_tpu = run(True)
    f_cpu = run(False)
    se = np.sqrt(r_total * residual / residual.sum()) / np.sqrt(trials) + 0.05
    assert (np.abs(f_tpu - expected) < 6 * se).all(), (f_tpu, expected)
    assert (np.abs(f_cpu - expected) < 6 * se).all(), (f_cpu, expected)
    assert (np.abs(f_tpu - f_cpu) < 8 * se).all()


def test_fused_counts_packed_batch_matches_solo(key):
    """The packed batched counts kernel (chains stacked along rows with
    block-diagonal carries -- the pmmh_chains fast path) in interpret
    mode: valid monotone counts within one ulp-flip of the per-chain
    solo kernel.  Exact bit-equality holds only on the real MXU
    (sequential systolic accumulation; CPU dots group f32 sums
    differently), so the bit gate lives in tests_tpu."""
    from composablestatespacemodels_tpu.ops.scan_kernel import (
        _counts_packed_call, _eff_block_rows, _pad_rows,
        systematic_counts_fused)

    for m, b in [(100, 37), (1024, 3), (4096, 5)]:
        k = jax.random.fold_in(key, m + b)
        w = jax.random.uniform(k, (b, m)) + 0.01
        tot = jnp.sum(w, axis=1)
        u = jax.random.uniform(jax.random.fold_in(k, 1), (b,))
        rows = _eff_block_rows(m, 256)
        x = jnp.stack([_pad_rows(w[i], rows, jnp.float32) for i in range(b)])
        scal = jnp.zeros((b, 8, 128), jnp.float32)
        scal = scal.at[:, 0, :].set(tot[:, None])
        scal = scal.at[:, 1, :].set(u[:, None])
        tile = 128 * rows
        last = ((m - 1) // tile, ((m - 1) % tile) // 128, (m - 1) % 128)
        packed = _counts_packed_call(m, last, rows, scal, x, interpret=True)
        packed = packed.reshape(b, -1)[:, :m]
        solo = jnp.stack([
            systematic_counts_fused(w[i], tot[i], u[i], interpret=True)
            for i in range(b)])
        c = np.asarray(packed)
        assert (np.diff(c, axis=1) >= 0).all() and (c[:, -1] == m).all()
        diff = np.abs(c - np.asarray(solo))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01, \
            f"m={m} b={b}: max {diff.max()} frac {(diff > 0).mean()}"
