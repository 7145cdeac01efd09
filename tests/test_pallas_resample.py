"""Pallas merge-gather resampling kernel vs the XLA reference path.

Runs in Pallas interpreter mode on CPU (the TPU compile path is exercised by
bench.py / the driver on real hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu.inference.resampling import (
    _ancestors_from_counts, systematic_indices)
from composablestatespacemodels_tpu.ops.resample_kernel import (
    sorted_gather_resample, stratified_counts, systematic_counts,
    systematic_resample_pallas)


def _ref(x, counts):
    return x[_ancestors_from_counts(counts, x.shape[0])]


@pytest.mark.parametrize("n,block", [(1024, 1024), (2048, 1024), (4096, 2048)])
def test_matches_xla_random_weights(key, n, block):
    w = jax.random.uniform(key, (n,)) + 0.01
    counts = systematic_counts(key, w)
    x = jax.random.normal(key, (n, 8))
    got = sorted_gather_resample(x, counts, block=block, interpret=True)
    np.testing.assert_array_equal(got, _ref(x, counts))


def test_matches_xla_degenerate(key):
    n = 2048
    x = jax.random.normal(key, (n, 8))
    for w in [jnp.zeros((n,)).at[700].set(1.0),
              jnp.zeros((n,)).at[1].set(0.5).at[2000].set(0.5),
              jnp.ones((n,)),
              jnp.zeros((n,)).at[0].set(1.0),
              jnp.zeros((n,)).at[n - 1].set(1.0)]:
        counts = systematic_counts(key, w)
        got = sorted_gather_resample(x, counts, block=1024, interpret=True)
        np.testing.assert_array_equal(got, _ref(x, counts))


def test_stratified_counts_match_indices(key):
    n = 2048
    w = jax.random.uniform(key, (n,)) + 0.01
    counts = stratified_counts(key, w)
    x = jax.random.normal(key, (n, 4))
    got = sorted_gather_resample(x, counts, block=1024, interpret=True)
    np.testing.assert_array_equal(got, _ref(x, counts))


def test_full_step_matches_indices_path(key):
    n = 1024
    w = jax.random.uniform(key, (n,)) + 0.01
    x = jax.random.normal(key, (n, 8))
    got = systematic_resample_pallas(key, x, w, block=1024, interpret=True)
    want = x[systematic_indices(key, w)]
    np.testing.assert_array_equal(got, want)


def test_odd_dims(key):
    # d not a power of two / not lane aligned
    n = 1024
    w = jax.random.uniform(key, (n,)) + 0.01
    counts = systematic_counts(key, w)
    for d in (1, 3, 7, 9):
        x = jax.random.normal(key, (n, d))
        got = sorted_gather_resample(x, counts, block=1024, interpret=True)
        np.testing.assert_array_equal(got, _ref(x, counts))


def test_indivisible_block_raises(key):
    w = jax.random.uniform(key, (1000,))
    counts = systematic_counts(key, w)
    x = jax.random.normal(key, (1000, 4))
    with pytest.raises(ValueError):
        sorted_gather_resample(x, counts, block=1024, interpret=True)
    # smaller lane-multiple blocks are fine (counts columns pad to 128)
    w = jax.random.uniform(key, (2048,))
    counts = systematic_counts(key, w)
    x = jax.random.normal(key, (2048, 4))
    got = sorted_gather_resample(x, counts, block=512, interpret=True)
    np.testing.assert_array_equal(got, _ref(x, counts))
    with pytest.raises(ValueError):  # not a multiple of 128
        sorted_gather_resample(x, counts, block=100, interpret=True)


def test_filter_with_pallas_scheme_matches_systematic(key):
    """The filter's 'systematic-pallas' scheme is bit-identical to
    'systematic' given the same key (same closed-form counts)."""
    from jax.experimental.pallas import tpu as pltpu

    from composablestatespacemodels_tpu import (bootstrap_filter, linear,
                                                simulate_regular)
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.0, 1.0, 0.4))
    sim = simulate_regular(model, params, key, 20)
    data = sim.to_timeseries()
    with pltpu.force_tpu_interpret_mode():
        res_p = bootstrap_filter(model, params, data, 1024, key,
                                 resample="systematic-pallas", store="ll")
    res_s = bootstrap_filter(model, params, data, 1024, key,
                             resample="systematic", store="ll")
    np.testing.assert_allclose(res_p.ll, res_s.ll, rtol=1e-6)
    np.testing.assert_array_equal(res_p.final_particles,
                                  res_s.final_particles)


def test_filter_pallas_ess_threshold_matches_systematic(key):
    """With an ESS trigger, the transposed pallas path must carry weights
    between steps exactly like the XLA path (round-1 defect: it assumed
    uniform incoming weights, biasing ll on skipped resamples)."""
    from jax.experimental.pallas import tpu as pltpu

    from composablestatespacemodels_tpu import (bootstrap_filter, linear,
                                                simulate_regular)
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.0, 1.0, 0.4))
    sim = simulate_regular(model, params, key, 30)
    data = sim.to_timeseries()
    with pltpu.force_tpu_interpret_mode():
        res_p = bootstrap_filter(model, params, data, 1024, key,
                                 resample="systematic-pallas", store="ll",
                                 ess_threshold=0.5)
    res_s = bootstrap_filter(model, params, data, 1024, key,
                             resample="systematic", store="ll",
                             ess_threshold=0.5)
    # the trigger must actually skip some resamples for this to test anything
    assert int(jnp.max(res_s.ess)) > 512
    np.testing.assert_allclose(res_p.ll, res_s.ll, rtol=1e-6)
    np.testing.assert_array_equal(res_p.ess, res_s.ess)
    np.testing.assert_array_equal(res_p.final_particles,
                                  res_s.final_particles)


def test_heavy_tail_multiblock_spans(key):
    """Heavy-tailed weights produce output blocks whose ancestors span 3+
    input blocks (the in-kernel manual-DMA fallback) -- the regime a real-TPU
    verify run caught a two-level-counting bug in."""
    n = 8192
    # six parents scattered over input blocks 0..5 share output block 0's
    # slots; one heavy parent in input block 7 owns the rest
    w = jnp.zeros((n,))
    for i in range(6):
        w = w.at[i * 1024 + 100].set(1.0 / 6)
    w = w.at[7 * 1024 + 100].set(7.0)
    counts = systematic_counts(key, w)
    # require the case we claim to test: some output block spanning >= 3
    # input blocks
    blockmax = np.asarray(counts).reshape(-1, 1024)[:, -1]
    spans = [int(np.sum(blockmax <= g * 1024 + 1023))
             - int(np.sum(blockmax <= g * 1024)) for g in range(n // 1024)]
    assert max(spans) >= 3, f"fixture too tame: spans={spans}"
    x = jax.random.normal(key, (n, 7))
    got = sorted_gather_resample(x, counts, block=1024, interpret=True)
    np.testing.assert_array_equal(got, _ref(x, counts))


@pytest.mark.parametrize("dup_window", [0, 2, 3, 4])
def test_dup_window_paths_match(key, dup_window):
    """Windowed duplication (every regime, incl. both the fast path and
    the full-select fallback) must be bit-identical to dup_window=0."""
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        sorted_gather_resample_t)

    n = 8192
    x_t = jax.random.normal(key, (8, n))
    for wname, w in [
            ("uniformish", jax.random.uniform(key, (n,)) + 0.01),
            ("heavy", jax.random.exponential(key, (n,)) ** 4),
            ("onehot", jnp.zeros((n,)).at[5000].set(1.0)),
            ("twohot", jnp.zeros((n,)).at[1].set(0.5).at[n - 2].set(0.5))]:
        counts = systematic_counts(jax.random.fold_in(key, hash(wname) % 97),
                                   w)
        got = sorted_gather_resample_t(x_t, counts, block=1024,
                                       interpret=True,
                                       dup_window=dup_window)
        want = _ref(x_t.T, counts).T
        np.testing.assert_array_equal(np.asarray(got), want,
                                      err_msg=f"{wname} W={dup_window}")


def test_dup_window_mixed_simple_and_fallback(key):
    """A weight regime where W=2 leaves SOME blocks on the fallback path
    (heavy tails) -- both pl.when branches must coexist in one launch."""
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        _merge_prepass, sorted_gather_resample_t)

    n = 8192
    # uniform weights everywhere except three adjacent source groups with
    # ~40 offspring each: those ~120 output slots cross 3 group
    # boundaries inside one 128-slot chunk (span 4 > W=2 -> fallback),
    # while uniform blocks stay on the fast path
    w = jnp.ones((n,))
    w = w.at[40 * 128:43 * 128].set(0.3125)
    counts = systematic_counts(key, w)
    _, _, _, _, _, _, simple = _merge_prepass(counts, n, 1024, 2)
    s = np.asarray(simple)
    assert 0 < s.sum() < s.size, f"fixture too tame: {s.sum()}/{s.size}"
    x_t = jax.random.normal(key, (8, n))
    got = sorted_gather_resample_t(x_t, counts, block=1024, interpret=True,
                                   dup_window=2)
    np.testing.assert_array_equal(np.asarray(got), _ref(x_t.T, counts).T)


def test_packed_count_clip_boundaries(key):
    """Adversarial counts pinning the pair-packed level-2 compare's clip
    edges: cumulative counts landing EXACTLY on q0-1, q0, q0+block-1,
    q0+block and q0+block+1 of interior output blocks (the [-1, block]
    clip window), plus long empty-chunk runs.  Counts are constructed
    directly (nondecreasing, counts[-1] == n) so the boundary values are
    exact, not weight-derived."""
    n, block = 4096, 1024
    base = np.minimum(np.arange(1, n + 1, dtype=np.int32), n)
    for q0 in (1024, 2048):
        for v in (q0 - 1, q0, q0 + block - 1, q0 + block, q0 + block + 1):
            c = np.maximum(base, 0).copy()
            # plateau at the boundary value across two chunk boundaries
            lo_i, hi_i = q0 - 300, q0 + 300
            c[lo_i:hi_i] = v
            c = np.maximum.accumulate(np.clip(c, 0, n))
            c[-1] = n
            counts = jnp.asarray(c, jnp.int32)
            x = jax.random.normal(key, (n, 8))
            got = sorted_gather_resample(x, counts, block=block,
                                         interpret=True)
            np.testing.assert_array_equal(
                got, _ref(x, counts), err_msg=f"q0={q0} v={v}")


def test_fused_counts_kernel_matches_composition(key):
    """The one-pass fused systematic-counts kernel must be bit-identical
    to the op-by-op composition over the same prefix kernel (the TPU
    filter path switches between them by backend)."""
    from composablestatespacemodels_tpu.ops.scan_kernel import (
        prefix_sum, systematic_counts_fused)

    def composition(w, u, n_out):
        total = jnp.sum(w)
        cdf = prefix_sum(w / total, interpret=True)
        c = jnp.clip(jnp.ceil(n_out * cdf - u), 0, n_out).astype(jnp.int32)
        c = c.at[-1].set(n_out)
        return jax.lax.associative_scan(jnp.maximum, c)

    for m, n_out in [(4096, 4096), (1000, 1500), (1 << 15, 1 << 15),
                     (257, 128)]:
        for wname, w in [
                ("uniformish", jax.random.uniform(key, (m,)) + 0.01),
                ("heavy", jax.random.exponential(key, (m,)) ** 4),
                ("onehot", jnp.zeros((m,)).at[m // 2].set(1.0))]:
            u = jax.random.uniform(jax.random.fold_in(key, 1), ())
            got = systematic_counts_fused(w, jnp.sum(w), u, n_out=n_out,
                                          interpret=True)
            want = composition(w, u, n_out)
            np.testing.assert_array_equal(
                got, want, err_msg=f"m={m} n_out={n_out} {wname}")
            gotn = np.asarray(got)
            assert gotn[-1] == n_out and (np.diff(gotn) >= 0).all()


def test_fused_counts_kernel_vmaps(key):
    """pmmh_chains vmaps the whole filter over chains, so the fused counts
    kernel must batch (round-3 regression: a 2-element SMEM scalar operand
    had no valid batched block spec and broke the chains bench's TPU
    lowering -- the scalars now ride a [1, 128] VMEM tile)."""
    from composablestatespacemodels_tpu.ops.scan_kernel import (
        systematic_counts_fused)

    n_batch, m = 5, 1024
    ws = jax.random.uniform(key, (n_batch, m)) + 0.01
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_batch,))
    got = jax.vmap(lambda w, u: systematic_counts_fused(
        w, jnp.sum(w), u, n_out=m, interpret=True))(ws, us)
    for i in range(n_batch):
        want = systematic_counts_fused(ws[i], jnp.sum(ws[i]), us[i],
                                       n_out=m, interpret=True)
        np.testing.assert_array_equal(got[i], want, err_msg=f"chain {i}")


def test_prefix_sum_kernel(key):
    """MXU blocked prefix sum matches associative_scan to f32 tolerance."""
    from composablestatespacemodels_tpu.ops.scan_kernel import prefix_sum

    for n in (1024, 4096, 100_000):
        w = jax.random.uniform(jax.random.fold_in(key, n), (n,))
        got = prefix_sum(w, interpret=True)
        want = jax.lax.associative_scan(jnp.add, w)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)
        # exact on integers (no rounding): bit-determinism sanity
        wi = jnp.round(w * 7)
        np.testing.assert_array_equal(prefix_sum(wi, interpret=True),
                                      jax.lax.associative_scan(jnp.add, wi))


def test_cummax_kernel(key):
    from composablestatespacemodels_tpu.ops.scan_kernel import cummax_int32

    for n in (1024, 5000, 40_000):
        c = jax.random.randint(jax.random.fold_in(key, n), (n,), 0, 1000)
        got = cummax_int32(c, interpret=True)
        want = jax.lax.associative_scan(jnp.maximum, c.astype(jnp.int32))
        np.testing.assert_array_equal(got, want)


def test_counts_are_monotone_after_guard(key):
    """ceil(n*cdf - u) can dip by 1 where the tree-structured f32 prefix sum
    rounds non-monotonically (observed on a real v5e with heavy-tailed
    weights); the shared monotone guard must remove every dip."""
    n = 1 << 15
    w = jax.random.exponential(key, (n,)) ** 4
    counts = np.asarray(systematic_counts(key, w))
    assert (np.diff(counts) >= 0).all()
    assert counts[-1] == n
    counts_s = np.asarray(stratified_counts(key, w))
    assert (np.diff(counts_s) >= 0).all()


def test_fused_kernel_zero_noise_matches_unfused(key):
    """a=1, b=0, s=0 makes the fused transition the identity: output must
    bit-match the plain merge kernel (interpret mode's PRNG yields zeros,
    so only the zero-noise tail is meaningful off-TPU; the noisy tail's
    moments are validated on the real chip via bench/verify drives)."""
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        sorted_gather_resample_propagate_t, sorted_gather_resample_t)
    from jax.experimental.pallas import tpu as pltpu

    n, d = 4096, 8
    x = jax.random.normal(key, (d, n))
    w = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) + 0.01
    counts = systematic_counts(jax.random.fold_in(key, 2), w)
    coef = jnp.stack([jnp.ones(d), jnp.zeros(d), jnp.zeros(d)], axis=1)
    with pltpu.force_tpu_interpret_mode():
        y0 = sorted_gather_resample_t(x, counts, block=1024)
        y1 = sorted_gather_resample_propagate_t(
            x, counts, coef, jnp.array([5], jnp.int32), block=1024)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_fused_kernel_affine_applied(key):
    """a/b columns act per state dimension on the resampled block."""
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        sorted_gather_resample_propagate_t, sorted_gather_resample_t)
    from jax.experimental.pallas import tpu as pltpu

    n, d = 2048, 8
    x = jax.random.normal(key, (d, n))
    w = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) + 0.01
    counts = systematic_counts(jax.random.fold_in(key, 2), w)
    a = jnp.arange(1.0, d + 1)
    b = jnp.linspace(-1.0, 1.0, d)
    coef = jnp.stack([a, b, jnp.zeros(d)], axis=1)
    with pltpu.force_tpu_interpret_mode():
        y0 = sorted_gather_resample_t(x, counts, block=1024)
        y1 = sorted_gather_resample_propagate_t(
            x, counts, coef, jnp.array([5], jnp.int32), block=1024)
    np.testing.assert_allclose(np.asarray(y1),
                               a[:, None] * np.asarray(y0) + b[:, None],
                               rtol=1e-6, atol=1e-6)


def test_fused_filter_structural(key):
    """'systematic-pallas-fused' runs end-to-end (interpret mode: the
    in-kernel noise is a deterministic constant, so only structure -- ll
    finite, shapes, store restriction -- is checked here; statistics are
    gated on-chip)."""
    from jax.experimental.pallas import tpu as pltpu

    from composablestatespacemodels_tpu import (bootstrap_filter, linear,
                                                simulate_regular)
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.0, 1.0, 0.4))
    sim = simulate_regular(model, params, key, 15)
    data = sim.to_timeseries()
    with pltpu.force_tpu_interpret_mode():
        res = bootstrap_filter(model, params, data, 1024, key,
                               resample="systematic-pallas-fused",
                               store="ll")
    assert np.isfinite(float(res.ll))
    assert res.final_particles.shape == (1024, 1)
    assert res.ess.shape == data.ts.shape
    assert 1 <= int(jnp.min(res.ess)) <= 1024


def test_fused_filter_store_modes_structural(key):
    """'systematic-pallas-fused' under store='summary'/'path' routes to the
    transposed scan with the STANDALONE fused propagate(+weights) kernel
    (the resample kernel cannot absorb the propagate when per-step
    summaries need the unpropagated cloud).  Interpret mode: structure
    only; statistics are gated on-chip."""
    from jax.experimental.pallas import tpu as pltpu

    from composablestatespacemodels_tpu import (bootstrap_filter, linear,
                                                simulate_regular)
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.0, 1.0, 0.4))
    sim = simulate_regular(model, params, key, 12)
    data = sim.to_timeseries()
    with pltpu.force_tpu_interpret_mode():
        res = bootstrap_filter(model, params, data, 1024, key,
                               resample="systematic-pallas-fused",
                               store="summary")
        res_p = bootstrap_filter(model, params, data, 1024, key,
                                 resample="systematic-pallas-fused",
                                 store="path")
    assert np.isfinite(float(res.ll))
    assert res.summary is not None
    assert np.isfinite(np.asarray(res.summary.state_mean)).all()
    assert np.isfinite(np.asarray(res.summary.eta_lower)).all()
    assert res_p.sampled_path.shape == (12, 1)
    assert np.isfinite(np.asarray(res_p.sampled_path)).all()


def test_standalone_propagate_kernel(key):
    """propagate_weights_t: zero-noise affine transition is exact, and the
    fused weight row matches the XLA log-density of the propagated block."""
    from jax.experimental.pallas import tpu as pltpu

    from composablestatespacemodels_tpu.models.observation import (Gaussian,
                                                                   Poisson)
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        propagate_weights_t)

    n, d = 4096, 8
    x = jax.random.normal(key, (d, n)) * 0.3
    a = jnp.arange(1.0, d + 1) / d
    b = jnp.linspace(-0.5, 0.5, d)
    coef = jnp.stack([a, b, jnp.zeros(d)], axis=1)
    with pltpu.force_tpu_interpret_mode():
        y = propagate_weights_t(x, coef, jnp.int32([3]), block=1024)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(a[:, None] * x + b[:, None]),
                               rtol=1e-6, atol=1e-6)

    # weighted: row d-1 reserved, fc zero there so gamma is untouched
    a = a.at[d - 1].set(0.0)
    b = b.at[d - 1].set(0.0)
    fc = jnp.concatenate([jnp.linspace(0.5, 1.5, d - 1), jnp.zeros((1,))])
    coefw = jnp.stack([a, b, jnp.zeros(d), fc], axis=1)
    for fam, yobs, scale in [(Poisson(), 3.0, 1.0), (Gaussian(), 0.7, 0.4)]:
        make_consts, _ = fam.kernel_log_density()
        consts = make_consts(jnp.asarray(yobs), jnp.asarray(scale))
        with pltpu.force_tpu_interpret_mode():
            yw = propagate_weights_t(x, coefw, jnp.int32([3]), block=1024,
                                     weight_family=fam, weight_consts=consts,
                                     weight_row=d - 1)
        prop = np.asarray(a[:, None] * x + b[:, None])
        gamma = (np.asarray(fc)[:, None] * prop).sum(axis=0)
        want = np.asarray(fam.log_density(
            jnp.asarray(gamma), jnp.asarray(yobs), jnp.asarray(scale)))
        np.testing.assert_allclose(np.asarray(yw[d - 1]), want,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(yw[:d - 1]), prop[:d - 1],
                                   rtol=1e-6, atol=1e-6)


def test_fused_weighted_kernel_matches_xla_weights(key):
    """With zero noise, the weighted fused kernel's weight row equals the
    XLA log-density of the affine-propagated resampled block (Poisson and
    Gaussian kernel_log_density hooks)."""
    from jax.experimental.pallas import tpu as pltpu

    from composablestatespacemodels_tpu.models.observation import (
        Bernoulli, Gaussian, NegativeBinomial, Poisson, StudentsT,
        ZeroInflatedPoisson)
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        sorted_gather_resample_propagate_t, sorted_gather_resample_t)

    n, d = 2048, 8
    x = jax.random.normal(key, (d, n)) * 0.3
    w = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) + 0.01
    counts = systematic_counts(jax.random.fold_in(key, 2), w)
    a = jnp.concatenate([jnp.full((d - 1,), 0.9), jnp.zeros((1,))])
    b = jnp.concatenate([jnp.full((d - 1,), 0.05), jnp.zeros((1,))])
    s = jnp.zeros((d,))
    fc = jnp.concatenate([jnp.linspace(0.5, 1.5, d - 1), jnp.zeros((1,))])
    coef = jnp.stack([a, b, s, fc], axis=1)

    for fam, y, scale in [(Poisson(), 3.0, 1.0), (Gaussian(), 0.7, 0.4),
                          (ZeroInflatedPoisson(), 0.0, 0.2),
                          (ZeroInflatedPoisson(), 2.0, 0.2),
                          (NegativeBinomial(), 4.0, 2.5),
                          (Bernoulli(), 1.0, 1.0), (Bernoulli(), 0.0, 1.0),
                          (StudentsT(df=4), 0.3, 0.8)]:
        make_consts, _ = fam.kernel_log_density()
        consts = make_consts(jnp.asarray(y), jnp.asarray(scale))
        with pltpu.force_tpu_interpret_mode():
            out = sorted_gather_resample_propagate_t(
                x, counts, coef, jnp.array([3], jnp.int32), block=1024,
                weight_family=fam, weight_consts=consts, weight_row=d - 1)
            base = sorted_gather_resample_t(x, counts, block=1024)
        prop = a[:, None] * np.asarray(base) + b[:, None]
        gamma = (fc[:, None] * prop).sum(axis=0)
        want = np.asarray(fam.log_density(jnp.asarray(gamma),
                                          jnp.asarray(y),
                                          jnp.asarray(scale)))
        np.testing.assert_allclose(np.asarray(out)[d - 1], want,
                                   rtol=2e-5, atol=1e-5)
        # real state rows unchanged by the weight tail
        np.testing.assert_allclose(np.asarray(out)[: d - 1],
                                   prop[: d - 1], rtol=1e-6, atol=1e-6)


def test_filter_stratified_pallas_matches_stratified(key):
    """'stratified-pallas' is bit-identical to 'stratified' given the same
    key (the merge kernel consumes any monotone counts)."""
    from jax.experimental.pallas import tpu as pltpu

    from composablestatespacemodels_tpu import (bootstrap_filter, linear,
                                                simulate_regular)
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.0, 1.0, 0.4))
    sim = simulate_regular(model, params, key, 20)
    data = sim.to_timeseries()
    with pltpu.force_tpu_interpret_mode():
        res_p = bootstrap_filter(model, params, data, 1024, key,
                                 resample="stratified-pallas", store="ll")
    res_s = bootstrap_filter(model, params, data, 1024, key,
                             resample="stratified", store="ll")
    np.testing.assert_allclose(res_p.ll, res_s.ll, rtol=1e-6)
    np.testing.assert_array_equal(res_p.final_particles,
                                  res_s.final_particles)


def test_counts_cols_kernel_matches_layout(key):
    """systematic_counts_cols (the counts kernel emitting the merge
    kernel's operand layouts directly, VERDICT r4 #3) is bit-identical to
    building the layouts from the flat fused counts in XLA, across block
    sizes and weight regimes."""
    from composablestatespacemodels_tpu.ops.scan_kernel import (
        _cols_layout_xla, systematic_counts_cols, systematic_counts_fused)

    for m, block in [(4096, 1024), (1 << 15, 4096), (1 << 15, 2048),
                     (1 << 16, 8192)]:
        for wname, w in [
                ("uniformish", jax.random.uniform(key, (m,)) + 0.01),
                ("heavy", jax.random.exponential(key, (m,)) ** 4),
                ("onehot", jnp.zeros((m,)).at[m // 2].set(1.0))]:
            u = jax.random.uniform(jax.random.fold_in(key, 2), ())
            total = jnp.sum(w)
            cols, mx = systematic_counts_cols(w, total, u, block=block,
                                              interpret=True)
            flat = systematic_counts_fused(w, total, u, interpret=True)
            cols_ref, mx_ref = _cols_layout_xla(flat, m, block)
            np.testing.assert_array_equal(
                np.asarray(cols), np.asarray(cols_ref),
                err_msg=f"cols m={m} block={block} {wname}")
            np.testing.assert_array_equal(
                np.asarray(mx), np.asarray(mx_ref),
                err_msg=f"mx m={m} block={block} {wname}")


def test_merge_via_counts_cols_bit_matches_flat(key):
    """sorted_gather_resample[_propagate]_t(counts_cols=) must reproduce
    the flat-counts path bit for bit (same operands, no flat counts in
    HBM)."""
    from composablestatespacemodels_tpu.inference.resampling import (
        systematic_counts)
    from composablestatespacemodels_tpu.ops.scan_kernel import (
        _cols_layout_xla)
    from jax.experimental.pallas import tpu as pltpu
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        sorted_gather_resample_propagate_t, sorted_gather_resample_t)

    n, d, block = 1 << 14, 8, 2048
    x_t = jax.random.normal(key, (d, n), jnp.float32)
    w = jax.random.exponential(jax.random.fold_in(key, 1), (n,))
    counts = systematic_counts(jax.random.fold_in(key, 2), w / jnp.sum(w))
    cols = _cols_layout_xla(counts.astype(jnp.int32), n, block)
    a = sorted_gather_resample_t(x_t, counts, block=block, interpret=True)
    b = sorted_gather_resample_t(x_t, None, block=block, interpret=True,
                                 counts_cols=cols)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    coef = jnp.stack([jnp.linspace(0.5, 1.2, d),
                      jnp.linspace(-0.5, 0.5, d), jnp.zeros(d)], axis=1)
    seed = jnp.asarray([5], jnp.int32)
    with pltpu.force_tpu_interpret_mode():   # in-kernel PRNG needs it
        ap = sorted_gather_resample_propagate_t(x_t, counts, coef, seed,
                                                block=block)
        bp = sorted_gather_resample_propagate_t(x_t, None, coef, seed,
                                                block=block,
                                                counts_cols=cols)
    np.testing.assert_array_equal(np.asarray(ap), np.asarray(bp))
