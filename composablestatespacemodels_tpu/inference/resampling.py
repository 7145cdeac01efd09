"""Resampling kernels for the particle filter, TPU-native.

The reference's TreeMap-based empirical CDF + ordered lookup
(Resampling.scala:36-96) becomes a normalised cumulative sum +
``searchsorted`` -- O(N log N) with fully vectorised memory access, no
data-dependent shapes, and identical statistics.

Every scheme has the reference's call convention: inputs are *shifted linear*
weights ``exp(logw - max(logw))`` (ParticleFilter.scala:124-126), not log
weights.  Each ``*_indices`` kernel returns ancestor indices [n]; ``resample``
gathers particles with them, so one gather serves any per-particle payload
(states, paths, ancestor buffers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalise(w):
    """w / sum(w).  Reference: Resampling.scala:21-24."""
    return w / jnp.sum(w)


def _cumsum(w):
    """Prefix sum, the single shared implementation for every resampling
    path (the Pallas filter path is bit-compared against the XLA path, so
    both must see identical cdf bits).

    On TPU this is a Pallas MXU kernel (:mod:`..ops.scan_kernel`):
    XLA's ``associative_scan`` costs ~1.65 ms at N=2^20 f32 on a v5e
    (its ``cumsum`` lowering another ~14x worse), the blocked matmul
    prefix ~0.05 ms.  The kernel wins at EVERY size: gating small N to
    ``associative_scan`` was measured 20% SLOWER end-to-end on the
    reference-shaped PMMH bench (N=100: 42 vs 53 iters/s) -- the padded
    one-tile launch still beats the log-depth unaligned-slice lowering.
    Elsewhere (CPU tests, interpret mode, f64) the ``associative_scan``.
    """
    if (jax.default_backend() == "tpu" and w.ndim == 1
            and w.dtype == jnp.float32):
        from ..ops.scan_kernel import prefix_sum
        return prefix_sum(w)
    return jax.lax.associative_scan(jnp.add, w)


def _monotone_counts(counts):
    """Exact running max over int32 cumulative position counts.

    The f32 cdf from a tree-structured prefix sum can *dip by a ulp*
    between adjacent entries (different rounding groupings), so
    ``ceil(n*cdf - u)`` occasionally decreases by 1 -- observed on a real
    v5e at N=2^17 with heavy-tailed weights.  Downstream consumers
    (ancestor construction, the Pallas merge kernel's block spans, the
    distributed resampler's windows) all assume nondecreasing counts, so
    every count-based scheme monotonises here.  int32 max is exact, so this
    is the true sequential cummax on every backend.
    """
    if (jax.default_backend() == "tpu" and counts.ndim == 1
            and counts.dtype == jnp.int32):
        from ..ops.scan_kernel import cummax_int32
        return cummax_int32(counts)
    return jax.lax.associative_scan(jnp.maximum, counts)


def _monotone_cdf(cdf):
    """Exact running max of a NONNEGATIVE f32 cdf.

    Needed where an algorithm requires the cdf itself to be sorted (the
    merged-rank multinomial counts) rather than post-monotonising derived
    integer counts.  On TPU this reuses the int32 cummax kernel through an
    order-preserving bitcast: nonnegative IEEE f32 bit patterns order as
    int32, and int32 max is exact.
    """
    if (jax.default_backend() == "tpu" and cdf.ndim == 1
            and cdf.dtype == jnp.float32):
        from ..ops.scan_kernel import cummax_int32
        bits = jax.lax.bitcast_convert_type(cdf, jnp.int32)
        return jax.lax.bitcast_convert_type(cummax_int32(bits), jnp.float32)
    return jax.lax.associative_scan(jnp.maximum, cdf)


def _lookup(cdf, positions):
    """First index whose cdf >= position (the TreeMap ``.from`` lookup,
    Resampling.scala:36-58)."""
    n = cdf.shape[0]
    idx = jnp.searchsorted(cdf, positions, side="left")
    return jnp.clip(idx, 0, n - 1)


def _ancestors_from_counts(counts, n_out: int):
    """Ancestor indices from cumulative position counts, O(N), search-free.

    ``counts[i]`` = number of resampling positions strictly below ``cdf[i]``
    (nondecreasing, ``counts[-1] == n_out``).  Particle ``i`` owns output
    slots ``[counts[i-1], counts[i])``; materialised by scattering ``i`` to
    slot ``counts[i-1]`` for every particle with offspring and forward-filling
    with a running max.

    This replaces ``searchsorted`` (a 20-round binary search with gather-heavy
    memory traffic -- measured ~130 ms at N=1e6 on a TPU v5e chip) with one
    scatter + one associative scan (~2 ms): the difference between the
    resampling step dominating the filter and it being noise.
    """
    m = counts.shape[0]
    offspring = jnp.diff(counts, prepend=jnp.zeros((1,), counts.dtype))
    starts = counts - offspring
    targets = jnp.where(offspring > 0, starts, n_out)  # drop childless
    seed = jnp.zeros((n_out,), jnp.int32).at[targets].max(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    return jax.lax.associative_scan(jnp.maximum, seed)


def systematic_counts(key, weights, n: int | None = None):
    """Monotone cumulative position counts for systematic resampling.

    Positions are affine in the slot index, so the position count below
    each cdf entry is closed-form: ``counts[i] = clip(ceil(n*cdf[i] - u),
    0, n)`` -- no search at all.  Reference semantics:
    Resampling.scala:63-72.  The SINGLE producer for both the XLA
    (``systematic_indices``) and Pallas merge-kernel paths, which are
    bit-compared against each other.
    """
    m = weights.shape[0]
    n = m if n is None else n
    u = jax.random.uniform(key, (), weights.dtype)
    if (jax.default_backend() == "tpu" and weights.ndim == 1
            and weights.dtype == jnp.float32):
        # one fused Pallas pass (normalise + MXU prefix + ceil/clip +
        # last-element guard + int cummax): bit-identical to the op-by-op
        # composition below but one HBM read + one write instead of ~9
        # intermediate 4 MB round-trips at N=2^20 (~0.04 ms/step of the
        # filter); tests compare the two in interpret mode.
        from ..ops.scan_kernel import systematic_counts_fused
        return systematic_counts_fused(weights, jnp.sum(weights), u,
                                       n_out=n)
    cdf = _cumsum(_normalise(weights))
    counts = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    counts = counts.at[-1].set(n)  # guard against cdf[-1] < 1 rounding
    return _monotone_counts(counts)


def stratified_counts(key, weights, n: int | None = None):
    """Monotone cumulative position counts for stratified resampling.

    Position j lives in [j/n, (j+1)/n), so the count below cdf value c is
    ``k + (u[k] < n*c - k)`` with ``k = floor(n*c)`` -- elementwise, no
    search.  Reference semantics: Resampling.scala:78-86.
    """
    m = weights.shape[0]
    n = m if n is None else n
    cdf = _cumsum(_normalise(weights))
    u = jax.random.uniform(key, (n,), weights.dtype)
    v = n * cdf
    k = jnp.floor(v).astype(jnp.int32)
    k_safe = jnp.clip(k, 0, n - 1)
    extra = (u[k_safe] < (v - k)).astype(jnp.int32)
    counts = jnp.clip(jnp.where(k >= n, n, k + extra), 0, n)
    counts = counts.at[-1].set(n)
    return _monotone_counts(counts)


def systematic_indices(key, weights, n: int | None = None):
    """Systematic resampling ancestors (Resampling.scala:63-72)."""
    m = weights.shape[0]
    n = m if n is None else n
    return _ancestors_from_counts(systematic_counts(key, weights, n), n)


def stratified_indices(key, weights, n: int | None = None):
    """Stratified resampling ancestors (Resampling.scala:78-86)."""
    m = weights.shape[0]
    n = m if n is None else n
    return _ancestors_from_counts(stratified_counts(key, weights, n), n)


def multinomial_counts(key, weights, n: int | None = None):
    """Monotone cumulative position counts for multinomial resampling.

    Multinomial positions are n iid uniforms -- unordered, so no closed
    form like systematic/stratified.  Instead of a per-position binary
    search over the cdf (20 rounds of random gathers, ~130 ms at N=1e6 on
    a v5e), ONE stable argsort of the merged ``[positions, cdf]`` array
    yields every count: with positions occupying the first n merged slots,
    the merged rank of ``cdf[i]`` is ``#(positions <= cdf[i]) + i`` (stable
    sort breaks position/cdf ties position-first, matching the
    ``side='left'`` lookup; equal cdf entries contribute their index
    offset exactly because cdf is sorted), hence
    ``counts[i] = rank(cdf[i]) - i``.

    Same multiset of ancestors as ``_lookup``-based multinomial
    (Resampling.scala:92-96) for the same key, produced in sorted order.

    The rank identity requires the cdf itself to be sorted, so the f32
    prefix's ulp dips are corrected on the cdf (``_monotone_cdf``) BEFORE
    the merge -- a dip would otherwise inflate a neighbouring rank and
    misassign a boundary draw (post-monotonising the counts cannot fix
    that: the bad count is too high, not too low).
    """
    m = weights.shape[0]
    n = m if n is None else n
    cdf = _monotone_cdf(_cumsum(_normalise(weights)))
    u = jax.random.uniform(key, (n,), weights.dtype)
    merged = jnp.concatenate([u, cdf])
    order = jnp.argsort(merged, stable=True)
    rank = jnp.zeros((n + m,), jnp.int32).at[order].set(
        jnp.arange(n + m, dtype=jnp.int32))
    counts = rank[n:] - jnp.arange(m, dtype=jnp.int32)
    counts = jnp.clip(counts, 0, n).at[-1].set(n)  # cdf[-1] < 1 rounding
    return _monotone_counts(counts)


def multinomial_indices(key, weights, n: int | None = None):
    """Multinomial resampling: n iid draws from the weight distribution.

    Reference: Resampling.scala:92-96.  On TPU the ancestors are built
    from :func:`multinomial_counts` (one argsort instead of a
    ``searchsorted`` binary search -- the search costs ~130 ms at N=1e6 on
    a v5e, the argsort path a few ms) and are therefore returned *sorted*;
    the multiset of ancestors is identical for the same key, and particle
    order is statistically irrelevant to every consumer (ancestors are
    exchangeable).  Off-TPU keeps the per-position lookup order.
    """
    m = weights.shape[0]
    n = m if n is None else n
    if jax.default_backend() == "tpu":
        return _ancestors_from_counts(multinomial_counts(key, weights, n), n)
    cdf = _cumsum(_normalise(weights))
    positions = jax.random.uniform(key, (n,), weights.dtype)
    return _lookup(cdf, positions)


def _iid_draws_sorted_permuted(key, weights, n: int):
    """n iid draws from ``weights``, built search-free.

    :func:`multinomial_counts` (one merged-rank argsort) yields the draw
    multiset in SORTED ancestor order; a uniformly random permutation of
    the n slots restores exchangeability, so the result is distributed
    exactly as n iid lookups -- and in particular any fixed-size PREFIX of
    it is an iid sample (a random permutation of iid draws is the same
    random vector; a sorted prefix would instead be biased toward low
    order statistics).  This is the TPU residual fill: ``searchsorted``
    costs ~130 ms at N=1e6 on a v5e, the two argsorts a few ms.
    """
    k_mult, k_perm = jax.random.split(key)
    anc = _ancestors_from_counts(multinomial_counts(k_mult, weights, n), n)
    return anc[jax.random.permutation(k_perm, n)]


def residual_indices(key, weights, n: int | None = None):
    """Residual resampling with fixed shapes.

    Deterministically copy particle i ``floor(n * w_i)`` times, then fill the
    remaining slots multinomially from the residual weights
    (Resampling.scala:130-146).  The dynamic deterministic count K becomes a
    fixed-shape ``repeat(..., total_repeat_length=n)`` plus a positional mask:
    slots < K take deterministic copies, slots >= K take multinomial draws.

    The residual fill needs per-slot iid draws (the mask takes a
    K-dependent prefix of them): on TPU these come from the sorted
    counts-based multinomial under a random slot permutation
    (:func:`_iid_draws_sorted_permuted` -- search-free, exchangeable, so
    the prefix is unbiased); elsewhere the per-position ``searchsorted``
    lookup (cheap on CPU, ~130 ms at N=1e6 on a v5e).
    """
    m = weights.shape[0]
    n = m if n is None else n
    wn = _normalise(weights)
    ki = jnp.floor(wn * n).astype(jnp.int32)
    k_total = jnp.sum(ki)

    det = jnp.repeat(jnp.arange(m), ki, total_repeat_length=n)

    residual = wn * n - ki
    residual = jnp.maximum(residual, 0.0)
    # guard: if residual mass is exactly zero (all weights uniform), fall back
    # to uniform residual distribution -- those slots are masked out anyway
    safe = jnp.where(jnp.sum(residual) > 0, residual, jnp.ones_like(residual))
    if jax.default_backend() == "tpu":
        multi = _iid_draws_sorted_permuted(key, safe, n)
    else:
        cdf = _cumsum(_normalise(safe))
        positions = jax.random.uniform(key, (n,), weights.dtype)
        multi = _lookup(cdf, positions)

    slot = jnp.arange(n)
    return jnp.where(slot < k_total, det, multi)


def identity_indices(key, weights, n: int | None = None):
    """No resampling.  Reference: Resampling.scala:29."""
    m = weights.shape[0]
    n = m if n is None else n
    return jnp.arange(n) % m


_SCHEMES = {
    "systematic": systematic_indices,
    "stratified": stratified_indices,
    "multinomial": multinomial_indices,
    "residual": residual_indices,
    "identity": identity_indices,
}


def get_scheme(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    try:
        return _SCHEMES[name_or_fn]
    except KeyError:
        raise ValueError(
            f"unknown resampling scheme {name_or_fn!r}; "
            f"choose from {sorted(_SCHEMES)}") from None


def resample(key, particles, weights, scheme="systematic"):
    """Gather a resampled particle set (any pytree with leading axis N)."""
    idx = get_scheme(scheme)(key, weights)
    return jax.tree_util.tree_map(lambda x: x[idx], particles)


def exp_normalise(logw):
    """Log weights -> normalised linear weights without overflow.

    Reference: Resampling.scala:102-108.
    """
    w = jnp.exp(logw - jnp.max(logw))
    return w / jnp.sum(w)


def effective_sample_size(weights):
    """floor(1 / sum(w_hat^2)) from unnormalised linear weights.

    Reference: ParticleFilter.scala:431-434.
    """
    wn = _normalise(weights)
    return jnp.floor(1.0 / jnp.sum(wn * wn)).astype(jnp.int32)


def sample_one(key, xs):
    """Uniformly sample one element (leading axis).

    Reference: Resampling.sampleOne, Resampling.scala:151-154.
    """
    i = jax.random.randint(key, (), 0, jax.tree_util.tree_leaves(xs)[0].shape[0])
    return jax.tree_util.tree_map(lambda x: x[i], xs)


def sample_many(key, n: int, xs):
    """Uniformly sample n elements WITHOUT replacement.

    Reference: Resampling.sampleMany, Resampling.scala:159-162.
    """
    m = jax.tree_util.tree_leaves(xs)[0].shape[0]
    idx = jax.random.permutation(key, m)[:n]
    return jax.tree_util.tree_map(lambda x: x[idx], xs)


def posterior_sample(key, stacked, n: int):
    """Resample n draws (with replacement) from a stacked posterior pytree.

    Reference: Streaming.createDist, Streaming.scala:170-174.
    """
    m = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    idx = jax.random.randint(key, (n,), 0, m)
    return jax.tree_util.tree_map(lambda x: x[idx], stacked)
