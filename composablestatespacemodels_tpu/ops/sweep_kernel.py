"""Pallas TPU kernel: the ENTIRE small-N particle-filter sweep in one launch.

At the reference PMMH shape (N=100 particles, T=400 observations,
DetermineParameters.scala:55-85) the per-step work is ~5 us of arithmetic,
but the XLA scan body is dozens of tiny latency-bound fusions plus a
counts-kernel launch -- measured ~0.4 ms per vmapped step at 256 chains
(~160 ms per PMMH iteration).  This kernel runs the full T-step bootstrap
filter for ALL chains in a single ``pallas_call``:

* chains ride the SUBLANE axis (any multiple of 8), particles the LANE
  axis (N <= 128: one vreg row per chain holds the whole cloud; 128 <
  N <= 1024: the cloud spans ceil(N/128) lane chunks with two-stage
  reductions and chunk-decomposed gathers -- see
  ``_make_sweep_kernel_multi``);
* the grid is ``(T,)`` -- TPU grids execute sequentially, so the particle
  clouds and log-likelihood accumulators live in VMEM scratch across
  steps (the same carry idiom as the counts kernel);
* per-step per-chain operands (transition coefficients from
  ``Sde.transition_coeffs``, weight constants from the observation
  family's ``kernel_log_density`` hook) are auto-pipelined ``(1, ..., 8)``
  HBM blocks; per-step scalars (design vector, mask) are scalar-prefetch
  SMEM arrays;
* propagation is the exact diagonal affine-Gaussian transition
  x' = a x + b + s z with in-kernel Box-Muller noise (cos+sin pairing,
  the validated pipeline of ``resample_kernel._propagate_weights_block``);
* systematic resampling is closed-form in-register: one MXU
  ``Precision.HIGHEST`` upper-triangular matmul gives every chain's
  in-lane weight prefix at once, counts are ``clip(ceil(n cdf - u), 0, n)``
  with a lane-direction running max, and ancestors come from a 7-round
  in-lane bisection (``take_along_axis`` within the 128-lane vreg);
* a masked (missing) observation needs NO special casing: logw == 0
  gives uniform weights, whose systematic counts are exactly the
  identity staircase (anc == slot) and whose ll increment is exactly 0.

Statistically equivalent to ``bootstrap_filter(store='ll')`` (different
PRNG streams; the reference semantics ParticleFilter.scala:116-132 are
preserved step for step).  f32, N <= 1024 (the reference pilot grid's
own ceiling is N = 2000 at T <= 400, DetermineParameters.scala:22-45),
exact-transition SDEs and kernel-hook observation families only -- the
shapes PMMH actually runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


class _ChainConsts:
    """Adapter giving ``kernel_log_density`` ``fn``s per-chain constants.

    The family hooks index their constants array (``c[0] * gamma`` etc.);
    here ``c[k]`` is the k-th lane of a [B, 8] per-(step, chain) tile as a
    [B, 1] column, which broadcasts against the [B, N] gamma tile exactly
    as the scalar consts broadcast against the fused filter's [1, B] row.
    """

    def __init__(self, tile):
        self._tile = tile  # [B, 8]

    def __getitem__(self, k):
        return self._tile[:, k:k + 1]


def _box_muller(shape):
    """Standard normals from the per-core PRNG (cos+sin pairing; see
    resample_kernel._propagate_weights_block -- moments validated on
    chip).  ``shape[-1]`` must be even."""
    d, n = shape
    half = n // 2
    b1 = pltpu.prng_random_bits((d, half))
    b2 = pltpu.prng_random_bits((d, half))
    scale = jnp.float32(2.0 ** -24)
    i1 = pltpu.bitcast(pltpu.bitcast(b1, jnp.uint32) >> 8, jnp.int32)
    i2 = pltpu.bitcast(pltpu.bitcast(b2, jnp.uint32) >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * scale + jnp.float32(2.0 ** -25)
    theta = jnp.float32(2.0 * 3.14159265358979) * (
        i2.astype(jnp.float32) * scale)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)


def _uniform_col(b):
    """One uniform (0, 1) draw per chain as a [B, 1] column."""
    bits = pltpu.prng_random_bits((b, _LANE))
    i = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = i.astype(jnp.float32) * jnp.float32(2.0 ** -24) + jnp.float32(
        2.0 ** -25)
    return u[:, 0:1]


def _lane_reduce(x, op, init):
    """Per-row (chain) reduction over lanes via a roll tree; returns the
    reduced value replicated in every lane."""
    acc = x
    d = 1
    while d < _LANE:
        acc = op(acc, pltpu.roll(acc, d, 1))
        d *= 2
    return acc


def _make_sweep_kernel(weight_fn, d: int, b: int, n: int, n_steps: int):
    """Build the sweep kernel body.  Shapes: state [d*B, 128] scratch
    (lanes >= n are padding), coef blocks [1, d*B, 8] (lanes a, b, s),
    weight-const blocks [1, B, 8], design/mask scalar-prefetch."""
    n_rounds = []
    s = 1
    while s < _LANE:
        n_rounds.append(s)
        s *= 2
    n_rounds = n_rounds[::-1]  # 64, 32, 16, 8, 4, 2, 1

    def kernel(design_ref, mask_ref, seed_ref, coef_blk, wc_blk, x0_ref,
               ll_ref, xf_ref, x_scr, ll_scr):
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANE), 1)
        valid = lane < n
        row128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
        col128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
        upper = ((row128 <= col128) & (row128 < n)).astype(jnp.float32)

        t = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], t)

        @pl.when(t == 0)
        def _():
            x_scr[...] = x0_ref[...]
            ll_scr[...] = jnp.zeros((b, _LANE), jnp.float32)

        coef = coef_blk[0]                            # [d*B, 8]
        z = _box_muller((d * b, _LANE))
        a_c = coef[:, 0:1]
        b_c = coef[:, 1:2]
        s_c = coef[:, 2:3]
        x = a_c * x_scr[...] + b_c + s_c * z          # [d*B, N]
        mf = mask_ref[t].astype(jnp.float32)

        # gamma = sum_d design[t, d] * x_d   (scalar-broadcast per dim:
        # a handful of scalar reads per step, far off the hot path)
        gamma = jnp.zeros((b, _LANE), jnp.float32)
        for k in range(d):
            gamma = gamma + design_ref[t, k] * x[k * b:(k + 1) * b, :]

        # select-mask (NOT multiply): a family whose consts are singular
        # at the masked y_safe placeholder (Beta: log(0) = -inf) would
        # turn lw * 0 into NaN and poison the ll from this step on
        logw = jnp.where(mf > 0, weight_fn(gamma, _ChainConsts(wc_blk[0])),
                         0.0)
        logw = jnp.where(valid, logw, jnp.float32(-1e30))

        maxw = _lane_reduce(logw, jnp.maximum, None)  # [B, 128] replicated
        u = jnp.where(valid, jnp.exp(logw - maxw), 0.0)
        total = _lane_reduce(u, jnp.add, None)
        # ll += maxw + log(mean u) ; a masked step contributes exactly 0
        # (logw == 0 -> maxw == 0, total == n)
        ll_scr[...] = ll_scr[...] + (
            maxw + jnp.log(total) - jnp.float32(jnp.log(n))) * mf

        # systematic counts: in-lane cdf via ONE [B,128]@[128,128] MXU
        # prefix (HIGHEST, exact 0/1 operand), counts clip(ceil(n cdf - ud))
        wn = u / total
        cdf = jax.lax.dot(wn, upper,
                          precision=jax.lax.Precision.HIGHEST)  # [B, 128]
        ud = _uniform_col(b)                                    # [B, 1]
        nf = jnp.float32(n)
        counts = jnp.clip(jnp.ceil(nf * cdf - ud), 0.0, nf).astype(jnp.int32)
        counts = jnp.where(lane == n - 1, jnp.int32(n), counts)
        # lane-direction running max monotoniser (cdf ulp dips)
        m = counts
        dd = 1
        while dd < _LANE:
            m = jnp.maximum(m, jnp.where(lane >= dd, pltpu.roll(m, dd, 1),
                                         0))
            dd *= 2
        counts = m

        # ancestors: anc(q) = #{j : counts[j] <= q} by 7-round bisection
        # (counts nondecreasing along lanes; in-lane dynamic gathers)
        q = lane
        idx = jnp.zeros((b, _LANE), jnp.int32)
        for s in n_rounds:
            cand = idx + s
            probe = jnp.minimum(cand - 1, _LANE - 1)
            val = jnp.take_along_axis(counts, probe, axis=1)
            idx = jnp.where((cand <= _LANE) & (val <= q), cand, idx)
        anc = jnp.minimum(idx, n - 1)                           # [B, 128]

        for k in range(d):
            sl = slice(k * b, (k + 1) * b)
            x_scr[sl, :] = jnp.take_along_axis(x[sl, :], anc, axis=1)

        @pl.when(t == n_steps - 1)
        def _():
            ll_ref[...] = ll_scr[...]
            xf_ref[...] = x_scr[...]

    return kernel


def _make_sweep_kernel_multi(weight_fn, d: int, b: int, n: int,
                             n_steps: int, k: int):
    """Multi-chunk sweep body for n > 128 particles: the cloud spans
    ``k = ceil(n / 128)`` lane chunks (state ``[d*B, k*128]`` scratch),
    every per-particle op loops the chunks statically, reductions are
    two-stage (in-chunk roll tree, then a k-way elementwise combine) and
    cross-chunk gathers decompose into per-source-chunk in-vreg
    ``take_along_axis`` + chunk-id selects (tpu.dynamic_gather only
    reaches 128 lanes -- see ops/resample_kernel.py).  The ancestor
    bisection splits into a no-gather phase over chunk running maxima
    (strides >= 128: ``counts[c*128 - 1]`` IS the monotonised chunk-c-1
    running max) and the in-chunk 7-round phase (the source chunk is
    then fixed per output lane)."""
    kk_lanes = k * _LANE
    # phase-1 strides: next_pow2(K)/2 down to 128 (absent when k == 1)
    p = 1
    while p < kk_lanes:
        p *= 2
    hi_rounds = []
    s = p // 2
    while s >= _LANE:
        hi_rounds.append(s)
        s //= 2
    lo_rounds = [64, 32, 16, 8, 4, 2, 1]

    def kernel(design_ref, mask_ref, seed_ref, coef_blk, wc_blk, x0_ref,
               ll_ref, xf_ref, x_scr, ll_scr):
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANE), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
        col128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
        upper = (row128 <= col128).astype(jnp.float32)

        t = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], t)

        @pl.when(t == 0)
        def _():
            x_scr[...] = x0_ref[...]
            ll_scr[...] = jnp.zeros((b, _LANE), jnp.float32)

        coef = coef_blk[0]                            # [d*B, 8]
        a_c = coef[:, 0:1]
        b_c = coef[:, 1:2]
        s_c = coef[:, 2:3]
        mf = mask_ref[t].astype(jnp.float32)
        consts = _ChainConsts(wc_blk[0])

        # propagate + weigh chunk by chunk
        xs, logws = [], []
        for c in range(k):
            sl = slice(c * _LANE, (c + 1) * _LANE)
            z = _box_muller((d * b, _LANE))
            xc = a_c * x_scr[:, sl] + b_c + s_c * z   # [d*B, 128]
            xs.append(xc)
            gamma = jnp.zeros((b, _LANE), jnp.float32)
            for j in range(d):
                gamma = gamma + design_ref[t, j] * xc[j * b:(j + 1) * b, :]
            # select-mask, not multiply: see _make_sweep_kernel (masked
            # steps with y-singular consts, e.g. Beta's log(0) = -inf)
            lw = jnp.where(mf > 0, weight_fn(gamma, consts), 0.0)
            logws.append(jnp.where(lane + c * _LANE < n, lw,
                                   jnp.float32(-1e30)))

        # two-stage reductions: in-chunk roll tree, k-way combine
        maxw = _lane_reduce(logws[0], jnp.maximum, None)
        for c in range(1, k):
            maxw = jnp.maximum(maxw, _lane_reduce(logws[c], jnp.maximum,
                                                  None))
        us, totals = [], []
        for c in range(k):
            uc = jnp.where(lane + c * _LANE < n,
                           jnp.exp(logws[c] - maxw), 0.0)
            us.append(uc)
            totals.append(_lane_reduce(uc, jnp.add, None))
        total = totals[0]
        for c in range(1, k):
            total = total + totals[c]
        ll_scr[...] = ll_scr[...] + (
            maxw + jnp.log(total) - jnp.float32(jnp.log(n))) * mf

        # per-chunk cdf: in-chunk MXU prefix + running cross-chunk offset
        ud = _uniform_col(b)                          # [B, 1]
        nf = jnp.float32(n)
        counts = []
        run = jnp.zeros((b, _LANE), jnp.float32)
        for c in range(k):
            wn = us[c] / total
            cdf = jax.lax.dot(wn, upper,
                              precision=jax.lax.Precision.HIGHEST) + run
            run = run + totals[c] / total
            cc = jnp.clip(jnp.ceil(nf * cdf - ud), 0.0, nf).astype(jnp.int32)
            cc = jnp.where(lane + c * _LANE == n - 1, jnp.int32(n), cc)
            counts.append(cc)
        # global running-max monotoniser: in-chunk tree + carried chunk max
        carry = jnp.zeros((b, _LANE), jnp.int32)
        maxima = []
        for c in range(k):
            m = counts[c]
            dd = 1
            while dd < _LANE:
                m = jnp.maximum(m, jnp.where(lane >= dd,
                                             pltpu.roll(m, dd, 1), 0))
                dd *= 2
            m = jnp.maximum(m, carry)
            counts[c] = m
            carry = _lane_reduce(m, jnp.maximum, None)
            maxima.append(carry)                      # running max incl. c

        # ancestors per output chunk: anc(q) = #{j : counts[j] <= q}
        for oc in range(k):
            q = lane + oc * _LANE
            idx = jnp.zeros((b, _LANE), jnp.int32)
            for s in hi_rounds:
                cand = idx + s
                pc = (cand >> 7) - 1                  # probe chunk id
                val = maxima[0]
                for c2 in range(1, k):
                    val = jnp.where(pc == c2, maxima[c2], val)
                idx = jnp.where((cand <= kk_lanes) & (val <= q), cand, idx)
            # idx is now the base of the (fixed) source chunk
            bc = jnp.minimum(idx >> 7, k - 1)
            for s in lo_rounds:
                cand = idx + s
                ploc = (cand - 1) & (_LANE - 1)
                val = jnp.take_along_axis(counts[0], ploc, axis=1)
                for c2 in range(1, k):
                    val = jnp.where(
                        bc == c2,
                        jnp.take_along_axis(counts[c2], ploc, axis=1), val)
                idx = jnp.where((cand <= kk_lanes) & (val <= q), cand, idx)
            anc = jnp.minimum(idx, n - 1)
            a_ch = jnp.minimum(anc >> 7, k - 1)
            a_loc = anc & (_LANE - 1)
            for j in range(d):
                rs = slice(j * b, (j + 1) * b)
                new = jnp.take_along_axis(xs[0][rs, :], a_loc, axis=1)
                for c2 in range(1, k):
                    new = jnp.where(
                        a_ch == c2,
                        jnp.take_along_axis(xs[c2][rs, :], a_loc, axis=1),
                        new)
                x_scr[rs, oc * _LANE:(oc + 1) * _LANE] = new

        @pl.when(t == n_steps - 1)
        def _():
            ll_ref[...] = ll_scr[...]
            xf_ref[...] = x_scr[...]

    return kernel


@partial(jax.jit, static_argnames=("weight_family", "interpret"))
def pf_sweep_chains(x0, coef, design, wconsts, mask, seed,
                    weight_family=None, interpret: bool = False):
    """Run B chains' full bootstrap-filter sweeps in one kernel.

    Args:
      x0: [B, d, n] f32 initial particle clouds (n <= 1024), already at
        the first observation's time (as ``_filter_impl_t_fused``).
      coef: [T, B, d, 3] f32 per-step per-chain (a, b, sqrt(q)) diagonal
        affine-Gaussian transition coefficients, ``coef[i]`` advancing
        the cloud from observation i-1 to observation i
        (``Sde.transition_coeffs``; coef[0] is the identity/dt=0 step).
      design: [T, d] f32 time-varying design vectors (``Model.design_vector``).
      wconsts: [T, B, K<=8] f32 per-step per-chain weight constants
        (``kernel_log_density``'s make_consts, vmapped over chains).
      mask: [T] bool/int observation mask (False -> no weight, no ll).
      seed: [1] int32 sweep seed (fold chain-batch/iteration indices in
        upstream; steps are decorrelated in-kernel).
      weight_family: ObservationFamily providing ``kernel_log_density``.

    Returns ``(ll [B], x_final [B, d, n])``.  Statistically equivalent to
    per-chain ``bootstrap_filter(store='ll')`` with always-resample
    semantics (ParticleFilter.scala:116-132); different PRNG streams.
    NB interpret-mode PRNG yields zeros -- CPU tests only exercise the
    deterministic structure (s == 0 transitions).
    """
    b, d, n = x0.shape
    n_steps = coef.shape[0]
    k = -(-n // _LANE)                # lane chunks (1 for n <= 128)
    if k > 8:
        raise ValueError(
            f"pf_sweep_chains supports n <= {8 * _LANE}, got {n}")
    if b % 8:
        raise ValueError(f"chain count must be a multiple of 8, got {b}")
    wspec = weight_family.kernel_log_density()
    if wspec is None:
        raise ValueError(
            f"{type(weight_family).__name__} has no kernel_log_density")
    _, weight_fn = wspec

    # cap chains per kernel launch: Mosaic vectorizes every op over the
    # full [d*B, chunk*128] tile, and past ~64 sublane-chain-chunks the
    # unrolled instruction count sends the remote compile pathological
    # (observed: a B=256 single-chunk compile still running after 20+
    # min vs ~1 min at B=64).  Multi-chunk clouds (n > 128) shrink the
    # per-launch chain budget proportionally.  Groups reuse ONE compiled
    # kernel; a handful of sequential launches per sweep is noise next
    # to the per-step XLA scan this replaces.
    cap = max(64 // k, 8)
    if b > cap:
        gb = cap if (cap % 8 == 0 and b % cap == 0) else max(
            g for g in range(8, cap + 1, 8) if b % g == 0)
        seeds = (jnp.asarray(seed, jnp.int32).reshape(1)
                 + jnp.arange(b // gb, dtype=jnp.int32)
                 * jnp.int32(0x100003))
        lls = []
        xfs = []
        for g in range(b // gb):
            sl = slice(g * gb, (g + 1) * gb)
            ll_g, xf_g = pf_sweep_chains(
                x0[sl], coef[:, sl], design, wconsts[:, sl], mask,
                seeds[g:g + 1], weight_family=weight_family,
                interpret=interpret)
            lls.append(ll_g)
            xfs.append(xf_g)
        return jnp.concatenate(lls), jnp.concatenate(xfs)

    # layouts: state [d*B, k*128] (dim-major sublanes, particle lanes);
    # coef [T, d*B, 8]; wconsts [T, B, 8]; lanes >= n zero-padded
    kl = k * _LANE
    pad_n = kl - n
    x0_t = jnp.transpose(x0, (1, 0, 2)).reshape(d * b, n)
    if pad_n:
        x0_t = jnp.pad(x0_t, ((0, 0), (0, pad_n)))
    coef_t = jnp.transpose(coef.astype(jnp.float32), (0, 2, 1, 3)).reshape(
        n_steps, d * b, 3)
    coef_t = jnp.pad(coef_t, ((0, 0), (0, 0), (0, 5)))
    kc = wconsts.shape[-1]
    wc = jnp.pad(wconsts.astype(jnp.float32), ((0, 0), (0, 0), (0, 8 - kc)))
    design = design.astype(jnp.float32)
    maski = jnp.asarray(mask, jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # design, mask, seed
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, d * b, 8), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, b, 8), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((d * b, kl), lambda t, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, _LANE), lambda t, *_: (0, 0)),
            pl.BlockSpec((d * b, kl), lambda t, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d * b, kl), jnp.float32),
            pltpu.VMEM((b, _LANE), jnp.float32),
        ],
    )
    body = (_make_sweep_kernel(weight_fn, d, b, n, n_steps) if k == 1
            else _make_sweep_kernel_multi(weight_fn, d, b, n, n_steps, k))
    ll_tile, xf = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((d * b, kl), jnp.float32)),
        interpret=interpret,
    )(design, maski, seed, coef_t, wc, x0_t)
    xf = jnp.transpose(xf.reshape(d, b, kl)[:, :, :n], (1, 0, 2))
    return ll_tile[:, 0], xf
