"""Pallas TPU kernel: streaming merge gather for particle resampling.

The XLA lowering of the resampling permutation costs ~11 ms at N=1e6 on a
v5e chip: a scatter (ancestor-seed construction, ~7 ms) plus a random row
gather (~4 ms).  Both are pure data movement that hardware could do at
HBM-sequential speed (~0.2 ms), because systematic/stratified ancestors are
**nondecreasing**: producing ``y[j] = x[first i with counts[i] > j]`` for
sorted ``counts`` and consecutive ``j`` is a *merge* of two sorted streams.

Kernel structure (a two-pass merge):

* a cheap XLA prepass finds, for every output block g, the contiguous input
  block range [first_g, last_g] containing its ancestors plus the running
  count entering that range (n_out-sized ``searchsorted`` -- tiny);
* the Pallas grid walks output blocks; each step runs a dynamic-bound
  ``fori_loop`` over exactly the input blocks it needs, DMA-ing each block
  of counts + particle columns into VMEM once;
* within a block, the ancestor of output slot q is the *count of window
  entries <= q* -- a lane-oriented compare + sublane reduction (VPU);
  the duplication itself is 128-lane ``tpu.dynamic_gather`` ops
  (``take_along_axis`` within one lane vreg) selected across source groups
  -- pure VPU data movement, no scatter, no MXU padding waste, bit-exact;
* total input traffic is <= one read of x + counts plus one block per
  output-block boundary (amortised 2x), all sequential; weight degeneracy
  (one particle owning every slot) just re-reads a single input block.

Particles are processed in **transposed [d, N] layout**: the particle axis
rides the 128-wide lane dimension, so block windows are lane-aligned DMA
slices (a [N, d] layout with d < 128 cannot be block-sliced under TPU
tiling).  The wrapper transposes at the boundary.  Counts arrive
column-packed ([128, n_chunks] per block) so both the compare and the DMA
stay tile-aligned.

Equivalent by construction to
``x[inference.resampling._ancestors_from_counts(counts, N)]``.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

# Width (in 128-particle source groups) of the windowed-duplication fast
# path: instead of selecting across all 2*n_chunks source groups per
# output chunk, gather from a W-group window whose base the XLA prepass
# derives from the chunk maxima (hi is nondecreasing along slots, so one
# output chunk's sources almost always sit in a handful of adjacent
# groups).  0 disables the fast path.  Env override for tuning.
#
# Default 3, measured on a real v5e (full fused filter, N=2^20, T=1000,
# ms/step): W=0 1.312, W=2 1.077, W=3 0.955, W=4 0.968, W=8 1.028 --
# a 27% step-time cut, bit-exact on chip in every weight regime
# (uniform/mild/heavy/degenerate/two-spikes); blocks whose active span
# exceeds W fall back to the full 2*n_chunks select per-block, so the
# worst case equals W=0.
_DUP_W_DEFAULT = int(os.environ.get("CSSM_DUP_WINDOW", "3"))


def _merge_kernel_body(serve_args, out_ref):
    """Shared merge-gather body (see :func:`_merge_kernel` docstring)."""
    (first_ref, last_ref, base_ref, idx0_ref, simple_ref,
     c0_blk, x0_blk, c1_blk, x1_blk, m0_blk, m1_blk, c_hbm, xt_hbm,
     cblk, xblk, sem_c, sem_x, xcomb_ref, dup_window) = serve_args
    g = pl.program_id(0)
    d, block = out_ref.shape
    n_chunks = block // _LANE

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    q0 = g * block
    q_row = q0 + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)  # [1, B]

    def serve(c_at, x_at, prev_cmax):
        cmax = c_at[_LANE - 1, n_chunks - 1]

        # block-local ancestor = #entries <= q, two-level (see _merge_kernel)
        h = jnp.zeros((1, block), jnp.int32)
        for m in range(n_chunks):
            h = h + (c_at[_LANE - 1, m] <= q_row).astype(jnp.int32)
        hi = jnp.minimum(h, n_chunks - 1)                         # [1, B]

        hi_sel = jnp.broadcast_to(hi, (_LANE, block))
        pieces = []
        for j in range(n_chunks):
            sl = slice(j * _LANE, (j + 1) * _LANE)
            csel = jnp.take_along_axis(c_at[:, :_LANE], hi_sel[:, sl],
                                       axis=1)                    # [128, 128]
            pieces.append(jnp.sum(
                (csel <= q_row[:, sl]).astype(jnp.int32), axis=0,
                keepdims=True))
        lo1 = pieces[0] if n_chunks == 1 else jnp.concatenate(pieces, axis=1)

        active = (q_row >= prev_cmax) & (q_row < cmax)            # [1, B]
        lo = jnp.broadcast_to(lo1, (d, block))                    # [d, B]
        hi_b = jnp.broadcast_to(hi, (d, block))
        act_b = jnp.broadcast_to(active, (d, block))

        # duplication: per 128-lane output group, gather within each source
        # group (single-vreg tpu.dynamic_gather) and select by hi
        for k in range(n_chunks):
            sl = slice(k * _LANE, (k + 1) * _LANE)
            idx_k = lo[:, sl]
            hi_k = hi_b[:, sl]
            acc = jnp.zeros((d, _LANE), out_ref.dtype)
            for gsrc in range(n_chunks):
                src = x_at[:, gsrc * _LANE:(gsrc + 1) * _LANE]    # [d, 128]
                part = jnp.take_along_axis(src, idx_k, axis=1)
                acc = jnp.where(hi_k == gsrc, part, acc)
            out_ref[:, sl] = jnp.where(act_b[:, sl], acc, out_ref[:, sl])

        return cmax

    # common case: the two auto-pipelined input blocks served as ONE
    # combined 2-block window -- a single two-level counting pass over
    # 2*n_chunks chunks instead of two full serves (the second serve
    # repeated the whole per-slot count for slots the first had already
    # filled; measured ~10-15% of the kernel).  When first[g] is the last
    # input block the pipelined second block aliases the first: its
    # chunk-maxima contributions are masked out (`valid2`), which makes
    # hi < n_chunks everywhere active, so the duplicate columns are never
    # selected.
    c0 = c0_blk[0]
    c1 = c1_blk[0]
    valid2 = (first_ref[g] + 1) <= (pl.num_programs(0) - 1)
    cmax0 = c0[_LANE - 1, n_chunks - 1]
    cmax1 = c1[_LANE - 1, n_chunks - 1]
    cmax_eff = jnp.where(valid2, cmax1, cmax0)

    # level 1 from the SUBLANE-major chunk-maxima operands (the XLA
    # prepass replicates each block's n_chunks maxima along lanes into
    # [S, 128] tiles, padding rows with INT32_MAX): per output chunk, ONE
    # [S, 128] compare + a log-tree sublane reduction replaces n_chunks
    # scalar-broadcast compares against the [1, B] slot row (which spans
    # 16 mostly-empty lane-tiles at block=2048).  Same formula, ~8x fewer
    # vreg ops; downstream layouts unchanged.
    m0 = m0_blk[0]                                               # [S, 128]
    m1 = m1_blk[0]
    h_pieces = []
    h2_pieces = []
    for j in range(n_chunks):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        h_pieces.append(jnp.sum(
            (m0 <= q_row[:, sl]).astype(jnp.int32), axis=0, keepdims=True))
        h2_pieces.append(jnp.sum(
            (m1 <= q_row[:, sl]).astype(jnp.int32), axis=0, keepdims=True))
    h = h_pieces[0] if n_chunks == 1 else jnp.concatenate(h_pieces, axis=1)
    h2 = (h2_pieces[0] if n_chunks == 1
          else jnp.concatenate(h2_pieces, axis=1))
    h = h + jnp.where(valid2, h2, 0)
    hi = jnp.minimum(h, 2 * n_chunks - 1)                        # [1, B]

    # boundary-chunk inner count.  When both blocks' valid columns fit one
    # 128-lane window (2*n_chunks <= 128, every production block size),
    # pack them into ONE [128, 128] buffer -- a lane rotate + select once
    # per block -- and gather with the GLOBAL hi: one gather per output
    # chunk instead of two + a select (the gathers are the kernel's
    # dominant cost; see CLAUDE.md).  Lanes >= 2*n_chunks hold rotated-c1
    # garbage but hi <= 2*n_chunks - 1 never selects them.
    #
    # Entries are further PAIR-PACKED into 16-bit fields of one i32
    # (sublane s with sublane s+64), halving the gather to 8 vregs and the
    # reduce tree to 8: counts only ever compare against q inside THIS
    # block's slot window [q0, q0+block), so clipping to [-1, block] (+1
    # bias -> [0, block+1], 14 bits at block<=8192) loses nothing; q gets
    # a +0x4000 bias so the packed per-field subtract never borrows across
    # fields, making bit 14 of (q_f - c_f) the exact (c <= q) indicator.
    # Int32 gathers throughout -- 16-bit/bf16 take_along_axis crashes the
    # Mosaic compiler (CLAUDE.md), manual packing does not.
    if 2 * n_chunks <= _LANE and block <= 8192:
        lane = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
        comb = jnp.where(lane < n_chunks, c0[:, :_LANE],
                         pltpu.roll(c1[:, :_LANE], n_chunks, 1))
        cf = jnp.clip(comb - (q0 - 1), 0, block + 1)
        half = _LANE // 2
        pk = cf[:half] | (cf[half:] << 16)                       # [64, 128]
        hi_pk = jnp.broadcast_to(hi, (half, block))
        pieces = []
        for j in range(n_chunks):
            sl = slice(j * _LANE, (j + 1) * _LANE)
            qf = (q_row[:, sl] - q0) + 1 + 0x4000
            qpk = qf | (qf << 16)                                # [1, 128]
            csel = jnp.take_along_axis(pk, hi_pk[:, sl], axis=1)
            bits = ((qpk - csel) >> 14) & 0x00010001             # [64, 128]
            s = jnp.sum(bits, axis=0, keepdims=True)
            pieces.append((s & 0xFFFF) + (s >> 16))
    elif 2 * n_chunks <= _LANE:
        lane = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
        comb = jnp.where(lane < n_chunks, c0[:, :_LANE],
                         pltpu.roll(c1[:, :_LANE], n_chunks, 1))
        hi_sel = jnp.broadcast_to(hi, (_LANE, block))
        pieces = []
        for j in range(n_chunks):
            sl = slice(j * _LANE, (j + 1) * _LANE)
            csel = jnp.take_along_axis(comb, hi_sel[:, sl],
                                       axis=1)                   # [128, 128]
            pieces.append(jnp.sum(
                (csel <= q_row[:, sl]).astype(jnp.int32), axis=0,
                keepdims=True))
    else:
        # fallback: one gather per source block + select.  Block-local
        # index and source predicate computed on the [1, B] row BEFORE
        # broadcasting (index math on the broadcast [128, B] wastes
        # full-vreg ops on values constant across sublanes)
        if n_chunks & (n_chunks - 1) == 0:
            hi_loc = hi & (n_chunks - 1)
        else:
            hi_loc = jnp.where(hi >= n_chunks, hi - n_chunks, hi)
        hi_sel = jnp.broadcast_to(hi_loc, (_LANE, block))
        in1_sel = jnp.broadcast_to(hi >= n_chunks, (_LANE, block))
        pieces = []
        for j in range(n_chunks):
            sl = slice(j * _LANE, (j + 1) * _LANE)
            hs = hi_sel[:, sl]
            cs0 = jnp.take_along_axis(c0[:, :_LANE], hs, axis=1)
            cs1 = jnp.take_along_axis(c1[:, :_LANE], hs, axis=1)
            csel = jnp.where(in1_sel[:, sl], cs1, cs0)           # [128, 128]
            pieces.append(jnp.sum(
                (csel <= q_row[:, sl]).astype(jnp.int32), axis=0,
                keepdims=True))
    lo1 = pieces[0] if n_chunks == 1 else jnp.concatenate(pieces, axis=1)

    active = q_row < cmax_eff   # q >= base_ref[g] holds by construction
    lo = jnp.broadcast_to(lo1, (d, block))
    act_b = jnp.broadcast_to(active, (d, block))

    def dup_full():
        # full-width duplication: select across all 2*n_chunks source
        # groups per output chunk (always correct, span-independent)
        hi_b = jnp.broadcast_to(hi, (d, block))
        for k in range(n_chunks):
            sl = slice(k * _LANE, (k + 1) * _LANE)
            idx_k = lo[:, sl]
            hi_k = hi_b[:, sl]
            acc = jnp.zeros((d, _LANE), out_ref.dtype)
            for gsrc in range(n_chunks):
                src = x0_blk[:, gsrc * _LANE:(gsrc + 1) * _LANE]
                part = jnp.take_along_axis(src, idx_k, axis=1)
                acc = jnp.where(hi_k == gsrc, part, acc)
            for gsrc in range(n_chunks):
                src = x1_blk[:, gsrc * _LANE:(gsrc + 1) * _LANE]
                part = jnp.take_along_axis(src, idx_k, axis=1)
                acc = jnp.where(hi_k == n_chunks + gsrc, part, acc)
            out_ref[:, sl] = jnp.where(act_b[:, sl], acc, out_ref[:, sl])

    if dup_window and 2 * n_chunks > dup_window:
        # windowed duplication: hi is nondecreasing along slots, so one
        # output chunk's ACTIVE sources span a narrow contiguous group
        # range.  The XLA prepass publishes a per-chunk window base
        # (idx0, scalar prefetch) and a per-BLOCK flag (`simple`) saying
        # every chunk's active span fits dup_window groups; when it does,
        # W gather+selects from a dynamically lane-offset window of the
        # combined two-block source replace the 2*n_chunks-group select.
        # Static-unrolled chunks with dynamic 128-aligned offsets -- NOT
        # the per-chunk dynamic-bound loops measured 3.3x slower
        # (CLAUDE.md): control flow stays a single per-block pl.when.
        @pl.when(simple_ref[g] == 0)
        def _():
            dup_full()

        @pl.when(simple_ref[g] != 0)
        def _():
            xcomb_ref[:, :block] = x0_blk[...]
            xcomb_ref[:, block:] = x1_blk[...]
            for k in range(n_chunks):
                sl = slice(k * _LANE, (k + 1) * _LANE)
                i0 = idx0_ref[g, k]
                win = xcomb_ref[:, pl.ds(
                    pl.multiple_of(i0 * _LANE, _LANE), dup_window * _LANE)]
                rel = jnp.broadcast_to(hi[:, sl] - i0, (d, _LANE))
                idx_k = lo[:, sl]
                acc = jnp.zeros((d, _LANE), out_ref.dtype)
                for w in range(dup_window):
                    part = jnp.take_along_axis(
                        win[:, w * _LANE:(w + 1) * _LANE], idx_k, axis=1)
                    acc = jnp.where(rel == w, part, acc)
                out_ref[:, sl] = jnp.where(act_b[:, sl], acc,
                                           out_ref[:, sl])
    else:
        dup_full()

    # rare extras: manual sequential DMA per additional input block
    def body(j, prev_cmax):
        cp = pltpu.make_async_copy(c_hbm.at[j], cblk, sem_c)
        xp = pltpu.make_async_copy(
            xt_hbm.at[:, pl.ds(j * block, block)], xblk, sem_x)
        cp.start()
        xp.start()
        cp.wait()
        xp.wait()
        return serve(cblk, xblk, prev_cmax)

    jax.lax.fori_loop(first_ref[g] + 2, last_ref[g] + 1, body, cmax_eff)


def _make_merge_kernel(dup_window: int):
    """Grid: (n_out_blocks,).

    Scalar-prefetch: first/last input-block index and entering count per
    output block.  The first TWO input blocks each output block may need
    arrive through auto-pipelined BlockSpecs whose index maps read the
    prefetched ``first`` array (``c0_blk``/``x0_blk`` at ``first[g]``,
    ``c1_blk``/``x1_blk`` at ``first[g]+1``): an output block's B ancestors
    almost always straddle one input-block boundary, so serving two
    pipelined blocks removes the serial in-kernel DMA round-trip that
    otherwise runs for ~every block (measured 2.65 -> ~1.3 ms/step at
    N=2^20).  Serving an unneeded second block is a no-op (its ``active``
    mask is empty).  Spans of three or more input blocks (offspring
    concentration) fall back to manual DMAs from ``c_hbm``/``xt_hbm``.

    c_hbm [n_in, 128, C] int32: column m of a block holds entries
    [128*m, 128*(m+1)), lane-padded to C >= 128.  out_ref is the g-th
    [d, B] output block in VMEM.

    Scratch: cblk [128, C] int32, xblk [d, B], two DMA semaphores.

    Two-level in-block counting: level 1 -- boundary chunk h = #chunk-maxima
    <= q, from n_chunks scalar VMEM loads broadcast against the
    lane-oriented q row (chunk m's max is its last sublane, row 127 of
    column m); level 2 -- gather chunk h's 128-entry column per slot and
    count entries <= q inside it.  Chunks below h contribute all 128
    entries, chunks above h none, so hi == h and lo == inner count directly
    (chunk h's max is > q, hence inner <= 127).  This does ONE [128, B]
    compare instead of n_chunks of them.
    """

    def kernel(first_ref, last_ref, base_ref, idx0_ref, simple_ref,
               c0_blk, x0_blk, c1_blk, x1_blk, m0_blk, m1_blk,
               c_hbm, xt_hbm, out_ref, cblk, xblk, sem_c, sem_x,
               *xcomb):
        _merge_kernel_body(
            (first_ref, last_ref, base_ref, idx0_ref, simple_ref,
             c0_blk, x0_blk, c1_blk, x1_blk, m0_blk, m1_blk, c_hbm, xt_hbm,
             cblk, xblk, sem_c, sem_x, xcomb[0] if xcomb else None,
             dup_window), out_ref)

    return kernel


def _make_merge_propagate_kernel(weight_fn=None, weight_row: int = 0,
                                 dup_window: int = 0):
    """Build the fused merge+propagate kernel, optionally also computing
    the NEXT observation's log-weights in the output pipeline.

    With ``weight_fn`` (see ``ObservationFamily.kernel_log_density``), the
    kernel contracts the propagated block against the design column
    (``coef[:, 3]``), evaluates the family's log-density from per-step
    scalar constants (an SMEM operand), and writes the [1, B] weight row
    into the ``weight_row``-th (padding) row of the output -- the filter
    step then never re-reads the cloud to weight it.
    """

    def kernel(first_ref, last_ref, base_ref, seed_ref, idx0_ref,
               simple_ref, *rest):
        if weight_fn is None:
            (coef_blk, c0_blk, x0_blk, c1_blk, x1_blk, m0_blk, m1_blk,
             c_hbm, xt_hbm, out_ref, cblk, xblk, sem_c, sem_x,
             *xcomb) = rest
            wconsts = None
        else:
            (coef_blk, wconsts, c0_blk, x0_blk, c1_blk, x1_blk,
             m0_blk, m1_blk,
             c_hbm, xt_hbm, out_ref, cblk, xblk, sem_c, sem_x,
             *xcomb) = rest
        _merge_propagate_tail(
            weight_fn, weight_row, dup_window, first_ref, last_ref,
            base_ref, seed_ref, idx0_ref, simple_ref,
            coef_blk, wconsts, c0_blk, x0_blk, c1_blk, x1_blk,
            m0_blk, m1_blk, c_hbm, xt_hbm, out_ref, cblk, xblk, sem_c,
            sem_x, xcomb[0] if xcomb else None)

    return kernel


def _merge_propagate_tail(weight_fn, weight_row, dup_window,
                          first_ref, last_ref, base_ref, seed_ref,
                          idx0_ref, simple_ref,
                          coef_blk, wconsts, c0_blk, x0_blk, c1_blk, x1_blk,
                          m0_blk, m1_blk, c_hbm, xt_hbm, out_ref,
                          cblk, xblk, sem_c, sem_x, xcomb_ref):
    """Merge-gather resample fused with a diagonal affine-Gaussian
    transition applied to the output block while it is still in VMEM:

        out = a * out + b + s * z,   z ~ N(0, 1)

    with ``coef_blk`` [d, 3 or 4] holding columns (a, b, s[, design]) and
    ``z`` drawn in-kernel (per-core PRNG seeded from ``seed_ref[0]`` and
    the block id, Box-Muller over 24-bit uniforms).  This is the
    reference's propagate-after-resample step (Sde.scala:142-150 exact
    transitions; Resampling.scala:63-72 resampling) with the next step's
    propagation folded into the resampling kernel's output pipeline: one
    full HBM read+write of the cloud less per filter step, and the normal
    draws ride the VPU instead of a separate XLA dispatch.
    """
    _merge_kernel_body(
        (first_ref, last_ref, base_ref, idx0_ref, simple_ref,
         c0_blk, x0_blk, c1_blk, x1_blk, m0_blk, m1_blk, c_hbm, xt_hbm,
         cblk, xblk, sem_c, sem_x, xcomb_ref, dup_window), out_ref)

    out_ref[...] = _propagate_weights_block(
        out_ref[...], coef_blk, wconsts, seed_ref, weight_fn, weight_row)


def _propagate_weights_block(x, coef_blk, wconsts, seed_ref, weight_fn,
                             weight_row):
    """Apply the diagonal affine-Gaussian transition (plus the optional
    fused log-weight row) to a [d, block] VMEM-resident value.

    Box-Muller with full cos+sin pairing: one (log, sqrt, cos, sin)
    group yields TWO independent standard normals, halving the VPU
    transcendental cost (measured: the dominant cost of the fused tail).
    24-bit uniforms: u1 in (0, 1] (never 0 -- log-safe), u2 in [0, 1);
    int32 intermediates (exact below 2^24) because Mosaic's uint32->f32
    convert support is spottier than int32->f32.  The per-core PRNG is
    seeded from ``seed_ref[0]`` and the grid block id, so blocks are
    decorrelated within a call and the caller decorrelates steps.
    """
    g = pl.program_id(0)
    d, block = x.shape
    pltpu.prng_seed(seed_ref[0], g)
    half = block // 2
    b1 = pltpu.prng_random_bits((d, half))
    b2 = pltpu.prng_random_bits((d, half))
    scale = jnp.float32(2.0 ** -24)
    i1 = pltpu.bitcast(pltpu.bitcast(b1, jnp.uint32) >> 8, jnp.int32)
    i2 = pltpu.bitcast(pltpu.bitcast(b2, jnp.uint32) >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * scale + jnp.float32(2.0 ** -25)
    theta = jnp.float32(2.0 * 3.14159265358979) * (
        i2.astype(jnp.float32) * scale)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)

    a = coef_blk[:, 0:1]                                          # [d, 1]
    b = coef_blk[:, 1:2]
    s = coef_blk[:, 2:3]
    out = a * x + b + s * z
    if weight_fn is not None:
        # log-weights of the propagated block, written into the
        # designated padding row (design column is zero there, so the
        # weight row never contaminates gamma)
        fc = coef_blk[:, 3:4]                                     # [d, 1]
        gamma = jnp.sum(fc * out, axis=0, keepdims=True)          # [1, B]
        logw = weight_fn(gamma, wconsts)
        rowid = jax.lax.broadcasted_iota(jnp.int32, (d, block), 0)
        out = jnp.where(rowid == weight_row,
                        jnp.broadcast_to(logw, (d, block)), out)
    return out


def _merge_prepass(counts, n: int, block: int, dup_w: int = 0):
    """XLA prepass: input-block range + entering count per output block.

    first_g = #blocks whose max count <= g*block (== anc_{gB} // block):
    a dense [n_blocks, n_blocks] compare over block maxima beats a 20-round
    binary search over the full counts array.  Also returns the
    column-packed counts (block j, column m = entries [128m, 128(m+1));
    lanes padded to >= 128 so the per-block DMA tile stays aligned).

    With ``dup_w`` > 0 additionally derives the windowed-duplication
    scalars: per output chunk (g, k) the group-window base ``idx0[g, k]``
    (the kernel's hi at the chunk's first slot, clamped so the window
    stays inside the 2*n_chunks combined range) and per output block the
    ``simple[g]`` flag (1 iff every chunk's ACTIVE hi span fits dup_w
    groups -- slots at/after the two-block cmax are masked in the kernel,
    so their span is clamped out of the test).
    """
    from .scan_kernel import _cols_layout_xla

    n_blocks = n // block
    n_chunks = block // _LANE
    blockmax = counts.reshape(n_blocks, block)[:, -1]
    # column-packed counts + sublane-major lane-replicated chunk maxima
    # ([S, 128] per block, padding rows INT32_MAX so they never satisfy
    # `max <= q`) -- the SAME layout builder the cols-emitting counts
    # kernel is bit-gated against (single producer)
    c_cols, mx_cols = _cols_layout_xla(counts, n, block)
    mx = c_cols[:, _LANE - 1, :n_chunks]                  # [n_blocks, nc]

    first, last, base, idx0, simple = _prepass_scalars(
        blockmax, mx, n, block, dup_w)
    return first, last, base, c_cols, mx_cols, idx0, simple


def _prepass_scalars(blockmax, mx, n: int, block: int, dup_w: int):
    """Scalar-prefetch prepass products from the per-block maxima alone:
    input-block range [first, last], entering count ``base``, and the
    windowed-duplication scalars (idx0, simple).  ``mx`` is the
    [n_blocks, n_chunks] chunk maxima (``mx[:, -1] == blockmax``)."""
    n_blocks = n // block
    n_chunks = block // _LANE
    big = jnp.iinfo(jnp.int32).max
    edges = jnp.arange(n_blocks, dtype=jnp.int32) * block
    first = jnp.sum((blockmax[None, :] <= edges[:, None]).astype(jnp.int32),
                    axis=1)
    last = jnp.sum(
        (blockmax[None, :] <= edges[:, None] + (block - 1)).astype(jnp.int32),
        axis=1)
    first = jnp.clip(first, 0, n_blocks - 1).astype(jnp.int32)
    last = jnp.clip(last, 0, n_blocks - 1).astype(jnp.int32)
    base = jnp.where(first > 0, blockmax[jnp.maximum(first - 1, 0)],
                     0).astype(jnp.int32)

    if dup_w:
        # windowed-duplication scalars, mirroring the kernel's level-1
        # count over the SAME two-block maxima window (second block's
        # contributions masked exactly like the kernel's `valid2`)
        nc = n_chunks
        second = jnp.minimum(first + 1, n_blocks - 1)
        valid2 = ((first + 1) <= (n_blocks - 1))[:, None]
        win = jnp.concatenate(
            [mx[first], jnp.where(valid2, mx[second], big)], axis=1)
        cmax_eff = jnp.where(valid2[:, 0], mx[second][:, -1], mx[first][:, -1])
        k = jnp.arange(nc, dtype=jnp.int32)
        q_start = edges[:, None] + k[None, :] * _LANE     # [n_blocks, nc]
        # active slots satisfy q < cmax_eff; clamping the span probe there
        # keeps heavy-tail blocks (whose upper slots are all masked) on
        # the fast path
        q_end = jnp.minimum(q_start + (_LANE - 1), cmax_eff[:, None] - 1)
        h_start = jnp.sum((win[:, None, :] <= q_start[:, :, None]),
                          axis=2).astype(jnp.int32)
        h_end = jnp.sum((win[:, None, :] <= q_end[:, :, None]),
                        axis=2).astype(jnp.int32)
        hi_start = jnp.minimum(h_start, 2 * nc - 1)
        hi_end = jnp.minimum(h_end, 2 * nc - 1)
        idx0 = jnp.minimum(hi_start, 2 * nc - dup_w).astype(jnp.int32)
        simple = jnp.all(hi_end - idx0 <= dup_w - 1, axis=1).astype(jnp.int32)
    else:
        idx0 = jnp.zeros((n_blocks, n_chunks), jnp.int32)
        simple = jnp.zeros((n_blocks,), jnp.int32)
    return first, last, base, idx0, simple


def _prepass_from_cols(counts_cols, n: int, block: int, dup_w: int):
    """Prepass scalars from kernel-built count operands
    (``scan_kernel.systematic_counts_cols``): the chunk maxima are lane 0
    of the mx tiles, so only tiny [n_blocks, nc] slices touch XLA -- no
    flat counts array exists anywhere."""
    c_cols, mx_cols = counts_cols
    n_chunks = block // _LANE
    mx = mx_cols[:, :n_chunks, 0]                     # [n_blocks, nc]
    first, last, base, idx0, simple = _prepass_scalars(
        mx[:, -1], mx, n, block, dup_w)
    return first, last, base, c_cols, mx_cols, idx0, simple


def _merge_specs(d, block, n_chunks, dtype, dup_w: int = 0):
    """Block/scratch specs shared by the plain and fused merge kernels.

    Scalar-prefetch operands precede the tensor operands; index maps take
    (g, *prefetch_refs) and read the prefetched ``first`` array (always
    the first prefetch operand, whatever the prefetch count).  With
    ``dup_w`` a combined two-block source scratch is appended for the
    windowed-duplication fast path.
    """
    def im_c0(g, first, *_):
        return (first[g], 0, 0)

    def im_x0(g, first, *_):
        return (0, first[g])

    def im_c1(g, first, *_):
        return (jnp.minimum(first[g] + 1, first.shape[0] - 1), 0, 0)

    def im_x1(g, first, *_):
        return (0, jnp.minimum(first[g] + 1, first.shape[0] - 1))

    s_rows = max(-(-n_chunks // 8) * 8, 8)
    in_specs = [
        # auto-pipelined first two input blocks per output block
        pl.BlockSpec((1, _LANE, max(n_chunks, _LANE)), im_c0),
        pl.BlockSpec((d, block), im_x0),
        pl.BlockSpec((1, _LANE, max(n_chunks, _LANE)), im_c1),
        pl.BlockSpec((d, block), im_x1),
        # sublane-major chunk maxima of the same two blocks (level-1 count)
        pl.BlockSpec((1, s_rows, _LANE), im_c0),
        pl.BlockSpec((1, s_rows, _LANE), im_c1),
        # raw refs for the rare manual path
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = pl.BlockSpec((d, block), lambda g, *_: (0, g))
    scratch = [
        pltpu.VMEM((_LANE, max(n_chunks, _LANE)), jnp.int32),
        pltpu.VMEM((d, block), dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    if dup_w:
        scratch.append(pltpu.VMEM((d, 2 * block), dtype))
    return in_specs, out_specs, scratch


def _resolve_dup_window(block: int, dup_window):
    """Static dup-window width: env/default, disabled when it would not
    shrink the 2*n_chunks select (tiny blocks)."""
    dw = _DUP_W_DEFAULT if dup_window is None else int(dup_window)
    if dw <= 0 or 2 * (block // _LANE) <= dw:
        return 0
    return dw


def _check_block(n: int, block: int):
    if n % block or block % _LANE or block // _LANE > _LANE:
        raise ValueError(
            f"N={n} must be divisible by block={block}, block a multiple "
            f"of {_LANE} with at most {_LANE} chunks")


@partial(jax.jit, static_argnames=("block", "interpret", "dup_window"))
def sorted_gather_resample_t(x_t, counts, block: int = 1024,
                             interpret: bool = False,
                             dup_window: int | None = None,
                             counts_cols=None):
    """Transposed-layout core: ``y_t[:, j] = x_t[:, anc_j]``.

    Args:
      x_t: [d, N] particle columns (N divisible by ``block``).
      counts: [N] nondecreasing int32 cumulative position counts with
        ``counts[-1] == N``, or None with ``counts_cols``.
      block: tile size (multiple of 128; block/128 <= 128).
      interpret: run in Pallas interpreter mode (CPU testing).
      dup_window: windowed-duplication width in source groups (None =
        the CSSM_DUP_WINDOW env default, 0 = disable the fast path).
      counts_cols: optional pre-built ``(c_cols, mx_cols)`` operand pair
        from :func:`..ops.scan_kernel.systematic_counts_cols` -- the flat
        counts array then never exists and the XLA prepass shrinks to
        scalar work on the maxima.
    """
    d, n = x_t.shape
    _check_block(n, block)
    dw = _resolve_dup_window(block, dup_window)
    if counts_cols is not None:
        first, last, base, c_cols, mx_cols, idx0, simple = (
            _prepass_from_cols(counts_cols, n, block, dw))
    else:
        counts = counts.astype(jnp.int32)
        first, last, base, c_cols, mx_cols, idx0, simple = _merge_prepass(
            counts, n, block, dw)
    in_specs, out_specs, scratch = _merge_specs(
        d, block, block // _LANE, x_t.dtype, dw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    return pl.pallas_call(
        _make_merge_kernel(dw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n), x_t.dtype),
        interpret=interpret,
    )(first, last, base, idx0, simple, c_cols, x_t, c_cols, x_t,
      mx_cols, mx_cols, c_cols, x_t)


@partial(jax.jit, static_argnames=("block", "interpret", "weight_family",
                                   "weight_row", "dup_window"))
def sorted_gather_resample_propagate_t(x_t, counts, coef, seed,
                                       block: int = 1024,
                                       interpret: bool = False,
                                       weight_family=None,
                                       weight_consts=None,
                                       weight_row: int | None = None,
                                       dup_window: int | None = None,
                                       counts_cols=None):
    """Fused resample + diagonal affine-Gaussian propagate, transposed.

    ``y_t[:, j] = a * x_t[:, anc_j] + b + s * z_j`` with z ~ N(0, 1) drawn
    in-kernel (see :func:`_merge_propagate_tail`).  Covers every exact
    reference transition (Brownian/GenBrownian/OU and block-diagonal
    composites, Sde.scala:86-95/114-123/142-150): the caller supplies
    ``coef = stack([a, b, s], axis=1)`` [d, 3] from
    ``Sde.transition_coeffs`` with ``s = sqrt(q)``.

    With ``weight_family`` (an ObservationFamily whose
    ``kernel_log_density`` hook is implemented), ``coef`` is [d, 4] (4th
    column the design vector), ``weight_consts`` the family's [k] per-step
    scalars, and the next step's log-weights are written into output row
    ``weight_row`` (a padding row the caller reserves).

    Args:
      x_t: [d, N] particle columns (N divisible by ``block``).
      counts: [N] nondecreasing int32 cumulative position counts.
      coef: [d, 3] (or [d, 4] weighted) float32 (columns a, b, sqrt(q)
        [, design]).
      seed: [1] int32 per-step PRNG seed (fold a step counter in upstream;
        the kernel decorrelates blocks by mixing in the block id).
      block, interpret: as :func:`sorted_gather_resample_t`.  NB interpret
      mode's ``prng_random_bits`` yields zeros, so interpreted runs are
      only meaningful with s == 0 (the zero-noise/identity cases).
    """
    d, n = x_t.shape
    _check_block(n, block)
    weighted = weight_family is not None
    ncol = 4 if weighted else 3
    if coef.shape != (d, ncol):
        raise ValueError(f"coef must be [d={d}, {ncol}], got {coef.shape}")
    dw = _resolve_dup_window(block, dup_window)
    coef = coef.astype(x_t.dtype)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    if counts_cols is not None:
        first, last, base, c_cols, mx_cols, idx0, simple = (
            _prepass_from_cols(counts_cols, n, block, dw))
    else:
        counts = counts.astype(jnp.int32)
        first, last, base, c_cols, mx_cols, idx0, simple = _merge_prepass(
            counts, n, block, dw)
    in_specs, out_specs, scratch = _merge_specs(
        d, block, block // _LANE, x_t.dtype, dw)
    # coef (+ weight consts) ride in front of the pipelined tensor operands
    head = [pl.BlockSpec((d, ncol), lambda g, *_: (0, 0))]
    args = [coef]
    if weighted:
        wspec = weight_family.kernel_log_density()
        if wspec is None:
            raise ValueError(
                f"{type(weight_family).__name__} has no kernel_log_density")
        _, weight_fn = wspec
        if weight_row is None or not (0 <= weight_row < d):
            raise ValueError(f"weight_row={weight_row} outside [0, {d})")
        wc = jnp.asarray(weight_consts, jnp.float32).reshape(-1)
        head.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(wc)
    else:
        weight_fn = None
    in_specs = head + in_specs

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    return pl.pallas_call(
        _make_merge_propagate_kernel(weight_fn, weight_row or 0, dw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n), x_t.dtype),
        interpret=interpret,
    )(first, last, base, seed, idx0, simple, *args, c_cols, x_t, c_cols,
      x_t, mx_cols, mx_cols, c_cols, x_t)


@partial(jax.jit, static_argnames=("block", "interpret", "weight_family",
                                   "weight_row"))
def propagate_weights_t(x_t, coef, seed, block: int = 4096,
                        interpret: bool = False,
                        weight_family=None, weight_consts=None,
                        weight_row: int | None = None):
    """Standalone fused diagonal affine-Gaussian propagate, transposed:

        ``y_t[:, j] = a * x_t[:, j] + b + s * z_j``,  z ~ N(0, 1)

    with the noise drawn in-kernel (same Box-Muller pipeline as the fused
    resample kernel, :func:`_propagate_weights_block`) -- one HBM
    read+write of the cloud with the normal draws and the optional
    log-weight evaluation riding the VPU in the same pass.  This serves
    the paths that cannot fuse the propagate into the resample kernel
    (per-step summaries need the unpropagated resampled cloud;
    the sharded filter's ring fill produces its output across several
    kernel launches): the reference's propagate step (Sde.scala:142-150
    exact transitions) plus optionally the weight step
    (ParticleFilter.scala:124-127) in one kernel.

    Args mirror :func:`sorted_gather_resample_propagate_t`: ``coef`` is
    [d, 3] (or [d, 4] with ``weight_family``, whose
    ``kernel_log_density`` hook then writes the block's log-weights into
    output row ``weight_row`` -- a padding row the caller reserves).
    ``seed`` is a [1] int32 per-step seed (fold a step counter in
    upstream); blocks are decorrelated by the in-kernel block id.
    NB interpret mode's ``prng_random_bits`` yields zeros, so
    interpreted runs are only meaningful with s == 0.
    """
    d, n = x_t.shape
    if n % block or block % _LANE:
        raise ValueError(
            f"N={n} must be divisible by block={block}, block a multiple "
            f"of {_LANE}")
    weighted = weight_family is not None
    ncol = 4 if weighted else 3
    if coef.shape != (d, ncol):
        raise ValueError(f"coef must be [d={d}, {ncol}], got {coef.shape}")
    coef = coef.astype(x_t.dtype)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    in_specs = [pl.BlockSpec((d, ncol), lambda g, *_: (0, 0))]
    args = [coef]
    if weighted:
        wspec = weight_family.kernel_log_density()
        if wspec is None:
            raise ValueError(
                f"{type(weight_family).__name__} has no kernel_log_density")
        _, weight_fn = wspec
        if weight_row is None or not (0 <= weight_row < d):
            raise ValueError(f"weight_row={weight_row} outside [0, {d})")
        wc = jnp.asarray(weight_consts, jnp.float32).reshape(-1)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(wc)
    else:
        weight_fn = None
    in_specs.append(pl.BlockSpec((d, block), lambda g, *_: (0, g)))

    def kernel(seed_ref, *rest):
        if weighted:
            coef_blk, wconsts, x_blk, out_ref = rest
        else:
            (coef_blk, x_blk, out_ref), wconsts = rest, None
        out_ref[...] = _propagate_weights_block(
            x_blk[...], coef_blk, wconsts, seed_ref, weight_fn,
            weight_row or 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((d, block), lambda g, *_: (0, g)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n), x_t.dtype),
        interpret=interpret,
    )(seed, *args, x_t)


def sorted_gather_resample(x, counts, block: int = 1024,
                           interpret: bool = False):
    """``y[j] = x[first i with counts[i] > j]`` for nondecreasing ``counts``.

    [N, d] boundary wrapper around :func:`sorted_gather_resample_t`.
    The state dimension is padded up to a sublane multiple (8) -- DMA
    slices require 8-aligned sublane extents.  Returns [N, d] resampled
    rows, identical to ``x[_ancestors_from_counts(counts, N)]``.
    """
    d = x.shape[1]
    d_pad = (-d) % 8
    x_t = x.T
    if d_pad:
        x_t = jnp.pad(x_t, ((0, d_pad), (0, 0)))
    y_t = sorted_gather_resample_t(x_t, counts, block=block,
                                   interpret=interpret)
    return y_t[:d].T


# canonical counts producers live in inference.resampling (one formula for
# the XLA and Pallas paths, which are bit-compared); re-exported here for
# the kernel-facing API surface
from ..inference.resampling import (stratified_counts,  # noqa: E402,F401
                                    systematic_counts)


def systematic_resample_pallas(key, x, weights, block: int = 1024,
                               interpret: bool = False):
    """Full systematic resampling step with the Pallas merge gather.

    Drop-in replacement for
    ``x[resampling.systematic_indices(key, weights)]`` when ``x`` is a
    2-D [N, d] float array with N divisible by ``block``.
    """
    return sorted_gather_resample(x, systematic_counts(key, weights),
                                  block=block, interpret=interpret)
