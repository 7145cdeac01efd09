"""Pallas TPU kernel: blocked inclusive prefix sum via MXU triangular matmuls.

XLA's ``associative_scan`` over a 1-D [N] array lowers to ~log2(N) full-array
slice+pad+add stages with lane-unaligned offsets -- measured **1.65 ms** at
N=2^20 f32 on a v5e chip, which made the resampling-counts prefix the second
largest cost of the particle-filter step (CLAUDE.md perf notes).  A prefix
sum is two small matmuls per block on the MXU plus a scalar carry:

* reshape to [rows, 128] row-major; the grid walks blocks of R rows
  sequentially (TPU grids are sequential, so a scalar SMEM carry accumulates
  across blocks);
* within a block: ``P = X @ U`` (U = upper-triangular ones, inclusive) gives
  each row's lane-prefix; ``carry_rows = L @ P[:, -1:]`` (L = strictly lower
  ones) gives each row the sum of previous rows; the output is
  ``P + carry_rows + carry_scalar``.

Matmuls run at ``Precision.HIGHEST`` (the bf16x3 decomposition carries the
full f32 mantissa; products against 0/1 are exact, accumulation is f32 on
the MXU), so accuracy matches a sequential f32 sum up to summation order.
Total traffic is one read + one write of the array: ~0.05 ms at N=2^20
instead of 1.65 ms.

**Batching.** Every public entry point is a ``custom_vmap``: one level of
``jax.vmap`` routes to the same kernels on a (batch, blocks) grid with the
SMEM carries re-initialised at the start of every batch row.  Pallas's
default batching rule must never see these kernels -- it prepends the batch
as grid axis 0, which silently turns the ``program_id(0) == 0`` carry reset
into a once-per-BATCH reset and leaks carries across batch elements
(observed on a real v5e: ``pmmh_chains`` vmaps the filter, and every chain
after the first read a cdf offset by the previous chains' totals).

No reference analog (the reference's cumulative sums are scalar folds,
Resampling.scala:113-122); this is TPU-native infrastructure for
:mod:`..inference.resampling`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _scan_kernel(x_ref, out_ref, carry_ref, *, gaxis: int = 0):
    g = pl.program_id(gaxis)

    @pl.when(g == 0)
    def _():
        carry_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[...]                                   # [R, 128]
    r = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    upper = (row <= col).astype(jnp.float32)         # inclusive lane prefix
    p = jax.lax.dot(x, upper, precision=jax.lax.Precision.HIGHEST)

    rowtot = p[:, _LANE - 1:_LANE]                   # [R, 1]
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    lower = (rr > cc).astype(jnp.float32)            # strictly previous rows
    carry_rows = jax.lax.dot(lower, rowtot,
                             precision=jax.lax.Precision.HIGHEST)  # [R, 1]

    carry = carry_ref[0, 0]
    out_ref[...] = p + carry_rows + carry
    carry_ref[0, 0] = carry + carry_rows[r - 1, 0] + rowtot[r - 1, 0]


def _cummax_body(c, r, rowi, lane, carrym):
    """Exact int32 running max over a [R, 128] block given the scalar
    carry; returns the monotonised block (Hillis-Steele log-shifts; all
    shifts are full-width rotate+mask because [R, 1] column vectors hit
    unsupported Mosaic concat layouts; 0 is the max-identity for
    nonnegative counts)."""
    m = c
    d = 1
    while d < _LANE:                                 # lane-direction cummax
        m = jnp.maximum(m, jnp.where(lane >= d, pltpu.roll(m, d, 1), 0))
        d *= 2
    mm = m
    d = 1
    while d < r:                                     # per-column row cummax
        mm = jnp.maximum(mm, jnp.where(rowi >= d, pltpu.roll(mm, d, 0), 0))
        d *= 2
    # exclusive row carry: previous row's running max sits in lane 127;
    # suffix-max along lanes (rows are lane-nondecreasing) spreads it
    e = jnp.where(rowi >= 1, pltpu.roll(mm, 1, 0), 0)
    d = 1
    while d < _LANE:
        e = jnp.maximum(
            e, jnp.where(lane < _LANE - d, pltpu.roll(e, _LANE - d, 1), 0))
        d *= 2
    return jnp.maximum(m, jnp.maximum(e, carrym))


def _cummax_kernel(x_ref, out_ref, carry_ref, *, gaxis: int = 0):
    """Inclusive running max of nonnegative int32 (flattened row-major).

    int32 max is exact and idempotent, so Hillis-Steele log-shifts give the
    true sequential cummax regardless of grouping -- unlike float prefix
    *sums*, whose tree rounding can dip by a ulp (the reason this kernel
    exists: monotonising resampling counts, see resampling._monotone_counts).
    """
    g = pl.program_id(gaxis)

    @pl.when(g == 0)
    def _():
        carry_ref[0, 0] = jnp.int32(0)

    x = x_ref[...]                                   # [R, 128]
    r = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    out = _cummax_body(x, r, row, lane, carry_ref[0, 0])
    out_ref[...] = out
    carry_ref[0, 0] = jnp.max(out)


def _counts_compute(u_ref, w, g, carryf_ref, carrym_ref, n: int, last_pos):
    """Shared fused systematic-counts computation: normalise (by the
    staged total), MXU prefix sum, ``clip(ceil(n*cdf - u), 0, n)``, the
    ``counts[-1] = n`` guard, and the exact int32 running-max monotoniser.
    Returns the monotonised [R, 128] block (callers write it and update
    ``carrym_ref``).

    Bit-identical to ``clip(ceil(n*cumsum(w/total) - u), 0, n)`` with
    ``cumsum = prefix_sum``: the divide, matmul prefix (same
    Precision.HIGHEST), ceil/clip and int cummax are the same operations
    in the same order.
    """
    @pl.when(g == 0)
    def _():
        carryf_ref[0, 0] = jnp.float32(0.0)
        carrym_ref[0, 0] = jnp.int32(0)

    # total and u ride LANE-REPLICATED in rows 0/1 of an [8, 128] VMEM
    # tile: a FULL (8, 128) tile, because a [B, 1, 128] batched operand
    # puts 7 padding sublanes in every element and per-block offsets then
    # land in padding (silent garbage -- the tiling pitfall that broke the
    # first on-chip vmap attempt).  NOT an SMEM scalar operand (the
    # batched grid cannot block-spec those).  Consumed as [1, 128] row
    # slices: broadcasting a [1, 1] slice against [R, 128] needs a
    # both-sublanes-and-lanes vector.broadcast that the Mosaic compiler
    # rejects ("Not implemented", reproduced on a v5e at every block
    # shape); a [1, 128] row only broadcasts along sublanes, the same
    # pattern the merge kernel's level-1 count runs on chip.
    total = u_ref[0:1, :]
    u = u_ref[1:2, :]
    x = w / total                                    # [R, 128]
    r = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    upper = (row <= col).astype(jnp.float32)
    p = jax.lax.dot(x, upper, precision=jax.lax.Precision.HIGHEST)
    rowtot = p[:, _LANE - 1:_LANE]
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    lower = (rr > cc).astype(jnp.float32)
    carry_rows = jax.lax.dot(lower, rowtot,
                             precision=jax.lax.Precision.HIGHEST)
    carry = carryf_ref[0, 0]
    cdf = p + carry_rows + carry
    carryf_ref[0, 0] = carry + carry_rows[r - 1, 0] + rowtot[r - 1, 0]

    nf = jnp.float32(n)
    c = jnp.clip(jnp.ceil(nf * cdf - u), 0.0, nf).astype(jnp.int32)
    # counts[-1] = n guard (position is trace-time static)
    gi, ri, li = last_pos
    is_last = (jax.lax.broadcasted_iota(jnp.int32, c.shape, 0) == ri) & (
        jax.lax.broadcasted_iota(jnp.int32, c.shape, 1) == li)
    c = jnp.where((g == gi) & is_last, jnp.int32(n), c)

    lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    return _cummax_body(c, r, rowi, lane, carrym_ref[0, 0])


def _counts_kernel(u_ref, w_ref, out_ref, carryf_ref, carrym_ref, *,
                   n: int, last_pos, gaxis: int = 0):
    """Fused systematic-counts pipeline (see :func:`_counts_compute`) --
    one HBM read of the weights and one write of the counts instead of
    the ~9 intermediate 4 MB round-trips of the op-by-op pipeline."""
    g = pl.program_id(gaxis)
    out = _counts_compute(u_ref, w_ref[...], g, carryf_ref, carrym_ref,
                          n, last_pos)
    out_ref[...] = out
    carrym_ref[0, 0] = jnp.max(out)


def _counts_cols_kernel(u_ref, w_ref, cols_ref, mx_ref, carryf_ref,
                        carrym_ref, *, n: int, last_pos, block: int):
    """Fused counts emitted DIRECTLY in the merge kernel's operand
    layouts: per merge-block the column-packed counts tile
    (``c_cols[b][s, m] = counts[block*b + 128*m + s]``, lanes >= n_chunks
    zero) and the sublane-major lane-replicated chunk maxima
    (``mx_cols``, padding rows INT32_MAX) -- exactly
    ``resample_kernel._merge_prepass``'s products, built while the counts
    block is still in VMEM.  Kills the flat [N] counts HBM round-trip
    plus the XLA transpose/pad/broadcast passes of the prepass (the
    in-kernel [nc, 128] transposes run here, OFF the merge kernel's
    critical path -- putting them INSIDE the merge kernel measured +0.05
    ms/step, CLAUDE.md round-4 negative results).
    """
    g = pl.program_id(0)
    out = _counts_compute(u_ref, w_ref[...], g, carryf_ref, carrym_ref,
                          n, last_pos)
    carrym_ref[0, 0] = jnp.max(out)
    r = out.shape[0]
    nc = block // _LANE
    s_rows = max(-(-nc // 8) * 8, 8)
    c_lanes = max(nc, _LANE)
    big = jnp.iinfo(jnp.int32).max
    for b in range((r * _LANE) // block):
        bl = out[b * nc:(b + 1) * nc, :]             # [nc, 128] row-major
        tr = jnp.transpose(bl)                       # [128, nc] col-packed
        if c_lanes > nc:
            tr = jnp.concatenate(
                [tr, jnp.zeros((_LANE, c_lanes - nc), jnp.int32)], axis=1)
        cols_ref[b] = tr
        mxt = jnp.broadcast_to(bl[:, _LANE - 1:_LANE], (nc, _LANE))
        if s_rows > nc:
            mxt = jnp.concatenate(
                [mxt, jnp.full((s_rows - nc, _LANE), big, jnp.int32)],
                axis=0)
        mx_ref[b] = mxt


def _counts_kernel_packed(u_ref, w_ref, out_ref, *, n: int, ri: int,
                          li: int, rows_per: int):
    """Batched fused counts with MANY chains packed into one grid step.

    The custom_vmap rule's (B, 1) sequential grid launches one tiny
    [rows_per, 128] block per chain -- at the reference PMMH shape
    (N=100, 256 vmapped chains) those 256 serial grid steps dominated
    the whole chain step (measured: 760 aggregate chain-iters/s vs 1615
    with plain XLA ops).  Here chains are stacked along rows
    (chain b = rows [b*rows_per, (b+1)*rows_per)) and the row-carry
    matmul / running-max masks are BLOCK-DIAGONAL in the chain, so one
    [R, 128] grid step serves R/rows_per chains with no cross-chain or
    cross-block carries.

    Bit-identical to the per-chain solo kernel (``_counts_kernel`` at
    g == 0): the lane-prefix matmul is per-row; the block-diagonal
    carry matmul adds the same nonzero terms plus exact zeros; the
    normalising divide moves to the caller (same IEEE op elementwise);
    the within-chain cummax runs the same Hillis-Steele shifts under
    chain-local masks.  ``u_ref`` carries each chain's uniform draw
    lane-replicated in its rows; ``(ri, li)`` is the chain-local
    (row, lane) of global element m-1.
    """
    x = w_ref[...]                                   # [R, 128] normalised
    r = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    upper = (row <= col).astype(jnp.float32)
    p = jax.lax.dot(x, upper, precision=jax.lax.Precision.HIGHEST)
    rowtot = p[:, _LANE - 1:_LANE]
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    lower = ((rr > cc) & (rr // rows_per == cc // rows_per)
             ).astype(jnp.float32)
    carry_rows = jax.lax.dot(lower, rowtot,
                             precision=jax.lax.Precision.HIGHEST)
    cdf = p + carry_rows

    nf = jnp.float32(n)
    c = jnp.clip(jnp.ceil(nf * cdf - u_ref[...]), 0.0, nf).astype(jnp.int32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    crow = rowi % rows_per                           # chain-local row
    is_last = (crow == ri) & (lane == li)
    c = jnp.where(is_last, jnp.int32(n), c)

    # within-chain running max (chain-local masks; no external carry --
    # 0 is the identity for nonnegative counts, as the solo g==0 block)
    m = c
    d = 1
    while d < _LANE:                                 # lane-direction
        m = jnp.maximum(m, jnp.where(lane >= d, pltpu.roll(m, d, 1), 0))
        d *= 2
    mm = m
    d = 1
    while d < rows_per:                              # chain-local rows
        mm = jnp.maximum(
            mm, jnp.where(crow >= d, pltpu.roll(mm, d, 0), 0))
        d *= 2
    e = jnp.where(crow >= 1, pltpu.roll(mm, 1, 0), 0)
    d = 1
    while d < _LANE:
        e = jnp.maximum(
            e, jnp.where(lane < _LANE - d, pltpu.roll(e, _LANE - d, 1), 0))
        d *= 2
    out_ref[...] = jnp.maximum(m, e)


def _counts_packed_call(kernel_n: int, last_pos, rows_per: int,
                        scal, x, interpret: bool):
    """Launch the packed batched counts kernel over [B, rows_per, 128].

    Normalises in XLA (bit-same IEEE divide the solo kernel does
    in-VMEM), replicates each chain's uniform draw over its rows, packs
    chains-per-superblock to keep grid steps near [256, 128], and pads
    the batch with dummy chains (w=1, u=0) that are sliced off.
    """
    b = x.shape[0]
    total = scal[:, 0:1, :]                          # [B, 1, 128]
    u = scal[:, 1:2, :]
    xn = x / total
    cpb = max(1, 256 // rows_per)                    # chains per superblock
    pad = (-b) % cpb
    if pad:
        xn = jnp.concatenate(
            [xn, jnp.ones((pad,) + xn.shape[1:], xn.dtype)])
        u = jnp.concatenate([u, jnp.zeros((pad,) + u.shape[1:], u.dtype)])
    bp = b + pad
    rows = bp * rows_per
    xr = xn.reshape(rows, _LANE)
    ur = jnp.broadcast_to(u, (bp, rows_per, _LANE)).reshape(rows, _LANE)
    sup = cpb * rows_per
    _, ri, li = last_pos
    out = pl.pallas_call(
        partial(_counts_kernel_packed, n=kernel_n, ri=ri, li=li,
                rows_per=rows_per),
        grid=(rows // sup,),
        in_specs=[pl.BlockSpec((sup, _LANE), lambda g: (g, 0)),
                  pl.BlockSpec((sup, _LANE), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((sup, _LANE), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.int32),
        interpret=interpret,
    )(ur, xr)
    return out.reshape(bp, rows_per, _LANE)[:b]


def _eff_block_rows(n: int, block_rows: int) -> int:
    """Clamp the row-block size to the (8-aligned) rows the input needs.

    The default 256-row tile pads an N=100 call (the PMMH reference
    shape, once per filter step per chain) to 32768 elements; covering
    the real rows in ONE sublane-aligned block is bit-identical (padding
    is the identity for sum/max) and ~30x less VPU/MXU work.
    """
    rows_needed = -(-n // _LANE)
    return min(block_rows, max(8, -(-rows_needed // 8) * 8))


def _pad_rows(v, block_rows: int, dtype):
    """Pad a 1-D array to a [rows, 128] tile multiple and reshape."""
    n = v.shape[0]
    tile = _LANE * block_rows
    n_pad = (-n) % tile
    if n_pad:
        v = jnp.concatenate([v, jnp.zeros((n_pad,), dtype)])
    return v.reshape(v.shape[0] // _LANE, _LANE)


def _row_specs(block_rows: int, batched: bool):
    """Block specs for [rows, 128] (or [B, rows, 128]) row-major operands.

    The batched grid is (B, n_blocks) with the batch axis OUTER, so the
    in-kernel ``program_id(1) == 0`` carry reset fires at the start of
    every batch row (grid iterates the last axis fastest)."""
    if batched:
        return pl.BlockSpec((None, block_rows, _LANE), lambda b, g: (b, g, 0))
    return pl.BlockSpec((block_rows, _LANE), lambda g: (g, 0))


def _scan_like_call(kernel, x, block_rows: int, out_dtype, scratch,
                    interpret: bool, extra_in=()):
    """Launch ``kernel`` over [B?, rows, 128] ``x`` on a carry-safe grid.

    ``extra_in`` holds (array, per-batch-block-shape) pairs staged before
    ``x`` (the counts kernel's scalar tile)."""
    batched = x.ndim == 3
    rows = x.shape[-2]
    grid = ((x.shape[0], rows // block_rows) if batched
            else (rows // block_rows,))
    in_specs = []
    args = []
    for arr, shape in extra_in:
        if batched:
            in_specs.append(pl.BlockSpec((None,) + shape,
                                         lambda b, g: (b, 0, 0)))
        else:
            in_specs.append(pl.BlockSpec(shape, lambda g: (0, 0)))
        args.append(arr)
    in_specs.append(_row_specs(block_rows, batched))
    args.append(x)
    return pl.pallas_call(
        partial(kernel, gaxis=1 if batched else 0),
        grid=grid,
        in_specs=in_specs,
        out_specs=_row_specs(block_rows, batched),
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


@lru_cache(maxsize=None)
def _prefix_core(block_rows: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def core(x):                                     # [rows, 128] f32
        return _scan_like_call(_scan_kernel, x, block_rows, jnp.float32,
                               [pltpu.SMEM((1, 1), jnp.float32)], interpret)

    @core.def_vmap
    def _rule(axis_size, in_batched, x):
        if not in_batched[0]:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        return _scan_like_call(_scan_kernel, x, block_rows, jnp.float32,
                               [pltpu.SMEM((1, 1), jnp.float32)],
                               interpret), True

    return core


@lru_cache(maxsize=None)
def _cummax_core(block_rows: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def core(x):                                     # [rows, 128] int32
        return _scan_like_call(_cummax_kernel, x, block_rows, jnp.int32,
                               [pltpu.SMEM((1, 1), jnp.int32)], interpret)

    @core.def_vmap
    def _rule(axis_size, in_batched, x):
        if not in_batched[0]:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        return _scan_like_call(_cummax_kernel, x, block_rows, jnp.int32,
                               [pltpu.SMEM((1, 1), jnp.int32)],
                               interpret), True

    return core


@lru_cache(maxsize=None)
def _counts_core(n: int, last_pos, block_rows: int, interpret: bool):
    kernel = partial(_counts_kernel, n=n, last_pos=last_pos)
    scratch = [pltpu.SMEM((1, 1), jnp.float32), pltpu.SMEM((1, 1), jnp.int32)]

    @jax.custom_batching.custom_vmap
    def core(scal, x):                               # [8, 128], [rows, 128]
        return _scan_like_call(kernel, x, block_rows, jnp.int32, scratch,
                               interpret, extra_in=[(scal, (8, _LANE))])

    @core.def_vmap
    def _rule(axis_size, in_batched, scal, x):
        if not in_batched[0]:
            scal = jnp.broadcast_to(scal[None], (axis_size,) + scal.shape)
        if not in_batched[1]:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        rows_per = x.shape[-2]
        if rows_per == block_rows and 128 % rows_per == 0 and not interpret:
            # single-block chains (the reference PMMH shape): pack many
            # chains into each grid step instead of a (B, 1) sequential
            # grid whose per-chain launches dominate (measured 2x on
            # pmmh_chains; see _counts_kernel_packed).  128 % rows_per == 0
            # keeps every chain inside one 128-wide MXU contraction pass,
            # which is what makes the block-diagonal carry matmul
            # bit-equal to the solo kernel's (sequential systolic
            # accumulation + exact zero terms); interpret mode's CPU dot
            # groups f32 sums differently (observed ulp cdf flips), so
            # CPU testing keeps the sequential grid and the packed path
            # is bit-gated on chip (tests_tpu).
            return _counts_packed_call(n, last_pos, rows_per, scal, x,
                                       interpret), True
        return _scan_like_call(kernel, x, block_rows, jnp.int32, scratch,
                               interpret,
                               extra_in=[(scal, (8, _LANE))]), True

    return core


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def cummax_int32(c, block_rows: int = 256, interpret: bool = False):
    """Exact inclusive running max of a 1-D nonnegative int32 array.

    vmap-safe (one level): batched calls run a (batch, blocks) grid with
    per-row carry resets."""
    n = c.shape[0]
    block_rows = _eff_block_rows(n, block_rows)
    x = _pad_rows(c.astype(jnp.int32), block_rows, jnp.int32)
    out = _cummax_core(block_rows, interpret)(x)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("n_out", "block_rows", "interpret"))
def systematic_counts_fused(w, total, u, n_out: int | None = None,
                            block_rows: int = 256,
                            interpret: bool = False):
    """Monotone systematic-resampling counts in ONE Pallas pass.

    ``counts = cummax(clip(ceil(n_out*cumsum(w/total) - u), 0, n_out))``
    with ``counts[-1] = n_out``, bit-identical to the op-by-op composition
    over :func:`prefix_sum` (see ``inference.resampling.systematic_counts``,
    whose TPU path calls this).  ``total`` must be ``jnp.sum(w)``
    computed by the caller (the one remaining XLA pass); ``u`` the scalar
    uniform draw; ``n_out`` the output particle count (defaults to
    ``len(w)``).  vmap-safe (one level): ``pmmh_chains`` vmaps the whole
    filter over chains.
    """
    m = w.shape[0]
    n_out = m if n_out is None else n_out
    block_rows = _eff_block_rows(m, block_rows)
    x = _pad_rows(w.astype(jnp.float32), block_rows, jnp.float32)
    # trace-time static position of global element m-1
    tile = _LANE * block_rows
    last_pos = ((m - 1) // tile, ((m - 1) % tile) // _LANE, (m - 1) % _LANE)
    # rows 0/1 lane-replicated (the kernel consumes [1, 128] row slices;
    # see the broadcast note in _counts_kernel)
    scal = jnp.zeros((8, _LANE), jnp.float32)
    scal = scal.at[0, :].set(jnp.asarray(total, jnp.float32))
    scal = scal.at[1, :].set(jnp.asarray(u, jnp.float32))
    out = _counts_core(n_out, last_pos, block_rows, interpret)(scal, x)
    return out.reshape(-1)[:m]


def _cols_layout_xla(counts, n: int, block: int):
    """XLA construction of the merge kernel's count operands from flat
    counts -- the exact ops of ``resample_kernel._merge_prepass`` (c_cols
    transpose/pad, INT32_MAX-padded lane-replicated maxima), kept as the
    CPU fallback and the bit-compare reference for the cols kernel."""
    n_blocks = n // block
    n_chunks = block // _LANE
    c_cols = counts.reshape(n_blocks, n_chunks, _LANE).transpose(0, 2, 1)
    pad = _LANE - n_chunks
    if pad > 0:
        c_cols = jnp.pad(c_cols, ((0, 0), (0, 0), (0, pad)))
    s_rows = max(-(-n_chunks // 8) * 8, 8)
    mx = c_cols[:, _LANE - 1, :n_chunks]
    big = jnp.iinfo(jnp.int32).max
    if s_rows > n_chunks:
        mx_pad = jnp.concatenate(
            [mx, jnp.full((n_blocks, s_rows - n_chunks), big, jnp.int32)],
            axis=1)
    else:
        mx_pad = mx
    mx_cols = jnp.broadcast_to(mx_pad[:, :, None],
                               (n_blocks, s_rows, _LANE))
    return c_cols, mx_cols


@partial(jax.jit, static_argnames=("block", "n_out", "block_rows",
                                   "interpret"))
def systematic_counts_cols(w, total, u, block: int,
                           n_out: int | None = None,
                           block_rows: int = 256,
                           interpret: bool = False):
    """Monotone systematic counts emitted directly as the merge kernel's
    operands ``(c_cols [n_blocks, 128, C], mx_cols [n_blocks, S, 128])``.

    One Pallas pass from the weights: the flat [N] counts array is never
    materialised in HBM, and the prepass's XLA transpose / pad / maxima
    broadcast (a ~5x-padded write at block=4096) disappear -- the counts
    values and both layouts are BIT-IDENTICAL to
    ``_cols_layout_xla(systematic_counts_fused(w, total, u))`` (gated in
    tests and on chip).  Non-TPU backends take that op-by-op fallback.
    Feed to ``sorted_gather_resample[_propagate]_t(counts_cols=...)``.
    NOT vmap-safe (the fused merge path is never vmapped; chain batching
    rides the sweep kernel).
    """
    m = w.shape[0]
    n_out = m if n_out is None else n_out
    if m % block:
        raise ValueError(f"N={m} must be divisible by block={block}")
    if jax.default_backend() != "tpu" and not interpret:
        counts = systematic_counts_fused(w, total, u, n_out=n_out,
                                         interpret=interpret)
        return _cols_layout_xla(counts, m, block)
    nc = block // _LANE
    rows_total = m // _LANE
    r = min(block_rows, rows_total)
    r = max(nc, r - r % nc)
    tile = _LANE * r
    x = _pad_rows(w.astype(jnp.float32), r, jnp.float32)
    last_pos = ((m - 1) // tile, ((m - 1) % tile) // _LANE, (m - 1) % _LANE)
    scal = jnp.zeros((8, _LANE), jnp.float32)
    scal = scal.at[0, :].set(jnp.asarray(total, jnp.float32))
    scal = scal.at[1, :].set(jnp.asarray(u, jnp.float32))
    rows_pad = x.shape[0]
    nb_total = (rows_pad * _LANE) // block
    nb_per = tile // block
    s_rows = max(-(-nc // 8) * 8, 8)
    c_lanes = max(nc, _LANE)
    cols, mx = pl.pallas_call(
        partial(_counts_cols_kernel, n=n_out, last_pos=last_pos,
                block=block),
        grid=(rows_pad // r,),
        in_specs=[pl.BlockSpec((8, _LANE), lambda g: (0, 0)),
                  pl.BlockSpec((r, _LANE), lambda g: (g, 0))],
        out_specs=[pl.BlockSpec((nb_per, _LANE, c_lanes),
                                lambda g: (g, 0, 0)),
                   pl.BlockSpec((nb_per, s_rows, _LANE),
                                lambda g: (g, 0, 0))],
        out_shape=(jax.ShapeDtypeStruct((nb_total, _LANE, c_lanes),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((nb_total, s_rows, _LANE),
                                        jnp.int32)),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(scal, x)
    n_blocks = m // block
    return cols[:n_blocks], mx[:n_blocks]


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def prefix_sum(w, block_rows: int = 256, interpret: bool = False):
    """Inclusive prefix sum of a 1-D f32 array on the MXU.

    Pads internally to a multiple of ``128 * block_rows``; returns the
    first N entries.  Summation order is blockwise left-to-right (differs
    from ``associative_scan``'s tree order by f32 rounding only, which is
    why every resampling path must use the SAME implementation -- see
    ``resampling._cumsum``).  vmap-safe (one level).
    """
    n = w.shape[0]
    block_rows = _eff_block_rows(n, block_rows)
    x = _pad_rows(w.astype(jnp.float32), block_rows, jnp.float32)
    out = _prefix_core(block_rows, interpret)(x)
    return out.reshape(-1)[:n]
