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

No reference analog (the reference's cumulative sums are scalar folds,
Resampling.scala:113-122); this is TPU-native infrastructure for
:mod:`..inference.resampling`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _scan_kernel(x_ref, out_ref, carry_ref):
    g = pl.program_id(0)

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


def _cummax_kernel(x_ref, out_ref, carry_ref):
    """Inclusive running max of nonnegative int32 (flattened row-major).

    int32 max is exact and idempotent, so Hillis-Steele log-shifts give the
    true sequential cummax regardless of grouping -- unlike float prefix
    *sums*, whose tree rounding can dip by a ulp (the reason this kernel
    exists: monotonising resampling counts, see resampling._monotone_counts).
    """
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[0, 0] = jnp.int32(0)

    x = x_ref[...]                                   # [R, 128]
    r = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)

    # all shifts are full-width rotate+mask (0 is the max-identity for
    # nonnegative counts): [R, 1] column vectors hit unsupported Mosaic
    # concat layouts, full [R, 128] rolls don't
    d = 1
    while d < _LANE:                                 # lane-direction cummax
        x = jnp.maximum(x, jnp.where(lane >= d, pltpu.roll(x, d, 1), 0))
        d *= 2
    m = x
    d = 1
    while d < r:                                     # per-column row cummax
        m = jnp.maximum(m, jnp.where(row >= d, pltpu.roll(m, d, 0), 0))
        d *= 2
    # exclusive row carry: previous row's running max sits in lane 127;
    # suffix-max along lanes (rows are lane-nondecreasing) spreads it
    e = jnp.where(row >= 1, pltpu.roll(m, 1, 0), 0)
    d = 1
    while d < _LANE:
        e = jnp.maximum(
            e, jnp.where(lane < _LANE - d, pltpu.roll(e, _LANE - d, 1), 0))
        d *= 2
    carry = carry_ref[0, 0]
    out = jnp.maximum(x, jnp.maximum(e, carry))
    out_ref[...] = out
    carry_ref[0, 0] = jnp.max(out)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def cummax_int32(c, block_rows: int = 256, interpret: bool = False):
    """Exact inclusive running max of a 1-D nonnegative int32 array."""
    n = c.shape[0]
    c = c.astype(jnp.int32)
    tile = _LANE * block_rows
    n_pad = (-n) % tile
    if n_pad:
        c = jnp.concatenate([c, jnp.zeros((n_pad,), jnp.int32)])
    rows = c.shape[0] // _LANE
    x = c.reshape(rows, _LANE)

    out = pl.pallas_call(
        _cummax_kernel,
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, _LANE), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((block_rows, _LANE), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(x)
    return out.reshape(rows * _LANE)[:n]


def _counts_kernel(u_ref, w_ref, out_ref, carryf_ref, carrym_ref, *,
                   n: int, last_pos):
    """Fused systematic-counts pipeline: normalise (by the prefetched
    total), MXU prefix sum, ``clip(ceil(n*cdf - u), 0, n)``, the
    ``counts[-1] = n`` guard, and the exact int32 running-max monotoniser
    -- one HBM read of the weights and one write of the counts instead of
    the ~9 intermediate 4 MB round-trips of the op-by-op pipeline.

    Bit-identical to ``clip(ceil(n*cumsum(w/total) - u), 0, n)`` with
    ``cumsum = prefix_sum``: the divide, matmul prefix (same
    Precision.HIGHEST), ceil/clip and int cummax are the same operations
    in the same order.
    """
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carryf_ref[0, 0] = jnp.float32(0.0)
        carrym_ref[0, 0] = jnp.int32(0)

    total = u_ref[0]
    u = u_ref[1]
    x = w_ref[...] / total                           # [R, 128]
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

    # exact int32 running max (same log-shift scheme as _cummax_kernel)
    lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    m = c
    d = 1
    while d < _LANE:
        m = jnp.maximum(m, jnp.where(lane >= d, pltpu.roll(m, d, 1), 0))
        d *= 2
    mm = m
    d = 1
    while d < r:
        mm = jnp.maximum(mm, jnp.where(rowi >= d, pltpu.roll(mm, d, 0), 0))
        d *= 2
    e = jnp.where(rowi >= 1, pltpu.roll(mm, 1, 0), 0)
    d = 1
    while d < _LANE:
        e = jnp.maximum(
            e, jnp.where(lane < _LANE - d, pltpu.roll(e, _LANE - d, 1), 0))
        d *= 2
    carrym = carrym_ref[0, 0]
    out = jnp.maximum(m, jnp.maximum(e, carrym))
    out_ref[...] = out
    carrym_ref[0, 0] = jnp.max(out)


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
    ``len(w)``).
    """
    m = w.shape[0]
    n_out = m if n_out is None else n_out
    w = w.astype(jnp.float32)
    tile = _LANE * block_rows
    n_pad = (-m) % tile
    if n_pad:
        w = jnp.concatenate([w, jnp.zeros((n_pad,), jnp.float32)])
    rows = w.shape[0] // _LANE
    x = w.reshape(rows, _LANE)
    grid = rows // block_rows
    # trace-time static position of global element m-1
    gi = (m - 1) // tile
    ri = ((m - 1) % tile) // _LANE
    li = (m - 1) % _LANE
    scal = jnp.stack([jnp.asarray(total, jnp.float32),
                      jnp.asarray(u, jnp.float32)])

    kernel = partial(_counts_kernel, n=n_out, last_pos=(gi, ri, li))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((block_rows, _LANE), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((block_rows, _LANE), lambda g: (g, 0)),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.int32),
        interpret=interpret,
    )(scal, x)
    return out.reshape(rows * _LANE)[:m]


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def prefix_sum(w, block_rows: int = 256, interpret: bool = False):
    """Inclusive prefix sum of a 1-D f32 array on the MXU.

    Pads internally to a multiple of ``128 * block_rows``; returns the
    first N entries.  Summation order is blockwise left-to-right (differs
    from ``associative_scan``'s tree order by f32 rounding only, which is
    why every resampling path must use the SAME implementation -- see
    ``resampling._cumsum``).
    """
    n = w.shape[0]
    w = w.astype(jnp.float32)
    tile = _LANE * block_rows
    n_pad = (-n) % tile
    if n_pad:
        w = jnp.concatenate([w, jnp.zeros((n_pad,), jnp.float32)])
    rows = w.shape[0] // _LANE
    x = w.reshape(rows, _LANE)

    out = pl.pallas_call(
        _scan_kernel,
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, _LANE), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((block_rows, _LANE), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(x)
    return out.reshape(rows * _LANE)[:n]
