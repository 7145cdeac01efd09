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

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _merge_kernel(first_ref, last_ref, base_ref,
                  c0_blk, x0_blk, c1_blk, x1_blk, c_hbm, xt_hbm, out_ref,
                  cblk, xblk, sem_c, sem_x):
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
    """
    g = pl.program_id(0)
    d, block = out_ref.shape
    n_chunks = block // _LANE

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    q0 = g * block
    q_row = q0 + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)  # [1, B]

    def serve(c_at, x_at, prev_cmax):
        cmax = c_at[_LANE - 1, n_chunks - 1]

        # block-local ancestor = #entries <= q, two-level (counts are sorted
        # within and across the packed columns):
        #   level 1 -- boundary chunk h = #chunk-maxima <= q, from n_chunks
        #   scalar VMEM loads broadcast against the lane-oriented q row
        #   (chunk m's max is its last sublane, row 127 of column m);
        #   level 2 -- gather chunk h's 128-entry column per slot and count
        #   entries <= q inside it.  Chunks below h contribute all 128
        #   entries, chunks above h none, so hi == h and lo == inner count
        #   directly (chunk h's max is > q, hence inner <= 127).  This does
        #   ONE [128, B] compare instead of n_chunks of them.
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

    # common case: two auto-pipelined input blocks (no in-kernel DMA);
    # the second serve writes nothing when the span is one block
    prev = serve(c0_blk[0], x0_blk, base_ref[g])
    prev = serve(c1_blk[0], x1_blk, prev)

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

    jax.lax.fori_loop(first_ref[g] + 2, last_ref[g] + 1, body, prev)


@partial(jax.jit, static_argnames=("block", "interpret"))
def sorted_gather_resample_t(x_t, counts, block: int = 1024,
                             interpret: bool = False):
    """Transposed-layout core: ``y_t[:, j] = x_t[:, anc_j]``.

    Args:
      x_t: [d, N] particle columns (N divisible by ``block``).
      counts: [N] nondecreasing int32 cumulative position counts with
        ``counts[-1] == N``.
      block: tile size (multiple of 128; block/128 <= 128).
      interpret: run in Pallas interpreter mode (CPU testing).
    """
    d, n = x_t.shape
    if n % block or block % _LANE or block // _LANE > _LANE:
        raise ValueError(
            f"N={n} must be divisible by block={block}, block a multiple "
            f"of {_LANE} with at most {_LANE} chunks")
    n_blocks = n // block
    n_chunks = block // _LANE
    counts = counts.astype(jnp.int32)

    # XLA prepass: input-block range + entering count per output block.
    # first_g = #blocks whose max count <= g*block (== anc_{gB} // block):
    # a dense [n_blocks, n_blocks] compare over block maxima beats a 20-round
    # binary search over the full counts array.
    edges = jnp.arange(n_blocks, dtype=jnp.int32) * block
    blockmax = counts.reshape(n_blocks, block)[:, -1]
    first = jnp.sum((blockmax[None, :] <= edges[:, None]).astype(jnp.int32),
                    axis=1)
    last = jnp.sum(
        (blockmax[None, :] <= edges[:, None] + (block - 1)).astype(jnp.int32),
        axis=1)
    first = jnp.clip(first, 0, n_blocks - 1).astype(jnp.int32)
    last = jnp.clip(last, 0, n_blocks - 1).astype(jnp.int32)
    base = jnp.where(first > 0, blockmax[jnp.maximum(first - 1, 0)],
                     0).astype(jnp.int32)

    # column-packed counts: block j, column m = entries [128m, 128(m+1));
    # lanes padded to >= 128 so the per-block DMA tile stays aligned
    c_cols = counts.reshape(n_blocks, n_chunks, _LANE).transpose(0, 2, 1)
    pad = _LANE - n_chunks
    if pad > 0:
        c_cols = jnp.pad(c_cols, ((0, 0), (0, 0), (0, pad)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            # auto-pipelined first two input blocks per output block: index
            # maps read the prefetched `first` array
            pl.BlockSpec((1, _LANE, max(n_chunks, _LANE)),
                         lambda g, first, last, base: (first[g], 0, 0)),
            pl.BlockSpec((d, block),
                         lambda g, first, last, base: (0, first[g])),
            pl.BlockSpec(
                (1, _LANE, max(n_chunks, _LANE)),
                lambda g, first, last, base:
                    (jnp.minimum(first[g] + 1, first.shape[0] - 1), 0, 0)),
            pl.BlockSpec(
                (d, block),
                lambda g, first, last, base:
                    (0, jnp.minimum(first[g] + 1, first.shape[0] - 1))),
            # raw refs for the rare manual path
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (d, block), lambda g, first, last, base: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((_LANE, max(n_chunks, _LANE)), jnp.int32),
            pltpu.VMEM((d, block), x_t.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        _merge_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n), x_t.dtype),
        interpret=interpret,
    )(first, last, base, c_cols, x_t, c_cols, x_t, c_cols, x_t)


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
