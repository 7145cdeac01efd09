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
  of counts + particle columns into VMEM once, selecting the slots whose
  ancestors live in that block with a [B, B] compare + row-count (VPU), and
  accumulating the row duplication as a one-hot [d, B] x [B, B] matmul
  (MXU) into the output block;
* total input traffic is <= one read of x + counts plus one block per
  output-block boundary (amortised 2x), all sequential; weight degeneracy
  (one particle owning every slot) just re-reads a single input block.

Particles are processed in **transposed [d, N] layout**: the particle axis
rides the 128-wide lane dimension, so block windows are lane-aligned DMA
slices (a [N, d] layout with d < 128 cannot be block-sliced under TPU
tiling).  The wrapper transposes at the boundary.

Equivalent by construction to
``x[inference.resampling._ancestors_from_counts(counts, N)]``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_kernel(first_ref, last_ref, base_ref,
                  c_hbm, xt_hbm, out_ref,
                  cblk, xblk, sem_c, sem_x):
    """Grid: (n_out_blocks,).

    Scalar-prefetch: first/last input-block index and entering count per
    output block.  c_hbm [n_in, 1, B] int32 and xt_hbm [d, N] stay in
    HBM/ANY; out_ref is the g-th [d, B] output block in VMEM.

    Scratch: cblk [1, B] int32, xblk [d, B], two DMA semaphores.
    """
    g = pl.program_id(0)
    block = out_ref.shape[1]

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    q0 = g * block
    qs = q0 + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)  # [B, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    dtype = out_ref.dtype

    def body(j, prev_cmax):
        cp = pltpu.make_async_copy(c_hbm.at[j], cblk, sem_c)
        xp = pltpu.make_async_copy(
            xt_hbm.at[:, pl.ds(j * block, block)], xblk, sem_x)
        cp.start()
        xp.start()
        cp.wait()
        xp.wait()

        cmax = cblk[0, block - 1]
        # slots whose ancestor lies in input block j
        active = (qs >= prev_cmax) & (qs < cmax)                  # [B, 1]
        # block-local ancestor = #entries <= q
        anc = jnp.sum((cblk[...] <= qs).astype(jnp.int32), axis=1,
                      keepdims=True)                              # [B, 1]
        onehot = ((cols == anc) & active).astype(dtype)           # [B, B]
        # y_t[d, out] += x_t[d, in] . onehot[out, in]^T
        out_ref[...] += jax.lax.dot_general(
            xblk[...], onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype)
        return cmax

    jax.lax.fori_loop(first_ref[g], last_ref[g] + 1, body, base_ref[g])


@partial(jax.jit, static_argnames=("block", "interpret"))
def sorted_gather_resample_t(x_t, counts, block: int = 256,
                             interpret: bool = False):
    """Transposed-layout core: ``y_t[:, j] = x_t[:, anc_j]``.

    Args:
      x_t: [d, N] particle columns (N divisible by ``block``).
      counts: [N] nondecreasing int32 cumulative position counts with
        ``counts[-1] == N``.
      block: tile size (multiple of 128).
      interpret: run in Pallas interpreter mode (CPU testing).
    """
    d, n = x_t.shape
    if n % block:
        raise ValueError(f"N={n} must be divisible by block={block}")
    n_blocks = n // block
    counts = counts.astype(jnp.int32)

    # XLA prepass: input-block range + entering count per output block
    edges = jnp.arange(n_blocks, dtype=jnp.int32) * block
    anc_first = jnp.searchsorted(counts, edges, side="right")
    anc_last = jnp.searchsorted(counts, edges + (block - 1), side="right")
    first = jnp.clip(anc_first // block, 0, n_blocks - 1).astype(jnp.int32)
    last = jnp.clip(anc_last // block, 0, n_blocks - 1).astype(jnp.int32)
    base = jnp.where(first > 0, counts[jnp.maximum(first * block - 1, 0)],
                     0).astype(jnp.int32)

    c3 = counts.reshape(n_blocks, 1, block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((d, block), lambda g, *_: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((1, block), jnp.int32),
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
    )(first, last, base, c3, x_t)


def sorted_gather_resample(x, counts, block: int = 256,
                           interpret: bool = False):
    """``y[j] = x[first i with counts[i] > j]`` for nondecreasing ``counts``.

    [N, d] boundary wrapper around :func:`sorted_gather_resample_t`.
    Returns [N, d] resampled rows, identical to
    ``x[_ancestors_from_counts(counts, N)]``.
    """
    return sorted_gather_resample_t(x.T, counts, block=block,
                                    interpret=interpret).T


def systematic_counts(key, weights):
    """Closed-form cumulative position counts for systematic resampling."""
    n = weights.shape[0]
    wn = weights / jnp.sum(weights)
    cdf = jax.lax.associative_scan(jnp.add, wn)
    u = jax.random.uniform(key, (), weights.dtype)
    counts = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    return counts.at[-1].set(n)


def stratified_counts(key, weights):
    """Closed-form cumulative position counts for stratified resampling."""
    n = weights.shape[0]
    wn = weights / jnp.sum(weights)
    cdf = jax.lax.associative_scan(jnp.add, wn)
    u = jax.random.uniform(key, (n,), weights.dtype)
    v = n * cdf
    k = jnp.floor(v).astype(jnp.int32)
    k_safe = jnp.clip(k, 0, n - 1)
    extra = (u[k_safe] < (v - k)).astype(jnp.int32)
    counts = jnp.clip(jnp.where(k >= n, n, k + extra), 0, n)
    return counts.at[-1].set(n)


def systematic_resample_pallas(key, x, weights, block: int = 256,
                               interpret: bool = False):
    """Full systematic resampling step with the Pallas merge gather.

    Drop-in replacement for
    ``x[resampling.systematic_indices(key, weights)]`` when ``x`` is a
    2-D [N, d] float array with N divisible by ``block``.
    """
    return sorted_gather_resample(x, systematic_counts(key, weights),
                                  block=block, interpret=interpret)
