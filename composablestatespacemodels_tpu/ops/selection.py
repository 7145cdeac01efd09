"""Exact order statistics without sorting: bit-bisection selection.

Selecting a handful of order statistics (credible-interval bounds) from a
large particle cloud via ``jnp.sort`` costs a full [d, N] sort per filter
step -- at N=2^20 that dwarfs the ~2 ms step itself.  Selection by
bisection over the 32-bit sortable integer encoding of float32 needs only
32 rounds of counting compares (each one fused read of the data), returns
values bit-identical to ``sort(column)[k]``, and -- because each round
reduces to a few counters -- works unchanged on a sharded cloud where each
round's counts are combined with one ``psum`` (no gather, no sort).

No reference analog (the reference sorts per step,
ParticleFilter.scala:415-424, 488-502); TPU-native infrastructure shared
by the single-device transposed filter and the sharded filter's summary
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kth_smallest_bits(vals, ks, psum=None):
    """Exact k-th smallest of each row of a float32 array, per column.

    Args:
      vals: [c, n] float32 rows (on a shard: the local slice of each row).
      ks: [c, q] int32 0-indexed order statistics wanted per row.
      psum: optional reduction combining per-shard counts (e.g.
        ``lambda x: jax.lax.psum(x, axis)`` inside ``shard_map``); the
        ``ks`` are then interpreted against the GLOBAL rows.

    Returns [c, q] values bit-identical to ``sort(global_row)[k]``.

    Bisection over the order-preserving uint32 encoding of float32 (sign
    flip for negatives): each of the 32 rounds counts entries strictly
    below a candidate prefix, so the whole selection is 32 fused
    compare-reduces (and 32 small collectives when sharded).
    """
    if vals.dtype != jnp.float32:
        raise TypeError(f"kth_smallest_bits needs float32, got {vals.dtype}")
    b = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    sign = jnp.uint32(0x80000000)
    keys = jnp.where((b & sign) != 0, ~b, b | sign)  # order-preserving

    def body(i, lo):
        cand = lo | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum((keys[:, None, :] < cand[:, :, None])
                      .astype(jnp.int32), axis=-1)               # [c, q]
        if psum is not None:
            cnt = psum(cnt)
        return jnp.where(cnt <= ks, cand, lo)

    lo = jax.lax.fori_loop(0, 32, body, jnp.zeros(ks.shape, jnp.uint32))
    back = jnp.where((lo & sign) != 0, lo ^ sign, ~lo)
    return jax.lax.bitcast_convert_type(back, jnp.float32)


def weighted_quantile_bits(vals, wn, ps, psum=None):
    """Weighted quantiles of each row of a float32 array, per column.

    Returns, per (row c, target q), the smallest value ``x`` in the row
    with weighted CDF ``sum(wn * (row <= x)) >= ps[c, q]`` -- the weighted
    generalisation of :func:`kth_smallest_bits` (which it reduces to for
    uniform weights up to the float rounding of the mass sums).  Needed by
    the ``ess_threshold`` summary path, where skipped resamples leave the
    carried weights non-uniform and unweighted order statistics would be
    biased (reference always resamples, ParticleFilter.scala:126; the
    unweighted flavours mirror :488-511).

    Args:
      vals: [c, n] float32 rows (on a shard: the local slice of each row).
      wn: [n] nonnegative weights (globally normalised when sharded).
      ps: [c, q] float32 target CDF levels in (0, 1].
      psum: optional reduction combining per-shard masses.

    Same 32-round bisection over the order-preserving uint32 encoding;
    each round sums the weight mass strictly below the candidate prefix.
    The targets are normalised internally (compared against
    ``ps * sum(wn)``), so slightly-unnormalised carried weights are fine
    and ``p = 1.0`` lands exactly on the largest positive-weight value:
    the bisection returns the largest key whose strictly-below mass is
    ``< p * total``, and since ``p * total <= total`` in float32 (round-
    to-nearest of a product with ``p <= 1``) and the per-round masked sum
    is monotone in the candidate, that key always exists -- no overshoot
    past the data even when the top element carries zero weight.  Exact
    up to the rounding of the float32 mass sums.
    """
    if vals.dtype != jnp.float32:
        raise TypeError(
            f"weighted_quantile_bits needs float32, got {vals.dtype}")
    b = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    sign = jnp.uint32(0x80000000)
    keys = jnp.where((b & sign) != 0, ~b, b | sign)  # order-preserving
    w = wn.astype(jnp.float32)
    total = jnp.sum(w)
    if psum is not None:
        total = psum(total)
    th = jnp.minimum(ps, 1.0) * total

    def body(i, lo):
        cand = lo | (jnp.uint32(1) << (31 - i))
        mass = jnp.sum(jnp.where(keys[:, None, :] < cand[:, :, None],
                                 w[None, None, :], 0.0), axis=-1)  # [c, q]
        if psum is not None:
            mass = psum(mass)
        # target key >= cand iff the mass strictly below cand is < p
        return jnp.where(mass < th, cand, lo)

    lo = jax.lax.fori_loop(0, 32, body, jnp.zeros(ps.shape, jnp.uint32))
    back = jnp.where((lo & sign) != 0, lo ^ sign, ~lo)
    return jax.lax.bitcast_convert_type(back, jnp.float32)
