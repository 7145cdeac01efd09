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


def _lookup(cdf, positions):
    """First index whose cdf >= position (the TreeMap ``.from`` lookup,
    Resampling.scala:36-58)."""
    n = cdf.shape[0]
    idx = jnp.searchsorted(cdf, positions, side="left")
    return jnp.clip(idx, 0, n - 1)


def systematic_indices(key, weights, n: int | None = None):
    """Systematic resampling: one uniform, n evenly spaced positions.

    Reference: Resampling.scala:63-72.
    """
    m = weights.shape[0]
    n = m if n is None else n
    cdf = jnp.cumsum(_normalise(weights))
    u = jax.random.uniform(key, (), weights.dtype)
    positions = (u + jnp.arange(n, dtype=weights.dtype)) / n
    return _lookup(cdf, positions)


def stratified_indices(key, weights, n: int | None = None):
    """Stratified resampling: one uniform per stratum.

    Reference: Resampling.scala:78-86.
    """
    m = weights.shape[0]
    n = m if n is None else n
    cdf = jnp.cumsum(_normalise(weights))
    u = jax.random.uniform(key, (n,), weights.dtype)
    positions = (jnp.arange(n, dtype=weights.dtype) + u) / n
    return _lookup(cdf, positions)


def multinomial_indices(key, weights, n: int | None = None):
    """Multinomial resampling: n iid draws from the weight distribution.

    Reference: Resampling.scala:92-96.
    """
    m = weights.shape[0]
    n = m if n is None else n
    cdf = jnp.cumsum(_normalise(weights))
    positions = jax.random.uniform(key, (n,), weights.dtype)
    return _lookup(cdf, positions)


def residual_indices(key, weights, n: int | None = None):
    """Residual resampling with fixed shapes.

    Deterministically copy particle i ``floor(n * w_i)`` times, then fill the
    remaining slots multinomially from the residual weights
    (Resampling.scala:130-146).  The dynamic deterministic count K becomes a
    fixed-shape ``repeat(..., total_repeat_length=n)`` plus a positional mask:
    slots < K take deterministic copies, slots >= K take multinomial draws.
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
    cdf = jnp.cumsum(_normalise(safe))
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
