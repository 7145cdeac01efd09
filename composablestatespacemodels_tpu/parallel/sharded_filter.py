"""Particle-sharded bootstrap filter over a TPU mesh (``shard_map`` + ICI).

Per time step the only global synchronisation is:

* ``pmax`` of the local weight maxima and ``psum`` of the weight sums
  (the log-sum-exp update and ESS -- a handful of scalars over ICI);
* at resample steps, an ``all_gather`` of the shifted weights (N floats)
  plus an ``all_gather`` of the particle block ([N, d] -- rides the ICI
  ring), after which every shard gathers exactly its own output slice of the
  globally systematic sample.

The global resampling positions use a *shared* uniform (same key on every
shard), so the resampled system is identical to the single-device filter
given the same global weight vector -- shard-count only changes which device
holds which slice (and the propagation RNG streams, which are folded per
shard).

Design per SURVEY.md section 2.3 / 5.8; there is no reference equivalent
(the reference is a single-JVM library).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.model import Model
from ..models.tree import Tree
from ..utils.data import TimeSeries
from .mesh import PARTICLE_AXIS


def _sharded_scan(model: Model, params: Tree, data: TimeSeries,
                  local_n: int, key, axis: str):
    """Filter body executed on each particle shard (inside shard_map)."""
    idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    n_total = local_n * n_shards

    k_init, k_scan = jax.random.split(key)
    particles = model.initial_state(
        params, jax.random.fold_in(k_init, idx), (local_n,))
    dtype = particles.dtype

    def step(carry, inp):
        x, t_prev, ll = carry
        t, y, mask, k = inp
        k_prop = jax.random.fold_in(k, idx)
        k_sys, _ = jax.random.split(k)  # shared across shards

        x1 = model.step(params, k_prop, x, t - t_prev)

        y_safe = jnp.where(mask, y, 0.0)
        gamma = model.f(x1, t)
        logw = model.log_density(params, gamma, y_safe)
        logw = jnp.where(mask, logw, 0.0)

        maxw = jax.lax.pmax(jnp.max(logw), axis)
        w = jnp.exp(logw - maxw)
        total = jax.lax.psum(jnp.sum(w), axis)
        ll_inc = jnp.where(mask,
                           maxw + jnp.log(total) - jnp.log(float(n_total)),
                           0.0)
        sumsq = jax.lax.psum(jnp.sum((w / total) ** 2), axis)
        ess = jnp.floor(1.0 / sumsq).astype(jnp.int32)

        def do_resample(x1w):
            from ..inference.resampling import _ancestors_from_counts

            x1_, w_ = x1w
            # global systematic resampling: gather weights + particles,
            # each shard takes its own slice of the global sample
            w_all = jax.lax.all_gather(w_, axis, tiled=True)      # [N]
            x_all = jax.lax.all_gather(x1_, axis, tiled=True)     # [N, d]
            cdf = jax.lax.associative_scan(jnp.add, w_all / total)
            u = jax.random.uniform(k_sys, (), dtype)  # shared key -> same u
            counts = jnp.clip(jnp.ceil(n_total * cdf - u), 0,
                              n_total).astype(jnp.int32)
            counts = counts.at[-1].set(n_total)
            anc = _ancestors_from_counts(counts, n_total)
            local = jax.lax.dynamic_slice_in_dim(anc, idx * local_n, local_n)
            return x_all[local]

        x2 = jax.lax.cond(mask, do_resample, lambda a: a[0], (x1, w))
        ll1 = ll + ll_inc
        return (x2, t, ll1), (ll1, ess)

    keys = jax.random.split(k_scan, data.ts.shape[0])
    init = (particles, data.ts[0], jnp.asarray(0.0, dtype))
    (xf, _, ll), (ll_hist, ess_hist) = jax.lax.scan(
        step, init, (data.ts, data.ys, data.mask, keys))
    return ll, ll_hist, ess_hist, xf


@partial(jax.jit, static_argnames=("model", "n_particles", "mesh", "axis"))
def _sharded_ll_impl(model, params, data, n_particles, key, mesh, axis):
    n_shards = mesh.shape[axis]
    if n_particles % n_shards:
        raise ValueError(
            f"n_particles={n_particles} not divisible by {n_shards} shards")
    local_n = n_particles // n_shards

    # replicate inputs; the body manages its own shard-local state
    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    fn = shard_map(
        lambda p, d, k: _sharded_scan(model, p, d, local_n, k, axis),
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P(), P(axis)),
        check_vma=False,
    )
    return fn(params, data, key)


def sharded_log_likelihood(model: Model, params: Tree, data: TimeSeries,
                           n_particles: int, key,
                           mesh: Mesh, axis: str = PARTICLE_AXIS):
    """PF log marginal likelihood with the particle axis sharded over
    ``mesh[axis]``.  Returns ``(ll, ll_history, ess_history,
    final_particles)`` with final particles sharded on their global axis."""
    model.validate_params(params)
    ll, ll_hist, ess_hist, xf = _sharded_ll_impl(
        model, params, data, n_particles, key, mesh, axis)
    return ll, ll_hist, ess_hist, xf
