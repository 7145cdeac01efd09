"""Log-Gaussian Cox process filtering: fine-grid cumulative-hazard weights.

The reference ``FilterLgcp`` (ParticleFilter.scala:169-227) advances each
particle on a fine Euler grid between observation times, accumulating the
cumulative hazard integral sum(exp(f(x_k, t_k)) * h), and weights particles by

    log w = gamma(t) - integral lambda dt      (ParticleFilter.scala:217)

TPU design: the data-dependent number of fine steps ``ceil(dt * 10^p)``
(ParticleFilter.scala:190) is resolved on the host into ONE flat fine grid
over the whole series -- the union of every segment's Euler substeps, each
slot tagged with static flags (hazard-eval / advance-state / observation) --
and the filter is a single ``lax.scan`` over that grid (SURVEY.md section 7
hard part (d)), fully vectorised over the particle axis.

Cost is therefore O(sum of gaps / h), not O(T * max_gap / h): event-time
data has exponential inter-arrival gaps, and the previous per-observation
``max_substeps``-padded inner scan made every step pay for the largest gap
(one 10x outlier gap cost 10x on *every* observation).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import Model
from ..models.tree import Tree
from ..utils.data import TimeSeries
from . import resampling as rs


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LgcpResult:
    ll: jnp.ndarray              # scalar
    ll_history: jnp.ndarray      # [T]
    ess: jnp.ndarray             # [T]
    eta_mean: jnp.ndarray        # [T]  mean intensity exp(gamma)
    eta_lower: jnp.ndarray       # [T]
    eta_upper: jnp.ndarray       # [T]
    state_mean: jnp.ndarray      # [T, d]
    final_particles: jnp.ndarray

    def tree_flatten(self):
        return ((self.ll, self.ll_history, self.ess, self.eta_mean,
                 self.eta_lower, self.eta_upper, self.state_mean,
                 self.final_particles), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@partial(jax.jit, static_argnames=("model", "n_particles", "precision",
                                   "resample", "interval"))
def _lgcp_impl(model: Model, params: Tree, grid, n_particles: int, key,
               precision: int, resample: str, interval: float):
    """One flat scan over the union fine grid.

    ``grid`` is the host-built tuple
    ``(t_eval, hflag, aflag, oflag, t_obs, zflag, obs_idx)`` -- see
    :func:`lgcp_filter`.  Per slot: hazard eval (``hflag``) at the current
    state, one Euler-Maruyama advance of ``h`` (``aflag``), and at
    observation slots (``oflag``) the reference weight/resample step
    (log w = gamma - integral, ParticleFilter.scala:210-226) under a
    ``lax.cond`` so non-observation slots skip the resampling gather.
    """
    from .filter import credible_interval_eta

    t_eval, hflag, aflag, oflag, t_obs, zflag, obs_idx = grid
    if resample == "systematic-pallas":
        # large-N TPU path: closed-form counts + the merge-gather kernel
        # ([N, d] boundary wrapper) instead of the XLA scatter+cummax
        # ancestor fill (~7 ms at N=1e6); requires N divisible by 1024
        from ..ops.resample_kernel import (sorted_gather_resample,
                                          systematic_counts)

        def resample_gather(k, x, w):
            return sorted_gather_resample(x, systematic_counts(k, w))
    else:
        resample_fn = rs.get_scheme(resample)

        def resample_gather(k, x, w):
            return x[resample_fn(k, w)]
    h = 10.0 ** (-precision)
    sp = model.sde_params(params)

    k_init, k_scan = jax.random.split(key)
    particles = model.initial_state(params, k_init, (n_particles,))
    dtype = particles.dtype
    d = model.dim

    def body(carry, inp):
        x, hz, ll = carry
        t_ev, hf, af, of, t_ob, zf, k = inp
        k_em, k_res = jax.random.split(k)

        # hazard eval at the CURRENT state, then advance: the integral sums
        # n = ceil(dt/h) evaluations starting AT the previous posterior
        # state and the state advances n-1 fine steps (calcWeight,
        # ParticleFilter.scala:184-208)
        gamma_k = model.f(x, t_ev)
        hz1 = hz + jnp.where(hf, jnp.exp(gamma_k) * h, 0.0)
        x_adv = model.sde.step_euler_maruyama(sp, k_em, x, h)
        x1 = jnp.where(af, x_adv, x)

        def obs_case(args):
            x1, hz1, ll = args
            gamma = model.f(x1, t_ob)
            # dt == 0 observation: no integral, flat weights
            # (ParticleFilter.scala:212-214: gamma - hazard == 0)
            logw = jnp.where(zf, 0.0, gamma - hz1)          # :217
            maxw = jnp.max(logw)
            w = jnp.exp(logw - maxw)
            ll1 = ll + maxw + jnp.log(jnp.mean(w))
            wn = w / jnp.sum(w)
            ess = jnp.floor(1.0 / jnp.sum(wn * wn)).astype(jnp.int32)
            x2 = resample_gather(k_res, x1, w)
            eta = jnp.exp(gamma)
            e_lo, e_hi = credible_interval_eta(eta, interval)
            out = (ll1, ess, jnp.mean(eta), e_lo, e_hi,
                   jnp.mean(x2, axis=0))
            return (x2, jnp.zeros_like(hz1), ll1), out

        def no_obs(args):
            x1, hz1, ll = args
            z = jnp.asarray(0.0, dtype)
            out = (ll, jnp.asarray(0, jnp.int32), z, z, z,
                   jnp.zeros((d,), dtype))
            return (x1, hz1, ll), out

        return jax.lax.cond(of, obs_case, no_obs, (x1, hz1, ll))

    keys = jax.random.split(k_scan, t_eval.shape[0])
    init = (particles, jnp.zeros((n_particles,), dtype),
            jnp.asarray(0.0, dtype))
    (xf, _, ll), outs = jax.lax.scan(
        body, init, (t_eval, hflag, aflag, oflag, t_obs, zflag, keys))
    # per-observation histories: gather the observation slots
    ll_hist, ess, em, elo, ehi, sm = tuple(o[obs_idx] for o in outs)
    return LgcpResult(ll, ll_hist, ess, em, elo, ehi, sm, xf)


@partial(jax.jit, static_argnames=("model", "n_particles", "precision",
                                   "interval", "mesh", "axis"))
def _lgcp_sharded_impl(model: Model, params: Tree, grid, n_particles: int,
                       key, precision: int, interval: float, mesh, axis):
    """Particle-sharded flat-grid LGCP scan (``shard_map`` over ``axis``).

    Same per-slot semantics as :func:`_lgcp_impl`; the only cross-shard
    communication per observation slot is the scalar weight collectives
    (``pmax``/``psum`` log-sum-exp + ESS), the distributed systematic
    resampler's ring, and the 32-round bisection selection for the eta
    order statistics -- no shard ever materialises the global cloud
    (design: parallel/sharded_filter.py; reference semantics:
    ParticleFilter.scala:210-226).
    """
    import math as _math

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharded_filter import (_kth_smallest_sharded,
                                           distributed_systematic_resample)

    t_eval, hflag, aflag, oflag, t_obs, zflag, obs_idx = grid
    n_shards = mesh.shape[axis]
    if n_particles % n_shards:
        raise ValueError(
            f"n_particles={n_particles} not divisible by {n_shards} shards")
    local_n = n_particles // n_shards
    h = 10.0 ** (-precision)
    sp = model.sde_params(params)
    d = model.dim
    k_os = _math.floor(n_particles * interval)
    ks_eta = jnp.asarray(
        [[n_particles - k_os, min(k_os, n_particles - 1)]], jnp.int32)

    def shard_body(params, grid_arrs, key):
        t_eval, hflag, aflag, oflag, t_obs, zflag = grid_arrs
        idx = jax.lax.axis_index(axis)
        # 1-wide particle axis: scalar collectives are identities (see
        # _sharded_scan)
        pmax_ = (lambda v: v) if n_shards == 1 else (
            lambda v: jax.lax.pmax(v, axis))
        psum_ = (lambda v: v) if n_shards == 1 else (
            lambda v: jax.lax.psum(v, axis))

        k_init, k_scan = jax.random.split(key)
        x0 = model.initial_state(params, jax.random.fold_in(k_init, idx),
                                 (local_n,))
        dtype = x0.dtype

        def body(carry, inp):
            x, hz, ll = carry
            t_ev, hf, af, of, t_ob, zf, k = inp
            k_em = jax.random.fold_in(jax.random.fold_in(k, 1), idx)
            k_res = jax.random.fold_in(k, 2)    # shared across shards

            gamma_k = model.f(x, t_ev)
            hz1 = hz + jnp.where(hf, jnp.exp(gamma_k) * h, 0.0)
            x_adv = model.sde.step_euler_maruyama(sp, k_em, x, h)
            x1 = jnp.where(af, x_adv, x)

            def obs_case(args):
                x1, hz1, ll = args
                gamma = model.f(x1, t_ob)
                logw = jnp.where(zf, 0.0, gamma - hz1)          # :217
                maxw = pmax_(jnp.max(logw))
                w = jnp.exp(logw - maxw)
                total = psum_(jnp.sum(w))
                ll1 = ll + maxw + jnp.log(total / n_particles)
                wn = w / total
                ess = jnp.floor(
                    1.0 / psum_(jnp.sum(wn * wn))).astype(jnp.int32)
                x2 = distributed_systematic_resample(x1, w, k_res, axis)
                eta = jnp.exp(gamma)
                eta_mean = psum_(jnp.sum(eta)) / n_particles
                sel = _kth_smallest_sharded(eta[None], ks_eta, axis)
                s_mean = psum_(jnp.sum(x2, axis=0)) / n_particles
                out = (ll1, ess, eta_mean, sel[0, 0], sel[0, 1], s_mean)
                return (x2, jnp.zeros_like(hz1), ll1), out

            def no_obs(args):
                x1, hz1, ll = args
                z = jnp.asarray(0.0, dtype)
                out = (ll, jnp.asarray(0, jnp.int32), z, z, z,
                       jnp.zeros((d,), dtype))
                return (x1, hz1, ll), out

            return jax.lax.cond(of, obs_case, no_obs, (x1, hz1, ll))

        keys = jax.random.split(k_scan, t_eval.shape[0])
        init = (x0, jnp.zeros((local_n,), dtype), jnp.asarray(0.0, dtype))
        (xf, _, ll), outs = jax.lax.scan(
            body, init, (t_eval, hflag, aflag, oflag, t_obs, zflag, keys))
        return ll, outs, xf

    fn = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    ll, outs, xf = fn(params, (t_eval, hflag, aflag, oflag, t_obs, zflag),
                      key)
    ll_hist, ess, em, elo, ehi, sm = tuple(o[obs_idx] for o in outs)
    return LgcpResult(ll, ll_hist, ess, em, elo, ehi, sm, xf)


def lgcp_filter(model: Model, params: Tree, data: TimeSeries,
                n_particles: int, key, *, precision: int = 1,
                resample: str = "systematic",
                interval: float = 0.975, mesh=None,
                axis: str | None = None) -> LgcpResult:
    """Particle filter for a log-Gaussian Cox process over event times.

    ``data.ts`` are the event (or grid) times; weights follow the reference:
    every datum contributes ``gamma - cumulative_hazard``
    (ParticleFilter.scala:210-226).

    The data-dependent fine grids (``ceil(dt/h)`` Euler substeps per
    inter-observation gap, ParticleFilter.scala:190) are flattened on the
    host into one union grid with per-slot flags, so total work is
    O(sum of gaps / h) -- independent of the largest single gap -- and the
    whole filter compiles once per dataset shape.

    ``resample='systematic-pallas'`` routes the resampling through the
    merge-gather kernel (large N on TPU; N divisible by 1024) instead of
    the XLA scatter ancestor fill.

    ``mesh=`` shards the particle axis over ``mesh[axis]`` (default axis
    :data:`~..parallel.mesh.PARTICLE_AXIS`): scalar weight collectives +
    the distributed systematic resampler + bisection eta order statistics,
    no global cloud on any shard (the multi-chip tier of
    :func:`~.filter.bootstrap_filter`, applied to the flat fine-grid
    scan).  Systematic resampling only, as ``bootstrap_filter(mesh=)``.
    """
    model.validate_params(params)
    grid = _build_fine_grid(np.asarray(data.ts, np.float64), precision)
    if mesh is not None:
        if resample != "systematic":
            raise ValueError(
                "lgcp_filter(mesh=...) supports resample='systematic' only "
                f"(got {resample!r}); the sharded path always resamples "
                "with the distributed systematic scheme")
        if axis is None:
            from ..parallel.mesh import PARTICLE_AXIS
            axis = PARTICLE_AXIS
        return _lgcp_sharded_impl(model, params, grid, n_particles, key,
                                  precision, interval, mesh, axis)
    return _lgcp_impl(model, params, grid, n_particles, key, precision,
                      resample, interval)


def _build_fine_grid(ts: np.ndarray, precision: int):
    """Flatten per-segment Euler substeps into one tagged union grid.

    Returns ``(t_eval, hflag, aflag, oflag, t_obs, zflag, obs_idx)`` of
    length K = sum over segments of max(ceil(gap/h), 1): per slot the
    hazard-eval time, whether it contributes a hazard term, whether the
    state advances afterwards (all but each segment's last substep),
    whether it is a segment's observation slot, the observation time, and
    whether the segment is a zero-dt duplicate event; ``obs_idx`` indexes
    the observation slots for gathering per-observation histories.
    """
    n_obs = ts.shape[0]
    h = 10.0 ** (-precision)
    prev = np.concatenate([ts[:1], ts[:-1]])
    gaps = ts - prev
    # ceil(dt/h) with a tiny backoff so exact multiples of h do not round
    # up from float error (the reference computes this in double too)
    n_sub = np.where(gaps > 0,
                     np.ceil(gaps / h - 1e-9), 0).astype(np.int64)
    slots = np.maximum(n_sub, 1)          # zero-dt segments still need a slot
    ends = np.cumsum(slots)
    seg = np.repeat(np.arange(n_obs), slots)              # [K] obs index
    j = np.arange(ends[-1]) - np.repeat(ends - slots, slots)  # within-segment
    n_seg = n_sub[seg]

    f32 = np.float32
    return (jnp.asarray((prev[seg] + j * h).astype(f32)),  # t_eval
            jnp.asarray(n_seg > 0),                        # hflag
            jnp.asarray(j < n_seg - 1),                    # aflag
            jnp.asarray(j == slots[seg] - 1),              # oflag
            jnp.asarray(ts[seg].astype(f32)),              # t_obs
            jnp.asarray(n_seg == 0),                       # zflag
            jnp.asarray(ends - 1))                         # obs_idx
