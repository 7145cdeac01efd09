"""Log-Gaussian Cox process filtering: fine-grid cumulative-hazard weights.

The reference ``FilterLgcp`` (ParticleFilter.scala:169-227) advances each
particle on a fine Euler grid between observation times, accumulating the
cumulative hazard integral sum(exp(f(x_k, t_k)) * h), and weights particles by

    log w = gamma(t) - integral lambda dt      (ParticleFilter.scala:217)

TPU design: the data-dependent number of fine steps ``ceil(dt * 10^p)``
(ParticleFilter.scala:190) becomes a *static* maximum substep count derived
from the observation grid on the host, with masked inactive substeps -- the
inner integral is a fixed-length ``lax.scan`` (SURVEY.md section 7 hard part
(d)), fully vectorised over the particle axis.
"""

from __future__ import annotations

import dataclasses
import math
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
                                   "max_substeps", "resample", "interval"))
def _lgcp_impl(model: Model, params: Tree, data: TimeSeries,
               n_particles: int, key, precision: int, max_substeps: int,
               resample: str, interval: float):
    from .filter import credible_interval_eta

    resample_fn = rs.get_scheme(resample)
    h = 10.0 ** (-precision)

    k_init, k_scan = jax.random.split(key)
    particles = model.initial_state(params, k_init, (n_particles,))
    dtype = particles.dtype
    n = n_particles

    def hazard_integral(x0, t_prev, dt, k):
        """Advance particles over the fine grid, returning (last state,
        gamma at t, cumulative hazard).  Mirrors calcWeight,
        ParticleFilter.scala:184-208: the integral sums n = ceil(dt/h)
        evaluations starting AT the previous state; the returned state has
        advanced n-1 fine steps."""
        # clamp: the device f32 quotient can land one ulp above the host
        # double used to size max_substeps (e.g. h=0.01 is inexact in f32),
        # which would otherwise silently drop the final hazard term
        n_sub = jnp.minimum(jnp.ceil(dt / h), max_substeps).astype(jnp.int32)

        def body(carry, inp):
            x, hz = carry
            k_sub, step_idx = inp
            active = step_idx < n_sub
            t_k = t_prev + step_idx.astype(dtype) * h
            gamma_k = model.f(x, t_k)
            hz1 = hz + jnp.where(active, jnp.exp(gamma_k) * h, 0.0)
            x_next = model.sde.step_euler_maruyama(
                model.sde_params(params), k_sub, x, h)
            do_step = active & (step_idx < n_sub - 1)
            x1 = jnp.where(do_step, x_next, x)
            return (x1, hz1), None

        keys = jax.random.split(k, max_substeps)
        steps = jnp.arange(max_substeps)
        (x_last, hz), _ = jax.lax.scan(
            body, (x0, jnp.zeros((x0.shape[0],), dtype)), (keys, steps))
        t_arr = jnp.asarray(t_prev + dt, dtype)
        return x_last, model.f(x_last, t_arr), hz

    def step(carry, inp):
        x, t_prev, ll = carry
        t, y, mask, k = inp
        k_sub, k_res = jax.random.split(k)
        dt = t - t_prev

        x1, gamma, hz = hazard_integral(x, t_prev, dt, k_sub)
        # dt == 0: no integral, weight from the current state
        # (ParticleFilter.scala:212-214)
        gamma0 = model.f(x, t)
        zero_dt = dt <= 0
        x1 = jnp.where(zero_dt, x, x1)
        gamma = jnp.where(zero_dt, gamma0, gamma)
        hz = jnp.where(zero_dt, gamma0, hz)

        logw = gamma - hz                       # :217
        maxw = jnp.max(logw)
        w = jnp.exp(logw - maxw)
        ll1 = ll + maxw + jnp.log(jnp.mean(w))
        wn = w / jnp.sum(w)
        ess = jnp.floor(1.0 / jnp.sum(wn * wn)).astype(jnp.int32)

        idx = resample_fn(k_res, w)
        x2 = x1[idx]

        eta = jnp.exp(gamma)
        e_lo, e_hi = credible_interval_eta(eta, interval)
        out = (ll1, ess, jnp.mean(eta), e_lo, e_hi, jnp.mean(x2, axis=0))
        return (x2, t, ll1), out

    keys = jax.random.split(k_scan, data.ts.shape[0])
    init = (particles, data.ts[0], jnp.asarray(0.0, dtype))
    (xf, _, ll), (ll_hist, ess, em, elo, ehi, sm) = jax.lax.scan(
        step, init, (data.ts, data.ys, data.mask, keys))
    return LgcpResult(ll, ll_hist, ess, em, elo, ehi, sm, xf)


def lgcp_filter(model: Model, params: Tree, data: TimeSeries,
                n_particles: int, key, *, precision: int = 1,
                resample: str = "systematic",
                interval: float = 0.975) -> LgcpResult:
    """Particle filter for a log-Gaussian Cox process over event times.

    ``data.ts`` are the event (or grid) times; weights follow the reference:
    every datum contributes ``gamma - cumulative_hazard``
    (ParticleFilter.scala:210-226).

    The fine-grid substep count is bounded statically by the largest
    inter-observation gap, so the whole filter compiles once.
    """
    model.validate_params(params)
    ts = np.asarray(data.ts)
    h = 10.0 ** (-precision)
    gaps = np.diff(ts, prepend=ts[0])
    max_substeps = max(1, int(math.ceil(float(gaps.max()) / h + 1e-9)))
    return _lgcp_impl(model, params, data, n_particles, key, precision,
                      max_substeps, resample, interval)
