"""Time-series containers and forward simulation.

Replaces the reference's Akka-Streams data plumbing (Data.scala) with static
arrays: a time series is ``(ts, ys, mask)`` so irregular observation times and
missing observations stay inside a jitted ``lax.scan`` (dt and the mask are
data, not control flow).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TimeSeries:
    """Observations y(t_i) at (possibly irregular) times, with missing values.

    ``ys`` holds 0.0 where ``mask`` is False (a missing observation --
    the reference's ``Option[Observation] = None``, Data.scala:18-21).
    """

    ts: jnp.ndarray    # [T] observation times
    ys: jnp.ndarray    # [T] observation values (0.0 where missing)
    mask: jnp.ndarray  # [T] bool, True where an observation is present

    def tree_flatten(self):
        return ((self.ts, self.ys, self.mask), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __len__(self):
        return int(self.ts.shape[0])

    @classmethod
    def from_arrays(cls, ts, ys=None) -> "TimeSeries":
        """Build from times + values; NaN / None entries become missing."""
        ts = jnp.asarray(ts, dtype=jnp.result_type(float))
        if ys is None:
            ys_arr = np.full(ts.shape, np.nan)
        else:
            ys_arr = np.asarray(
                [np.nan if y is None else y for y in np.asarray(ys, dtype=object)],
                dtype=np.float64)
        mask = ~np.isnan(ys_arr)
        ys_clean = np.where(mask, ys_arr, 0.0)
        return cls(ts, jnp.asarray(ys_clean, dtype=jnp.result_type(float)),
                   jnp.asarray(mask))

    def knock_out(self, t_lo: float, t_hi: float) -> "TimeSeries":
        """Mark observations with t in [t_lo, t_hi] as missing.

        Mirrors the interpolation example (Interpolate.scala:31-34).
        """
        drop = (self.ts >= t_lo) & (self.ts <= t_hi)
        return TimeSeries(self.ts, jnp.where(drop, 0.0, self.ys),
                          self.mask & ~drop)

    def thin(self, step: int) -> "TimeSeries":
        return TimeSeries(self.ts[::step], self.ys[::step], self.mask[::step])

    def take(self, n: int) -> "TimeSeries":
        return TimeSeries(self.ts[:n], self.ys[:n], self.mask[:n])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SimulatedData:
    """Full generative trace: observation + eta + gamma + latent state.

    Reference: ObservationWithState, Data.scala:31-36.
    """

    ts: jnp.ndarray      # [T]
    ys: jnp.ndarray      # [T]
    etas: jnp.ndarray    # [T]
    gammas: jnp.ndarray  # [T]
    xs: jnp.ndarray      # [T, dim]

    def tree_flatten(self):
        return ((self.ts, self.ys, self.etas, self.gammas, self.xs), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __len__(self):
        return int(self.ts.shape[0])

    def to_timeseries(self) -> TimeSeries:
        return TimeSeries(self.ts, self.ys, jnp.ones(self.ts.shape, dtype=bool))


def simulate(model, params, key, ts) -> SimulatedData:
    """Simulate a POMP model at the given (regular or irregular) times.

    The first time point draws the initial state and an observation at
    ``ts[0]`` (reference: SimulateData.simPompModel / simMarkov,
    Data.scala:64-100); subsequent points advance the SDE by the exact
    transition over ``dt = t_i - t_{i-1}`` and draw y_i | gamma_i
    (SimulateData.simStep, Data.scala:186-193).

    One ``lax.scan`` over time; all per-step math is fused by XLA.
    """
    model.validate_params(params)
    ts = jnp.asarray(ts, dtype=jnp.result_type(float))
    n = ts.shape[0]

    k0, ko0, kscan = jax.random.split(key, 3)
    x0 = model.initial_state(params, k0)
    gamma0 = model.f(x0, ts[0])
    eta0 = model.link(gamma0)
    y0 = model.sample_obs(ko0, params, gamma0)

    def body(carry, inp):
        x_prev, t_prev = carry
        t, k = inp
        kx, ky = jax.random.split(k)
        x = model.step(params, kx, x_prev, t - t_prev)
        gamma = model.f(x, t)
        eta = model.link(gamma)
        y = model.sample_obs(ky, params, gamma)
        return (x, t), (y, eta, gamma, x)

    keys = jax.random.split(kscan, n - 1)
    _, (ys, etas, gammas, xs) = jax.lax.scan(body, (x0, ts[0]), (ts[1:], keys))

    return SimulatedData(
        ts,
        jnp.concatenate([y0[None], ys]),
        jnp.concatenate([eta0[None], etas]),
        jnp.concatenate([gamma0[None], gammas]),
        jnp.concatenate([x0[None], xs], axis=0),
    )


def simulate_regular(model, params, key, n: int, dt: float = 0.1,
                     t0: float = 0.0) -> SimulatedData:
    """Regular-grid simulation from t0 (reference default dt: Data.scala:54)."""
    return simulate(model, params, key, t0 + dt * jnp.arange(n))


def simulate_sde_grid(sde, sde_params, key, x0, t0: float, total: float,
                      precision: int):
    """Fine-grid SDE path with step 10^-precision.

    Reference: SimulateData.simSdeStream, Data.scala:162-176.
    Returns (ts [n+1], xs [n+1, dim]) starting at (t0, x0).
    """
    dt = 10.0 ** (-precision)
    n = int(np.floor(total / dt + 1e-9))
    return sde.simulate(sde_params, key, t0, dt, n, x0=x0)


def simulate_lgcp(model, params, key, start: float, end: float,
                  precision: int = 2):
    """Simulate a log-Gaussian Cox process by thinning.

    Device computes the fine-grid latent path and hazards in one scan; the
    host runs the (inherently data-dependent) accept/reject loop over
    exponential candidate times.  Reference: SimulateData.simLGCP,
    Data.scala:110-149.

    Returns ``(events, grid)`` where ``events`` is a :class:`SimulatedData`
    of accepted event times (y = 1.0) and ``grid`` the fine-grid trace
    (y = 0.0), mirroring the reference's combined output.
    """
    model.validate_params(params)
    kinit, kpath, kthin = jax.random.split(key, 3)
    x0 = model.initial_state(params, kinit)
    ts, xs = simulate_sde_grid(model.sde, model.sde_params(params), kpath,
                               x0, start, end - start, precision)
    gammas = jax.vmap(model.f)(xs, ts)

    ts_np = np.asarray(ts)
    xs_np = np.asarray(xs)
    gam_np = np.asarray(gammas)
    upper = float(np.exp(gam_np).max())

    rng = np.random.default_rng(np.asarray(jax.random.key_data(kthin))[-1])
    events_t, events_g, events_x = [], [], []
    t = float(start)
    while True:
        t = t + rng.exponential(1.0 / upper)
        if t > end:
            break
        idx = int(np.searchsorted(ts_np, t, side="right") - 1)
        hazard = gam_np[idx]
        if rng.uniform() <= np.exp(hazard) / upper:
            events_t.append(t)
            events_g.append(hazard)
            events_x.append(xs_np[idx])

    f = jnp.result_type(float)
    events = SimulatedData(
        jnp.asarray(np.asarray(events_t), dtype=f),
        jnp.ones((len(events_t),), dtype=f),
        jnp.exp(jnp.asarray(np.asarray(events_g), dtype=f)),
        jnp.asarray(np.asarray(events_g), dtype=f),
        jnp.asarray(np.asarray(events_x if events_t else
                               np.zeros((0, model.dim))), dtype=f),
    )
    grid = SimulatedData(ts, jnp.zeros_like(ts), jnp.exp(gammas), gammas, xs)
    return events, grid


# ---------------------------------------------------------------------------
# timestamped observations (reference TimestampObservation, Data.scala:45)
# ---------------------------------------------------------------------------


def timeseries_from_timestamps(timestamps, ys=None, unit: str = "h",
                               epoch=None):
    """Build a :class:`TimeSeries` from wall-clock timestamps.

    Args:
      timestamps: array-like of ``numpy.datetime64`` (or parseable strings).
      ys: observations (None/NaN => missing).
      unit: numpy timedelta unit for the continuous time axis
        ('h' hours, 'D' days, 's' seconds, ...).
      epoch: reference timestamp mapped to t=0 (default: first timestamp).

    Returns ``(timeseries, epoch)`` -- keep ``epoch`` to map filter output
    times back to timestamps with :func:`timestamps_of`.
    """
    stamps = np.asarray(timestamps, dtype="datetime64[ns]")
    if epoch is None:
        epoch = stamps[0]
    else:
        epoch = np.datetime64(epoch)
    ts = (stamps - epoch) / np.timedelta64(1, unit)
    return TimeSeries.from_arrays(ts.astype(np.float64), ys), epoch


def timestamps_of(ts, epoch, unit: str = "h"):
    """Continuous times -> numpy.datetime64 stamps (inverse of the above)."""
    epoch = np.datetime64(epoch)
    deltas = (np.asarray(ts) * np.timedelta64(1, unit).astype(
        "timedelta64[ns]").astype(np.float64)).astype("timedelta64[ns]")
    return epoch + deltas
