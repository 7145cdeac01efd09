"""Tracing / profiling harness.

The reference ships only a stale ScalaMeter bench harness (SURVEY.md
section 5.1); TPU-native equivalents:

* :func:`trace` -- context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution;
* :func:`time_fn` -- wall-clock micro-timing with compile/warm-up separation
  and forced host synchronisation (remote-TPU tunnels can make
  ``block_until_ready`` a no-op, so a scalar readback is used);
* :func:`benchmark_filter` -- the reference bench matrix (single step +
  full-filter throughput vs particle count,
  src/bench/scala/ParticleFilter.scala:17-82) on real arrays.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(value):
    """Force completion: pull one scalar per output leaf to the host
    (scalar readback beats ``block_until_ready``, which remote tunnels can
    turn into a no-op; touching every leaf avoids declaring done while
    other outputs are still in flight)."""
    leaves = jax.tree_util.tree_leaves(value)
    return sum(float(jnp.sum(x.ravel()[:1])) for x in leaves)


def time_fn(fn: Callable, *args, repeats: int = 5, warmup: int = 2,
            make_args: Callable = None, **kwargs):
    """Median wall-clock seconds of ``fn(*args)`` with host sync.

    Args:
      make_args: optional ``i -> tuple`` producing fresh positional args
        per call.  Over the remote-TPU tunnel, repeated IDENTICAL
        dispatches return cached results instantly (CLAUDE.md), so timed
        repeats MUST vary an input -- e.g.
        ``make_args=lambda i: (jax.random.fold_in(key, i),)``.  Without it
        the repeats reuse ``args`` verbatim and, on such tunnels, measure
        the relay cache.

    Returns ``(median_seconds, all_times)``.
    """
    get = make_args if make_args is not None else (lambda i: args)
    for i in range(warmup):
        _sync(fn(*get(-1 - i), **kwargs))
    times = []
    for i in range(repeats):
        a = get(i)
        t0 = time.perf_counter()
        _sync(fn(*a, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times


def benchmark_filter(model, params, data, key,
                     particle_counts: Iterable[int] = (1000, 10_000, 100_000),
                     resample: str = "systematic",
                     repeats: int = 3):
    """Full-filter throughput vs N (reference bench matrix).

    Returns a list of ``(n_particles, seconds, particle_steps_per_sec)``.
    """
    from ..inference.filter import log_likelihood

    n_steps = int(data.ts.shape[0])
    out = []
    for i, n in enumerate(particle_counts):
        def run(k, n=int(n)):
            return log_likelihood(model, params, data, n, k,
                                  resample=resample)

        keys = iter(jax.random.split(jax.random.fold_in(key, i),
                                     repeats + 2))
        _sync(run(next(keys)))  # compile
        _sync(run(next(keys)))  # warm
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(run(next(keys)))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        out.append((int(n), med, int(n) * n_steps / med))
    return out
