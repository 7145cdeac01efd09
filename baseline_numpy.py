"""Measured CPU baseline: a faithful single-thread NumPy port of the
reference's particle-filter hot loop.

The Scala/Akka reference publishes no benchmark numbers (BASELINE.md:
``"published": {}``) and no JVM is available in this image, so the
``vs_baseline`` denominator in ``bench.py`` is grounded by *measuring* this
port instead of estimating: a semantics-faithful, vectorised, single-thread
NumPy implementation of one composed seasonal-Poisson filter step --

* exact OU transition  ``mean = mu + (x - mu) e^{-phi dt}``,
  ``var = sigma^2/(2 phi) (1 - e^{-2 phi dt})``  (Sde.scala:142-150),
* Poisson weighting through the Fourier/first-element design vector
  (Model.scala:217-225, 266-274),
* shift-exp-normalise + systematic resampling through the cumulative sum
  (the TreeMap ECDF of Resampling.scala:63-72 as ``searchsorted``),
* ``ll += max + log(mean(w))``  (ParticleFilter.scala:116-132).

This is *generous* to the reference: the JVM walks a boxed ``Vector`` of
state trees and draws per-dimension Gaussians through Breeze one particle
at a time on one thread, where NumPy runs fused C loops over contiguous
arrays.  The measured figure is therefore an upper bound on the reference's
single-thread throughput, making ``vs_baseline`` a lower bound.

Usage:  python baseline_numpy.py [--particles N] [--steps T]
Prints one JSON line {"metric": ..., "value": particle_steps_per_sec}.
"""

import argparse
import json
import sys
import time

import numpy as np
from scipy.special import gammaln


def make_flagship_numpy(rng):
    """Composed poisson(ou(1)) + seasonal(24, 3, ou(6)): d = 7."""
    # (theta=mu here) parameters mirror bench.py's flagship_model()
    phi = np.array([0.3] + [0.25] * 6)
    mu = np.array([1.0] + [0.2] * 6)
    sigma = np.array([0.3] + [0.2] * 6)

    def step(x, dt):
        # exact OU discretisation, one Gaussian per dimension per particle
        e = np.exp(-phi * dt)
        mean = mu + (x - mu) * e
        var = sigma ** 2 / (2.0 * phi) * (1.0 - np.exp(-2.0 * phi * dt))
        return mean + np.sqrt(var) * rng.standard_normal(x.shape)

    def f(x, t):
        # component 1: first element; component 2: Fourier design
        a = np.arange(1, 4)
        ang = 2.0 * np.pi / 24.0 * a * t
        design = np.empty(6)
        design[0::2] = np.cos(ang)
        design[1::2] = np.sin(ang)
        return x[:, 0] + x[:, 1:] @ design

    def log_density(gamma, y):
        return y * gamma - np.exp(gamma) - gammaln(y + 1.0)

    return step, f, log_density


def run(n_particles: int, n_steps: int, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    step, f, log_density = make_flagship_numpy(rng)

    # simulate observations once (not timed)
    x = 0.1 * rng.standard_normal((1, 7))
    ys = np.empty(n_steps)
    for t in range(1, n_steps + 1):
        x = step(x, 1.0)
        ys[t - 1] = rng.poisson(np.exp(np.clip(f(x, t), None, 20.0)))

    particles = 0.1 * rng.standard_normal((n_particles, 7))
    ll = 0.0
    t0 = time.perf_counter()
    for t in range(1, n_steps + 1):
        particles = step(particles, 1.0)                 # propagate
        logw = log_density(f(particles, t), ys[t - 1])   # weight
        m = logw.max()
        w = np.exp(logw - m)
        ll += m + np.log(w.mean())
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        u = rng.uniform()
        pos = (np.arange(n_particles) + u) / n_particles
        idx = np.searchsorted(cdf, pos, side="left")     # ECDF lookup
        particles = particles[np.minimum(idx, n_particles - 1)]
    elapsed = time.perf_counter() - t0
    print(f"ll={ll:.1f}  elapsed={elapsed:.2f}s", file=sys.stderr)
    return n_particles * n_steps / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    rates = [run(args.particles, args.steps, seed=s) for s in range(3)]
    best = max(rates)
    print(json.dumps({
        "metric": "single-thread NumPy port of the reference PF hot loop "
                  f"(composed seasonal-Poisson, N={args.particles:.0e})",
        "value": round(best),
        "unit": "particle-steps/s",
    }))


if __name__ == "__main__":
    main()
