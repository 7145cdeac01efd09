"""Headline benchmark: 1M-particle, 1000-step composed seasonal-Poisson
bootstrap particle filter (BASELINE.md north-star config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` divides by a **measured** baseline: the reference publishes
no numbers and no JVM exists in this image, so ``baseline_numpy.py`` -- a
semantics-faithful single-thread NumPy port of the reference hot loop
(ParticleFilter.scala:116-132, Sde.scala:142-150, Resampling.scala:63-72) --
was measured at 1.31e6 particle-steps/s on this image's CPU (BASELINE.md,
2026-08-16).  Vectorised NumPy is generous to the JVM's boxed per-particle
loop, so the reported speedup is a lower bound.  North-star target:
vs_baseline > 50.

Usage:
  python bench.py            # full: N=1e6, T=1000 on the default device
  python bench.py --smoke    # tiny shapes, CI-friendly
  python bench.py --no-secondary   # headline only (skip PMMH + sharded)
  python bench.py --smoke --pmmh   # force the secondary metrics in smoke
Secondary metrics (PMMH iterations/sec, sharded-filter throughput) run by
default on full benches so the recorded JSON is complete.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

import composablestatespacemodels_tpu as cssm
from composablestatespacemodels_tpu.models import (branch, leaf, ou_params,
                                                   param_node)

# Measured single-thread NumPy port of the reference hot loop
# (baseline_numpy.py on this image, best of 3; see BASELINE.md).
BASELINE_PARTICLE_STEPS_PER_SEC = 1.31e6


def wait_for_backend(max_wait_s: float = 1200.0, probe_every_s: float = 60.0):
    """Block until the default backend answers a trivial dispatch.

    The TPU tunnel can be transiently unavailable for tens of minutes
    (observed: >1 h); without this guard a bench launched into the outage
    records rc != 0 instead of a number.  Probes run in a subprocess --
    a hung backend init in THIS process would poison every later attempt.
    """
    import os
    import subprocess
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "assert float(jnp.sum(jnp.ones((8,)))) == 8.0"],
                capture_output=True, timeout=probe_every_s + 120,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False    # hung backend init counts as down
        if ok:
            if attempt > 1:
                print(f"backend up after {attempt} probes", file=sys.stderr)
            return
        if time.time() > deadline:
            print("backend still unavailable after "
                  f"{max_wait_s:.0f}s; proceeding anyway", file=sys.stderr)
            return
        print(f"backend probe {attempt} failed; retrying in "
              f"{probe_every_s:.0f}s", file=sys.stderr)
        time.sleep(probe_every_s)


def flagship_model():
    model = (cssm.poisson(cssm.ou_process(1))
             + cssm.seasonal(24, 3, cssm.ou_process(6)))
    params = branch(
        leaf(param_node(None, ou_params(1.0, 0.2, 0.3, 1.0, 0.3))),
        leaf(param_node(None, ou_params(0.2, 0.2, 0.25, 0.2, 0.2))))
    return model, params


def run(n_particles: int, n_steps: int, repeats: int = 3) -> float:
    model, params = flagship_model()
    on_tpu = jax.default_backend() == "tpu"
    # rbg (XLA RngBitGenerator) keys for the timed filter runs:
    # counter-based like threefry but hardware-accelerated -- the propagate
    # step is dominated by drawing [d, N] normals.  Simulation keeps
    # threefry (jax.random.poisson supports only threefry).
    sim_key = jax.random.PRNGKey(0)
    key = jax.random.key(0, impl="rbg") if on_tpu else sim_key

    sim = cssm.simulate_regular(model, params, sim_key, n_steps, dt=1.0)
    data = sim.to_timeseries()
    print(f"simulated T={n_steps} composed seasonal-Poisson series "
          f"(d={model.dim}) on {jax.devices()[0].platform}", file=sys.stderr)

    # fused = resample + next-step propagate in one Pallas kernel (in-kernel
    # Box-Muller noise); statistically equivalent to 'systematic-pallas',
    # measured faster (one HBM round-trip of the cloud less per step)
    resample = ("systematic-pallas-fused"
                if on_tpu and n_particles % 1024 == 0
                else "systematic")
    print(f"resampling scheme: {resample} "
          f"(keys: {'rbg' if on_tpu else 'threefry2x32'})", file=sys.stderr)

    def ll(k):
        return cssm.log_likelihood(model, params, data, n_particles, k,
                                   resample=resample)

    # compile + warm up (also flushes any async dispatch weirdness in the
    # remote-TPU tunnel, whose block_until_ready can return early once)
    t0 = time.perf_counter()
    float(ll(key))
    float(ll(jax.random.fold_in(key, 999)))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        # force a scalar host readback: block_until_ready over the tunnel
        # can return early (CLAUDE.md), float() cannot
        v = float(ll(k))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"run {i}: {dt:.3f}s  ll={v:.1f}", file=sys.stderr)
    times.sort()
    median = times[len(times) // 2]
    return n_particles * n_steps / median


def bench_decompose(n_particles: int, n_steps: int = 1000) -> dict:
    """Record the fused-step perf decomposition (VERDICT r3 #10): ms/step
    of the counts pipeline, the merge kernel (counts+merge minus counts),
    and the standalone fused propagate tail, each measured inside a
    T-step ``lax.scan`` (per-dispatch tunnel overhead ~0.3-0.6 ms makes
    single-op timings meaningless -- CLAUDE.md).  Future rounds diff these
    against docs/performance.md to catch kernel regressions without
    re-deriving the breakdown.
    """
    from composablestatespacemodels_tpu.inference.filter import _kernel_block
    from composablestatespacemodels_tpu.inference.resampling import (
        systematic_counts)
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        propagate_weights_t, sorted_gather_resample_t)

    n = n_particles
    d = 8
    kblock = _kernel_block(n)
    key = jax.random.key(0, impl="rbg")
    # mild weight regime (the bench filter's own regime: count==1 rate
    # ~0.5, chunk spans 2-3 -- scripts/measure_count_structure.py)
    logw = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (n,))
    w = jnp.exp(logw - jnp.max(logw))
    w = w / jnp.sum(w)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (d, n))
    coef = jnp.stack([jnp.full((d,), 0.9), jnp.zeros((d,)),
                      jnp.full((d,), 0.1)], axis=1)

    def timed(make_step, carry0):
        def body(c, i):
            return make_step(c, i), 0
        @jax.jit
        def scan(c0, k0):
            c, _ = jax.lax.scan(
                body, c0, jnp.arange(n_steps, dtype=jnp.int32))
            return c
        r = scan(carry0, key)
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))
                                               ), r)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = scan(carry0, key)
            jax.tree_util.tree_map(
                lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
            best = min(best, time.perf_counter() - t0)
        return best / n_steps * 1e3

    def counts_step(c, i):
        k = jax.random.fold_in(key, i)
        return systematic_counts(k, w) + c * 0

    def counts_merge_step(x, i):
        k = jax.random.fold_in(key, i)
        counts = systematic_counts(k, w)
        return sorted_gather_resample_t(x, counts, block=kblock)

    def tail_step(x, i):
        seed = jnp.asarray([i], jnp.int32)
        return propagate_weights_t(x, coef, seed, block=kblock)

    c0 = jnp.zeros((n,), jnp.int32)
    counts_ms = timed(counts_step, c0)
    cm_ms = timed(counts_merge_step, x0)
    tail_ms = timed(tail_step, x0)
    out = {"counts_ms": round(counts_ms, 4),
           "merge_ms": round(cm_ms - counts_ms, 4),
           "tail_ms": round(tail_ms, 4)}
    print(f"decomposition (N={n}, T={n_steps}): {out}", file=sys.stderr)
    return out


def bench_sharded(n_particles: int, n_steps: int = 200,
                  resample: str = "systematic-pallas-fused") -> float:
    """Secondary metric: the mesh-tier filter (``bootstrap_filter(mesh=)``)
    on a mesh over the available devices -- on this image one chip.  With
    the default fused scheme, n_shards == 1 delegates to the single-device
    fully fused pipeline (parallel/sharded_filter.py), so this records
    what a mesh user actually gets; ``resample='systematic'`` instead
    forces the full distributed machinery (transposed sharded scan,
    ppermute-ring resampling, Pallas local fill -- recorded separately as
    ``sharded_machinery_*`` so regressions in the shard code stay
    visible)."""
    from composablestatespacemodels_tpu.parallel import particle_mesh

    model, params = flagship_model()
    sim_key = jax.random.PRNGKey(0)
    on_tpu = jax.default_backend() == "tpu"
    key = jax.random.key(0, impl="rbg") if on_tpu else sim_key
    if not (on_tpu and n_particles % 1024 == 0):
        resample = "systematic"
    sim = cssm.simulate_regular(model, params, sim_key, n_steps, dt=1.0)
    data = sim.to_timeseries()
    mesh = particle_mesh()

    def ll(k):
        return cssm.bootstrap_filter(model, params, data, n_particles, k,
                                     mesh=mesh, store="ll",
                                     resample=resample).ll

    float(ll(key))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(ll(jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    rate = n_particles * n_steps / best
    print(f"sharded filter ({mesh.devices.size} device(s), {resample}): "
          f"{rate:.3e} particle-steps/s", file=sys.stderr)
    return rate


def bench_pmmh(n_particles: int = 100, n_obs: int = 400,
               n_iters: int = 500) -> float:
    """Secondary recorded metric: PMMH iterations/sec -- one full PF sweep
    per iteration at reference-like shapes (the DeterminePosterior hot
    loop: 100 particles, DetermineParameters.scala:55-85)."""
    from composablestatespacemodels_tpu.models import perturb

    model, params = flagship_model()
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), n_obs,
                                dt=1.0)
    pf_ll = cssm.make_pf_loglik(model, sim.to_timeseries(), n_particles)
    # rbg keys, as the headline filter bench: at N=100 the per-step
    # threefry split/fold_in fixed cost dominates the tiny PF step
    # (measured 55.6 -> 73.1 iters/s from the key impl alone)
    key = jax.random.key(0, impl="rbg")

    def run(k):
        return cssm.pmmh(k, params, pf_ll, perturb(0.05), n_iters).lls[-1]

    run(key).block_until_ready()
    best = float("inf")
    for i in range(3):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        float(run(k))
        best = min(best, time.perf_counter() - t0)
    rate = n_iters / best
    print(f"PMMH: {rate:.1f} iters/s at N={n_particles}, T={n_obs} "
          f"({rate * n_particles * n_obs:.2e} particle-steps/s inside MCMC)",
          file=sys.stderr)
    return rate


def bench_pmmh_chains(n_chains: int = 256, n_particles: int = 100,
                      n_obs: int = 400, n_iters: int = 200) -> float:
    """Secondary recorded metric: AGGREGATE chains x iterations/sec of
    vmapped PMMH chains.  One tiny chain (the reference shape) uses ~0.4%
    of the chip; batching independent chains with vmap is how the MCMC
    workload actually exploits the hardware (pmmh_chains,
    inference/pmmh.py; the reference's mapAsync(2) thread parallelism,
    DetermineParameters.scala:68-69, scaled to the TPU).

    Chain-count sweep on chip (100 iters each): 64/128/256/512 =
    665/693/766/784 aggregate chain-iters/s -- the workload is bound by
    the T=400 sequential scan's per-step overhead (~3 us/step), not by
    chain count, so it saturates early; 256 is near the knee.  Do NOT
    raise past 512: 1024 vmapped chains CRASHED the TPU worker process
    (UNAVAILABLE, kernel fault) -- it recovered, but the bench must not
    risk it."""
    from composablestatespacemodels_tpu.models import perturb

    model, params = flagship_model()
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), n_obs,
                                dt=1.0)
    pf_ll = cssm.make_pf_loglik(model, sim.to_timeseries(), n_particles)
    key = jax.random.key(0, impl="rbg")   # see bench_pmmh

    def run(k):
        return cssm.pmmh_chains(k, params, pf_ll, perturb(0.05), n_iters,
                                n_chains).lls[:, -1]

    float(jnp.sum(run(key)))
    best = float("inf")
    for i in range(3):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        float(jnp.sum(run(k)))
        best = min(best, time.perf_counter() - t0)
    rate = n_chains * n_iters / best
    print(f"PMMH chains: {rate:.1f} aggregate chain-iters/s at "
          f"{n_chains} chains x N={n_particles}, T={n_obs} "
          f"({rate * n_particles * n_obs:.2e} particle-steps/s inside MCMC)",
          file=sys.stderr)
    return rate


def bench_pmmh_fused(n_particles: int = 100, n_obs: int = 400,
                     n_iters: int = 300) -> float:
    """Secondary recorded metric: single-chain PMMH iterations/sec with
    the fused sweep likelihood (make_pf_loglik(fused_sweep=True): the
    whole T-step filter in one kernel launch per iteration; measured 3x
    the XLA-scan path at the reference shape).

    All secondaries time best-of-3: one stalled dispatch through the
    tunnel skews best-of-2 badly (observed here: 90.4 recorded vs a
    same-session 212 -- a 2.3x artifact); a third run costs seconds."""
    from composablestatespacemodels_tpu.models import perturb

    model, params = flagship_model()
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), n_obs,
                                dt=1.0)
    pf_ll = cssm.make_pf_loglik(model, sim.to_timeseries(), n_particles,
                                fused_sweep=True)
    key = jax.random.key(0, impl="rbg")

    def run(k):
        return cssm.pmmh(k, params, pf_ll, perturb(0.05), n_iters).lls[-1]

    float(run(key))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(run(jax.random.fold_in(key, i + 1)))
        best = min(best, time.perf_counter() - t0)
    rate = n_iters / best
    print(f"PMMH (fused sweep): {rate:.1f} iters/s at N={n_particles}, "
          f"T={n_obs}", file=sys.stderr)
    return rate


def bench_pmmh_chains_fused(n_chains: int = 256, n_particles: int = 100,
                            n_obs: int = 400, n_iters: int = 100) -> float:
    """Secondary recorded metric: aggregate chains x iterations/sec with
    the FUSED sweep kernel (ops/sweep_kernel.pf_sweep_chains) -- every
    chain's full T-step filter runs in one Pallas launch per MH
    iteration instead of a vmapped XLA scan (round-4 addition; see
    docs/performance.md for the measured ladder)."""
    from composablestatespacemodels_tpu.models import perturb

    model, params = flagship_model()
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), n_obs,
                                dt=1.0)
    data = sim.to_timeseries()
    pf_all = cssm.make_pf_loglik_chains(model, data, n_particles)
    key = jax.random.key(0, impl="rbg")

    def run(k):
        return cssm.pmmh_chains(k, params, None, perturb(0.05), n_iters,
                                n_chains, pf_ll_chains=pf_all).lls[:, -1]

    float(jnp.sum(run(key)))
    best = float("inf")
    for i in range(3):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        float(jnp.sum(run(k)))
        best = min(best, time.perf_counter() - t0)
    rate = n_chains * n_iters / best
    print(f"PMMH chains (fused sweep): {rate:.1f} aggregate chain-iters/s "
          f"at {n_chains} chains x N={n_particles}, T={n_obs} "
          f"({rate * n_particles * n_obs:.2e} particle-steps/s inside MCMC)",
          file=sys.stderr)
    return rate


def bench_lgcp(n_particles: int = 1 << 17) -> float:
    """Secondary recorded metric: flat fine-grid LGCP filter throughput
    (inference/lgcp.py; reference ParticleFilter.scala:169-227) --
    particle-slot-steps/sec over the union grid at precision=1, so a
    regression in the LGCP scan (or its kernel resample path) shows in
    the BENCH history (VERDICT r4 #7)."""
    from composablestatespacemodels_tpu.inference.lgcp import (
        _build_fine_grid)
    from composablestatespacemodels_tpu.models import (brownian_params,
                                                       parameters)
    from composablestatespacemodels_tpu.utils.data import simulate_lgcp

    model = cssm.lgcp(cssm.brownian_motion(1))
    params = parameters(None, brownian_params(1.0, 0.05, 0.1))
    events, _grid = simulate_lgcp(model, params, jax.random.PRNGKey(2),
                                  0.0, 20.0)
    data = events.to_timeseries()
    import numpy as np
    n_slots = _build_fine_grid(
        np.asarray(data.ts, np.float64), 1)[0].shape[0]
    key = (jax.random.key(0, impl="rbg")
           if jax.default_backend() == "tpu" else jax.random.PRNGKey(0))
    scheme = ("systematic-pallas" if jax.default_backend() == "tpu"
              and n_particles % 1024 == 0 else "systematic")

    def ll(k):
        return cssm.lgcp_filter(model, params, data, n_particles, k,
                                precision=1, resample=scheme).ll

    float(ll(key))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(ll(jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    rate = n_particles * n_slots / best
    print(f"LGCP flat-grid filter: {rate:.3e} particle-slot-steps/s "
          f"(N={n_particles}, K={n_slots} slots, {scheme})", file=sys.stderr)
    return rate


def bench_pmmh_fused_n512(n_obs: int = 400, n_iters: int = 100) -> float:
    """Secondary recorded metric: fused-sweep PMMH at N=512 -- the
    multi-chunk (4 lane-chunk) sweep tier (VERDICT r4 #2; the reference
    pilot grid reaches N=2000, DetermineParameters.scala:22-45)."""
    from composablestatespacemodels_tpu.models import perturb

    model, params = flagship_model()
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), n_obs,
                                dt=1.0)
    pf_ll = cssm.make_pf_loglik(model, sim.to_timeseries(), 512,
                                fused_sweep=True)
    key = jax.random.key(0, impl="rbg")

    def run(k):
        return cssm.pmmh(k, params, pf_ll, perturb(0.05), n_iters).lls[-1]

    float(run(key))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(run(jax.random.fold_in(key, i + 1)))
        best = min(best, time.perf_counter() - t0)
    rate = n_iters / best
    print(f"PMMH (fused sweep, N=512): {rate:.1f} iters/s at T={n_obs}",
          file=sys.stderr)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes")
    ap.add_argument("--particles", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--pmmh", action="store_true",
                    help="force the secondary metrics (PMMH, sharded) even "
                         "with --smoke")
    ap.add_argument("--no-secondary", action="store_true",
                    help="headline metric only (skip the PMMH and sharded "
                         "benches that otherwise run on full invocations)")
    args = ap.parse_args()

    if args.smoke:
        n, t = 10_000, 100
    else:
        # 2^20 (~1.05M) particles: the Pallas resampling kernel wants
        # N divisible by its 1024-wide tile
        n, t = 1 << 20, 1000
    n = args.particles or n
    t = args.steps or t

    wait_for_backend()
    throughput = run(n, t)
    result = {
        "metric": f"particle-steps/sec at N={n:.0e} "
                  "(composed seasonal-Poisson PF)",
        "value": round(throughput),
        "unit": "particle-steps/s",
        "vs_baseline": round(
            throughput / BASELINE_PARTICLE_STEPS_PER_SEC, 2),
    }
    if (args.pmmh or not args.smoke) and not args.no_secondary:
        # each secondary guarded: a failure (backend outage mid-bench,
        # worker crash) must not cost the metrics already measured --
        # the recorded JSON line is the round's perf artifact
        secondaries = [
            ("decompose_ms_per_step", lambda: bench_decompose(n)),
            ("pmmh_iters_per_sec", lambda: round(bench_pmmh(), 1)),
            ("pmmh_chains_aggregate_iters_per_sec",
             lambda: round(bench_pmmh_chains(), 1)),
            ("pmmh_fused_sweep_iters_per_sec",
             lambda: round(bench_pmmh_fused(), 1)),
            ("pmmh_chains_fused_sweep_iters_per_sec",
             lambda: round(bench_pmmh_chains_fused(), 1)),
            ("pmmh_fused_sweep_n512_iters_per_sec",
             lambda: round(bench_pmmh_fused_n512(), 1)),
            ("lgcp_particle_steps_per_sec",
             lambda: round(bench_lgcp())),
            # fused tier at T=1000: comparable to the headline (T=200's
            # ~40 ms dispatch+readback bias costs 0.2 ms/step) and reuses
            # its compiled executable.  The r03/r04 key
            # sharded_particle_steps_per_sec KEEPS its full-machinery
            # T=200 semantics so the BENCH history stays a like-for-like
            # series; the n_shards==1 delegation lands under the new
            # sharded_fused_* key.
            ("sharded_fused_particle_steps_per_sec",
             lambda: round(bench_sharded(n, n_steps=1000))),
            ("sharded_particle_steps_per_sec",
             lambda: round(bench_sharded(n, resample="systematic"))),
        ]
        for name, fn in secondaries:
            try:
                result[name] = fn()
            except Exception as e:  # noqa: BLE001 - record, keep going
                print(f"secondary {name} failed: {e!r}", file=sys.stderr)
                result[name + "_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
