"""Measure the resampling-count structure of the flagship bench filter.

Replays the bench model's bootstrap filter step-by-step (CPU, reduced N)
and records, per step, how close the systematic counts are to the
identity staircase -- this decides which merge-kernel fast paths can fire
in the regime the headline bench actually runs (VERDICT r3 #1).

Reported per kernel-block (default 4096) and per 128-lane chunk:
  ident   anc(q) == q for every slot in the block (straight copy serve)
  run     anc strictly consecutive across the block (rolled-copy serve)
  simple  the existing W=3 windowed-duplication flag
  span>k  per-chunk hi-span histogram (source 128-groups touched)
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import composablestatespacemodels_tpu as cssm
from composablestatespacemodels_tpu.models import (branch, leaf, ou_params,
                                                   param_node)
from composablestatespacemodels_tpu.inference.resampling import (
    systematic_counts)

N = 1 << 17
T = 200
BLOCK = 4096
LANE = 128


def main():
    model = (cssm.poisson(cssm.ou_process(1))
             + cssm.seasonal(24, 3, cssm.ou_process(6)))
    params = branch(
        leaf(param_node(None, ou_params(1.0, 0.2, 0.3, 1.0, 0.3))),
        leaf(param_node(None, ou_params(0.2, 0.2, 0.25, 0.2, 0.2))))
    sim_key = jax.random.PRNGKey(0)
    sim = cssm.simulate_regular(model, params, sim_key, T, dt=1.0)
    data = sim.to_timeseries()

    key = jax.random.PRNGKey(7)
    k_init, key = jax.random.split(key)
    x_t = model.initial_state_t(params, k_init, N)

    @jax.jit
    def step(x_t, wn, t_prev, t, y, k):
        k_prop, k_res = jax.random.split(k)
        x1 = model.step_t(params, k_prop, x_t, t - t_prev)
        gamma = model.f_t(x1, t)
        logw = model.log_density(params, gamma, y)
        maxw = jnp.max(logw)
        u = wn * jnp.exp(logw - maxw)
        wn1 = u / jnp.sum(u)
        counts = systematic_counts(k_res, wn1)
        return x1, wn1, counts

    n_blocks = N // BLOCK
    nc = BLOCK // LANE
    tot = dict(blocks=0, ident=0, run=0, simple3=0, chunks=0, crun=0)
    span_hist = np.zeros(10, np.int64)
    count1_frac = []

    ts = np.asarray(data.ts)
    ys = np.asarray(data.ys)
    wn = jnp.full((N,), 1.0 / N)
    t_prev = ts[0] - 1.0
    for i in range(T):
        k = jax.random.fold_in(key, i)
        x_t, wn_post, counts = step(x_t, wn, t_prev, ts[i], ys[i], k)
        counts = np.asarray(counts)
        # per-slot ancestor via searchsorted (ground truth, cheap at 2^17)
        anc = np.searchsorted(counts, np.arange(N), side="right")
        # resample for the next step (keeps the regime honest)
        x_t = jnp.asarray(np.asarray(x_t)[:, anc])
        wn = jnp.full((N,), 1.0 / N)
        t_prev = ts[i]

        q = np.arange(N).reshape(n_blocks, BLOCK)
        a = anc.reshape(n_blocks, BLOCK)
        ident = np.all(a == q, axis=1)
        run = (a[:, -1] - a[:, 0]) == (BLOCK - 1)
        run = run & np.all(np.diff(a, axis=1) == 1, axis=1)

        # per-chunk spans in source-128-group units (the kernel's hi)
        ac = anc.reshape(-1, LANE)
        g_lo = ac[:, 0] // LANE
        g_hi = ac[:, -1] // LANE
        span = g_hi - g_lo + 1
        np.add.at(span_hist, np.clip(span, 0, 9), 1)
        crun = np.all(np.diff(ac, axis=1) == 1, axis=1)

        # simple at W=3, per block: every chunk's span fits 3 groups
        spans_b = span.reshape(n_blocks, nc)
        simple3 = np.all(spans_b <= 3, axis=1)

        tot["blocks"] += n_blocks
        tot["ident"] += int(ident.sum())
        tot["run"] += int(run.sum())
        tot["simple3"] += int(simple3.sum())
        tot["chunks"] += ac.shape[0]
        tot["crun"] += int(crun.sum())
        count1_frac.append(float(np.mean(counts - np.roll(counts, 1) == 1)))

    print(f"N={N} T={T} block={BLOCK}")
    print(f"frac(count==1): mean {np.mean(count1_frac):.4f} "
          f"min {np.min(count1_frac):.4f}")
    for k in ("ident", "run", "simple3"):
        print(f"block {k}: {tot[k]}/{tot['blocks']} = "
              f"{tot[k]/tot['blocks']:.4f}")
    print(f"chunk consecutive-run: {tot['crun']}/{tot['chunks']} = "
          f"{tot['crun']/tot['chunks']:.4f}")
    print("chunk span hist (1..9+):",
          (span_hist / max(span_hist.sum(), 1)).round(4).tolist())


if __name__ == "__main__":
    main()
