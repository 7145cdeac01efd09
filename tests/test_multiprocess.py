"""REAL 2-process DCN tier test.

Round-2 verdict: the multi-host layout rule (chains over DCN, particles on
ICI, SURVEY.md section 5.8) had never crossed an actual process boundary.
This test launches two subprocesses, each with 4 virtual CPU devices,
connected through ``jax.distributed.initialize`` (gloo CPU collectives),
builds ``hybrid_mesh(n_chains=2)`` and runs the particle-sharded filter
and the chain-parallel PMMH end-to-end; results must agree across
processes and (for the filter ll) with a single-process 8-device run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _gloo_available() -> bool:
    import jax

    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _gloo_available(),
                    reason="gloo CPU collectives unavailable")
def test_two_process_dcn_tier():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS",)}
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_base["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env_base["JAX_NUM_PROCESSES"] = "2"

    procs = []
    for pid in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            assert p.returncode == 0, (
                f"worker failed rc={p.returncode}\nstdout:\n{out}\n"
                f"stderr:\n{err[-3000:]}")
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT:")]
        assert lines, out
        results.append(json.loads(lines[0][len("RESULT:"):]))

    results.sort(key=lambda r: r["pid"])
    assert {r["pid"] for r in results} == {0, 1}
    # both processes observe the same replicated filter ll
    assert results[0]["ll"] == pytest.approx(results[1]["ll"], rel=1e-6)
    # each host ran ITS chain to a finite state (ownership asserted in the
    # worker via addressable-shard indices)
    assert all(np.isfinite(r["own_chain_last_ll"]) for r in results)

    # cross-check the filter ll against a single-process 8-device mesh:
    # same key, same data, same global device count => statistically the
    # same filter (collective reduction order may differ by float rounding)
    import jax
    import jax.numpy as jnp

    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)
    from composablestatespacemodels_tpu.parallel.multihost import hybrid_mesh

    model = cssm.linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.1, 0.2, 0.3))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(7), 40,
                                dt=1.0)
    data = sim.to_timeseries()
    mesh = hybrid_mesh(n_chains=2)   # single-process: both rows local
    ll_local = float(cssm.bootstrap_filter(
        model, params, data, 64, jax.random.PRNGKey(0), mesh=mesh,
        store="ll").ll)
    assert results[0]["ll"] == pytest.approx(ll_local, abs=1e-3)

    # chain-parallel PMMH: the 2-process run must agree with the same
    # computation on a single-process 8-device mesh, chain by chain (same
    # keys; tolerance covers collective reduction-order float drift)
    from composablestatespacemodels_tpu.models import perturb
    from composablestatespacemodels_tpu.parallel.sharded_pmmh import \
        sharded_pmmh

    pm_local = sharded_pmmh(model, params, data, 64, jax.random.PRNGKey(0),
                            25, mesh, proposal=perturb(0.02))
    for r in results:
        assert r["own_chain_last_ll"] == pytest.approx(
            float(pm_local.lls[r["pid"], -1]), abs=1e-2), r
