"""Worker process for the 2-process DCN tier test (test_multiprocess.py).

Runs the real multi-host stack: ``initialize_distributed`` from the
standard env vars, a ``hybrid_mesh`` whose chain axis spans the two
processes, a particle-sharded filter and a chain-parallel PMMH run.
Prints one JSON result line prefixed with RESULT: on stdout.

Must be launched with JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
JAX_PROCESS_ID and ``--xla_force_host_platform_device_count=4`` set by the
parent (tests/test_multiprocess.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from composablestatespacemodels_tpu.parallel.multihost import (  # noqa: E402
    initialize_distributed, hybrid_mesh, process_local_chains)

ok = initialize_distributed()   # picks up the JAX_* env vars
assert ok, "initialize_distributed returned False in a 2-process job"
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp  # noqa: E402

import composablestatespacemodels_tpu as cssm  # noqa: E402
from composablestatespacemodels_tpu.models import (  # noqa: E402
    brownian_motion, brownian_params, parameters, perturb)
from composablestatespacemodels_tpu.parallel.mesh import (  # noqa: E402
    CHAIN_AXIS, PARTICLE_AXIS)
from composablestatespacemodels_tpu.parallel.sharded_pmmh import (  # noqa: E402
    sharded_pmmh)

pid = jax.process_index()
mesh = hybrid_mesh(n_chains=2)
assert mesh.shape[CHAIN_AXIS] == 2 and mesh.shape[PARTICLE_AXIS] == 4

# every process owns exactly its own chain row
assert list(process_local_chains(2)) == [pid], process_local_chains(2)
row_procs = {d.process_index for d in mesh.devices[pid].ravel()}
assert row_procs == {pid}, row_procs

# identical data on both hosts (deterministic simulation, shared key)
model = cssm.linear(brownian_motion(1))
params = parameters(jnp.log(0.5), brownian_params(0.1, 0.2, 0.3))
sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(7), 40, dt=1.0)
data = sim.to_timeseries()
key = jax.random.PRNGKey(0)

# 1. particle-sharded filter over the full hybrid mesh (particle axis on
#    the intra-host dimension; replicated over the cross-host chain axis)
res = cssm.bootstrap_filter(model, params, data, 64, key, mesh=mesh,
                            store="ll")
ll = float(res.ll)

# 2. chain-parallel PMMH: chain axis spans the two processes over DCN.
#    Outputs are sharded over the chain axis, so each host addresses ONLY
#    its own chain's rows -- per-host chain ownership by construction.
import numpy as np  # noqa: E402

pm = sharded_pmmh(model, params, data, 64, key, 25, mesh,
                  proposal=perturb(0.02))
shards = pm.lls.addressable_shards
rows = {s.index[0].start if isinstance(s.index[0], slice) else s.index[0]
        for s in shards}
assert rows == {pid}, (rows, pid)   # this host holds exactly chain `pid`
own = np.asarray(shards[0].data)    # [1, n_iters]
own_acc = np.asarray(pm.accepted.addressable_shards[0].data)

print("RESULT:" + json.dumps({
    "pid": pid, "ll": ll,
    "own_chain_last_ll": float(own[0, -1]),
    "own_chain_acc": int(own_acc[0, -1])}),
    flush=True)
