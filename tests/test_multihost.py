"""Multi-host helpers on the single-process 8-virtual-device CPU mesh.

True multi-process DCN runs need multiple hosts; here we pin down the
single-process degradation and the layout rule (particle axis on the
intra-host dimension).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu.parallel import (CHAIN_AXIS,
                                                     PARTICLE_AXIS)
from composablestatespacemodels_tpu.parallel.multihost import (
    hybrid_mesh, initialize_distributed, process_local_chains,
    replicate_to_mesh, shard_particles_to_mesh)


def test_initialize_distributed_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_hybrid_mesh_default_single_process():
    mesh = hybrid_mesh()
    assert mesh.axis_names == (CHAIN_AXIS, PARTICLE_AXIS)
    assert mesh.shape[CHAIN_AXIS] == 1
    assert mesh.shape[PARTICLE_AXIS] == len(jax.devices())


def test_hybrid_mesh_intra_host_chain_rows():
    mesh = hybrid_mesh(n_chains=2)
    assert mesh.shape[CHAIN_AXIS] == 2
    assert mesh.shape[PARTICLE_AXIS] == len(jax.devices()) // 2


def test_hybrid_mesh_bad_division():
    with pytest.raises(ValueError):
        hybrid_mesh(n_chains=3)  # 3 does not divide 8 local devices


def test_replicate_and_shard():
    mesh = hybrid_mesh()
    tree = {"a": np.arange(6.0), "b": np.float32(2.5)}
    rep = replicate_to_mesh(tree, mesh)
    np.testing.assert_array_equal(np.asarray(rep["a"]), tree["a"])
    assert float(rep["b"]) == 2.5

    n = len(jax.devices()) * 4
    x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    xs = shard_particles_to_mesh(x, mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec(PARTICLE_AXIS)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_process_local_chains_single_process():
    assert list(process_local_chains(4)) == [0, 1, 2, 3]


def test_sharded_filter_on_hybrid_mesh(key):
    """End-to-end: the sharded filter runs on a hybrid mesh and matches the
    single-device log-likelihood statistically (tiny shapes)."""
    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = cssm.linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.0, 1.0, 0.4))
    sim = cssm.simulate_regular(model, params, key, 15)
    data = sim.to_timeseries()
    mesh = hybrid_mesh(n_chains=1)
    res = cssm.bootstrap_filter(model, params, data, 256, key,
                                mesh=mesh, store="ll")
    ref = cssm.bootstrap_filter(model, params, data, 256, key, store="ll")
    assert jnp.isfinite(res.ll)
    assert abs(float(res.ll) - float(ref.ll)) < 3.0
