import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import composablestatespacemodels_tpu as cssm
from composablestatespacemodels_tpu.models import branch, leaf, ou_params, param_node
from composablestatespacemodels_tpu.ops.resample_kernel import sorted_gather_resample_t, systematic_counts
from composablestatespacemodels_tpu.inference.resampling import _ancestors_from_counts
import numpy as np

# TPU correctness first
N, d = 1 << 20, 8
key = jax.random.PRNGKey(0)
x = jnp.tile(jnp.arange(N, dtype=jnp.float32)[:, None], (1, d))
w = jax.random.uniform(key, (N,)) + 0.01
C = systematic_counts(key, w)
got = sorted_gather_resample_t(x.T, C).T
want = x[_ancestors_from_counts(C, N)]
print("TPU v5 correctness:", bool(jnp.allclose(got, want)), flush=True)
# degenerate on TPU
w0 = jnp.zeros((N,)).at[12345].set(1.0)
C0 = systematic_counts(key, w0)
got0 = sorted_gather_resample_t(x.T, C0).T
print("TPU v5 degenerate:", bool(jnp.all(got0[:, 0] == 12345)), flush=True)

model = cssm.poisson(cssm.ou_process(1)) + cssm.seasonal(24, 3, cssm.ou_process(6))
params = branch(
    leaf(param_node(None, ou_params(1.0, 0.2, 0.3, 1.0, 0.3))),
    leaf(param_node(None, ou_params(0.2, 0.2, 0.25, 0.2, 0.2))))
T = 100
sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), T, dt=1.0)
data = sim.to_timeseries()
ctr=[0]
def timed(name, fn):
    float(fn(ctr[0])); ctr[0]+=1
    float(fn(ctr[0])); ctr[0]+=1
    ts=[]
    for i in range(3):
        t0=time.perf_counter(); v=float(fn(ctr[0])); ctr[0]+=1; ts.append(time.perf_counter()-t0)
    ts.sort()
    print(f"{name:45s} {ts[1]*1e3/T:7.2f} ms/step ll={v:.1f}", flush=True)
mk = lambda i: jax.random.fold_in(jax.random.PRNGKey(7), i)
timed("full filter (pallas v5, pipelined)", lambda i: cssm.log_likelihood(model, params, data, N, mk(i), resample="systematic-pallas"))
