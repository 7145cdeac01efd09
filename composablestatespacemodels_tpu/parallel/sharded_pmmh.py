"""PMMH over a (chains x particles) TPU mesh.

Chains are data-parallel over the ``chains`` mesh axis (one chain per mesh
row -- the TPU-native replacement for the reference's two-thread
``mapAsync(2)`` chain parallelism, DetermineParameters.scala:68-69); each
chain's inner particle filter shards its particle cloud over the
``particles`` axis with ICI collectives (see :mod:`.sharded_filter`).

Everything -- proposals, the PF sweep, the accept/reject step -- lives in one
jitted ``lax.scan`` inside one ``shard_map``; iterations never leave the
device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..inference.pmmh import flat_prior, symmetric_transition, PmmhResult
from ..models.model import Model
from ..models.tree import Tree
from ..utils.data import TimeSeries
from .mesh import CHAIN_AXIS, PARTICLE_AXIS
from .sharded_filter import _sharded_scan, _sharded_scan_t, auto_transposed

_INIT_LL = -1e30


@partial(jax.jit,
         static_argnames=("model", "n_particles", "n_iters", "mesh",
                          "proposal", "prior", "log_transition",
                          "transposed"))
def _sharded_pmmh_impl(model: Model, params: Tree, data: TimeSeries,
                       n_particles: int, key, n_iters: int, mesh: Mesh,
                       proposal, prior, log_transition, transposed=False):
    n_pshards = mesh.shape[PARTICLE_AXIS]
    if n_particles % n_pshards:
        raise ValueError(
            f"n_particles={n_particles} not divisible by {n_pshards} shards")
    local_n = n_particles // n_pshards

    def body(p0, d, k):
        ci = jax.lax.axis_index(CHAIN_AXIS)
        k = jax.random.fold_in(k, ci)  # independent chain streams

        def pf_ll(kk, p):
            # sync_axes: the adaptive resampling ring's trip count must
            # agree across chain rows too (its ppermutes rendezvous
            # mesh-wide), so the unfilled-count psum spans both axes
            scan = _sharded_scan_t if transposed else _sharded_scan
            ll, _, _, _, _ = scan(
                model, p, d, local_n, kk, PARTICLE_AXIS,
                sync_axes=(CHAIN_AXIS, PARTICLE_AXIS))
            return ll

        def mh_step(carry, kk):
            cur, ll, acc = carry
            k_prop, k_pf, k_u = jax.random.split(kk, 3)
            # proposal key identical on every particle shard of this chain
            prop = proposal(k_prop, cur)
            ll_prop = pf_ll(k_pf, prop)
            a = (ll_prop + log_transition(prop, cur) + prior(prop)
                 - log_transition(cur, prop) - ll - prior(cur))
            accept = (jnp.log(jax.random.uniform(
                k_u, (), jnp.result_type(float))) < a)
            new = jax.tree_util.tree_map(
                lambda x, y: jnp.where(accept, y, x), cur, prop)
            new_ll = jnp.where(accept, ll_prop, ll)
            new_acc = acc + accept.astype(jnp.int32)
            return (new, new_ll, new_acc), (new, new_ll, new_acc)

        keys = jax.random.split(k, n_iters)
        init = (p0, jnp.asarray(_INIT_LL, jnp.result_type(float)),
                jnp.asarray(0, jnp.int32))
        _, (ps, lls, accs) = jax.lax.scan(mh_step, init, keys)
        # add a leading local-chain axis so out_specs can lay chains out
        expand = lambda x: x[None]
        return (jax.tree_util.tree_map(expand, ps), lls[None], accs[None])

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS), P(CHAIN_AXIS)),
        check_vma=False,
    )
    ps, lls, accs = fn(params, data, key)
    return PmmhResult(ps, lls, accs)


def sharded_pmmh(model: Model, init_params: Tree, data: TimeSeries,
                 n_particles: int, key, n_iters: int, mesh: Mesh, *,
                 proposal: Callable,
                 prior: Callable = flat_prior,
                 log_transition: Callable = symmetric_transition,
                 transposed: bool | None = None) -> PmmhResult:
    """Run ``mesh.shape['chains']`` PMMH chains, each with an
    ICI-sharded particle filter.  Result axes: [n_chains, n_iters, ...].

    ``transposed``: run each chain's filter in the [d, local_n] fast
    layout with Pallas local resampling fills (default auto: TPU backend
    and 1024-divisible shard size; see sharded_filter)."""
    model.validate_params(init_params)
    if transposed is None:
        local_n = n_particles // max(mesh.shape[PARTICLE_AXIS], 1)
        transposed = auto_transposed(local_n)
    return _sharded_pmmh_impl(model, init_params, data, n_particles, key,
                              n_iters, mesh, proposal, prior, log_transition,
                              transposed=transposed)
