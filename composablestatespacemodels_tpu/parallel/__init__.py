from .mesh import CHAIN_AXIS, PARTICLE_AXIS, make_mesh, particle_mesh
from .multihost import (hybrid_mesh, initialize_distributed,
                        replicate_to_mesh, shard_particles_to_mesh)
from .sharded_filter import (distributed_systematic_resample,
                             distributed_systematic_resample_t,
                             sharded_bootstrap_filter,
                             sharded_log_likelihood)
from .sharded_pmmh import (sharded_adaptive_pmmh, sharded_initial_state,
                           sharded_pmmh, sharded_pmmh_monitored)

__all__ = [
    "make_mesh", "particle_mesh", "hybrid_mesh", "CHAIN_AXIS",
    "PARTICLE_AXIS", "initialize_distributed", "replicate_to_mesh",
    "shard_particles_to_mesh", "distributed_systematic_resample",
    "distributed_systematic_resample_t", "sharded_bootstrap_filter",
    "sharded_log_likelihood", "sharded_pmmh", "sharded_adaptive_pmmh",
    "sharded_initial_state", "sharded_pmmh_monitored",
]
