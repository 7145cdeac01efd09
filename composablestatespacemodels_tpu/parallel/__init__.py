from .mesh import CHAIN_AXIS, PARTICLE_AXIS, make_mesh, particle_mesh
from .sharded_filter import (distributed_systematic_resample,
                             sharded_bootstrap_filter,
                             sharded_log_likelihood)
from .sharded_pmmh import sharded_pmmh

__all__ = [
    "make_mesh", "particle_mesh", "CHAIN_AXIS", "PARTICLE_AXIS",
    "distributed_systematic_resample", "sharded_bootstrap_filter",
    "sharded_log_likelihood", "sharded_pmmh",
]
