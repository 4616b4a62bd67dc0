from mcmc_colorer_tpu.parallel.mesh import make_mesh, initialize_distributed
from mcmc_colorer_tpu.parallel.chains import EnsembleMCMCColorer
from mcmc_colorer_tpu.parallel.sharded import ShardedMCMCColorer

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "EnsembleMCMCColorer",
    "ShardedMCMCColorer",
]
