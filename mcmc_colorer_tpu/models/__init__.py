from mcmc_colorer_tpu.models.base import Coloring, build_coloring, check_coloring
from mcmc_colorer_tpu.models.mcmc import MCMCColorer
from mcmc_colorer_tpu.models.mcmc_active import ActiveMCMCColorer
from mcmc_colorer_tpu.models.mcmc_sequential import SequentialMCMCColorer
from mcmc_colorer_tpu.models.chain_api import ChainState, SteppedMCMC
from mcmc_colorer_tpu.models.luby import LubyColorer
from mcmc_colorer_tpu.models.greedy_ff import GreedyFFColorer
from mcmc_colorer_tpu.models.greedy_seq import SequentialGreedyColorer
from mcmc_colorer_tpu.models.vff import VFFColorer

__all__ = [
    "Coloring",
    "build_coloring",
    "check_coloring",
    "MCMCColorer",
    "ActiveMCMCColorer",
    "SequentialMCMCColorer",
    "SequentialGreedyColorer",
    "SteppedMCMC",
    "ChainState",
    "LubyColorer",
    "GreedyFFColorer",
    "VFFColorer",
]
