from mcmc_colorer_tpu.utils.timer import Timer
from mcmc_colorer_tpu.utils import rng

__all__ = ["Timer", "rng"]
