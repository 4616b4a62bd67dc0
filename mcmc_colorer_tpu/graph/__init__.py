from mcmc_colorer_tpu.graph.container import (
    BucketedEll,
    EllGraph,
    EllSlice,
    Graph,
)
from mcmc_colorer_tpu.graph.generate import barabasi_albert, erdos_renyi
from mcmc_colorer_tpu.graph.io import load_edge_list, write_edge_list

__all__ = [
    "Graph",
    "EllGraph",
    "EllSlice",
    "BucketedEll",
    "erdos_renyi",
    "barabasi_albert",
    "load_edge_list",
    "write_edge_list",
]
