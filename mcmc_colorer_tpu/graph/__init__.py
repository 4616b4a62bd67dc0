from mcmc_colorer_tpu.graph.container import EllGraph, Graph
from mcmc_colorer_tpu.graph.generate import erdos_renyi
from mcmc_colorer_tpu.graph.io import load_edge_list, write_edge_list

__all__ = ["Graph", "EllGraph", "erdos_renyi", "load_edge_list", "write_edge_list"]
