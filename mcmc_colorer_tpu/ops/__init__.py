from mcmc_colorer_tpu.ops.neighbor import (
    color_histogram,
    neighbor_colors,
    occupancy_matrix,
)

__all__ = ["neighbor_colors", "occupancy_matrix", "color_histogram"]
