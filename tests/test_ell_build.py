"""Device-side ELL build (O(2m+n) CSR upload) vs the host rectangle.

The device scatter (ops/ell_build.py) must be bit-equal to the host
build Graph.to_ell has always done — including empty rows, leading
isolated vertices, band boundaries, and the all-sentinel padding tail.
Reference H2D boundary being matched: graphGPU.cu:211-226 (cumulDegs +
neighs, 2m+n words).
"""

import numpy as np
import pytest

from mcmc_colorer_tpu.graph.container import Graph
from mcmc_colorer_tpu.graph.generate import barabasi_albert, erdos_renyi
from mcmc_colorer_tpu.ops.ell_build import ell_neighbors_from_csr_device


def _host_rect(g: Graph, n_pad: int, d_pad: int) -> np.ndarray:
    neigh = np.full((n_pad, d_pad), n_pad, dtype=np.int32)
    row = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    col = np.arange(g.cols.shape[0], dtype=np.int64) - np.repeat(
        g.row_ptr[:-1], g.degrees
    )
    neigh[row, col] = g.cols
    return neigh


@pytest.mark.parametrize(
    "g, band",
    [
        (erdos_renyi(500, 0.05, seed=3), 256),  # ~49 bands
        (erdos_renyi(300, 0.02, seed=1), 1 << 20),  # single band
        (barabasi_albert(800, 5, seed=2), 512),  # skewed degrees
    ],
    ids=["er-multiband", "er-oneband", "ba-skewed"],
)
def test_device_build_bit_equal(g, band):
    n_pad = ((g.n + 127) // 128) * 128
    d_pad = ((g.max_degree + 7) // 8) * 8
    stats = {}
    dev = np.asarray(
        ell_neighbors_from_csr_device(
            g.row_ptr, g.cols, n_pad, d_pad, stats=stats, band_edges=band
        )
    )
    np.testing.assert_array_equal(dev, _host_rect(g, n_pad, d_pad))
    assert stats["bands"] == -(-g.cols.shape[0] // band)
    assert stats["upload_bytes"] <= (g.cols.shape[0] + g.n + 1 + band) * 4


def test_device_build_empty_rows_and_isolated_zero():
    # vertex 0 isolated (row boundary at exactly 0) + gaps in the middle
    src = np.array([1, 1, 5, 7], dtype=np.int64)
    dst = np.array([3, 5, 7, 9], dtype=np.int64)
    g = Graph.from_edges(10, src, dst)
    dev = np.asarray(
        ell_neighbors_from_csr_device(
            g.row_ptr, g.cols, 16, 8, band_edges=4
        )
    )
    np.testing.assert_array_equal(dev, _host_rect(g, 16, 8))


def test_to_ell_device_flag_matches_host():
    # two Graph objects (per-graph rectangle cache would otherwise
    # return the first build for both)
    g1 = erdos_renyi(400, 0.04, seed=9)
    g2 = erdos_renyi(400, 0.04, seed=9)
    e_host = g1.to_ell(pad_nodes_to=128, device_build=False)
    e_dev = g2.to_ell(pad_nodes_to=128, device_build=True)
    np.testing.assert_array_equal(
        np.asarray(e_dev.neighbors), np.asarray(e_host.neighbors)
    )
    np.testing.assert_array_equal(
        np.asarray(e_dev.degrees), np.asarray(e_host.degrees)
    )
