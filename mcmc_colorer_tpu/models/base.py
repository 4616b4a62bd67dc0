"""Common colorer output type, validators and quality metrics.

Counterpart of the reference's colorer framework
(src/graph_coloring/coloring.h:11-52 ``Coloring``/``Colorer`` and
colorer.cpp helpers), re-expressed functionally: a coloring is an int32
array; class-sorted views and metrics are derived on demand.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from mcmc_colorer_tpu.graph.container import EllGraph, Graph


@dataclass
class Coloring:
    """Result of any colorer.

    ``colors[i]`` is the 0-based color of node i (the reference's MCMC
    convention; its Luby/GFF/VFF 1-based colors are normalised to 0-based
    at the API boundary, SURVEY §8).  ``n_colors`` is the size of the
    palette the run used; ``iterations``/``converged``/``duration_ms``
    carry execution metadata for the stats writer.
    """

    colors: np.ndarray
    n_colors: int
    iterations: int = 0
    converged: bool = True
    duration_ms: float = 0.0
    conflict_trace: np.ndarray | None = None
    extra: dict = field(default_factory=dict)

    @cached_property
    def histogram(self) -> np.ndarray:
        return np.bincount(self.colors, minlength=self.n_colors)

    @cached_property
    def used_colors(self) -> int:
        return int((self.histogram > 0).sum())

    # class-sorted representation (reference Coloring{nCol, colClass,
    # cumulSize}, built by buildColoring, colorer.cpp:20-58)
    @cached_property
    def color_classes(self) -> tuple[np.ndarray, np.ndarray]:
        """(col_class, cumul_size): node indices sorted by color, and the
        exclusive prefix of class sizes (len n_colors+1)."""
        order = np.argsort(self.colors, kind="stable")
        cumul = np.zeros(self.n_colors + 1, dtype=np.int64)
        np.cumsum(self.histogram, out=cumul[1:])
        return order, cumul

    def class_stats(self) -> dict:
        """Mean/variance/std of class sizes over the full palette
        (reference saveStats, coloringMCMC_CPUutils.cpp:93-101)."""
        h = self.histogram.astype(np.float64)
        mean = h.sum() / self.n_colors
        var = float(((h - mean) ** 2).mean())
        return {"mean": float(mean), "variance": var, "std": float(np.sqrt(var))}

    def class_degree_stats(self, g: "Graph") -> tuple[np.ndarray, np.ndarray]:
        """(mean_degree, std_degree) per color class — the per-class degree
        statistics Colorer::buildColoring computes (colorer.cpp:38-57)."""
        deg = g.degrees.astype(np.float64)
        sums = np.bincount(self.colors, weights=deg, minlength=self.n_colors)
        sqs = np.bincount(
            self.colors, weights=deg * deg, minlength=self.n_colors
        )
        cnt = np.maximum(self.histogram, 1)
        mean = sums / cnt
        var = np.maximum(sqs / cnt - mean**2, 0.0)
        return mean, np.sqrt(var)

    def ascii_histogram(self, width: int = 60) -> str:
        """ASCII class-size histogram ('every * is K nodes') — the
        PRINTHISTOGRAM output (coloringMCMC_prints.cu:178-190,
        coloringMCMC_CPUutils.cpp:6-45)."""
        h = self.histogram
        divider = max(1, int(h.max()) // max(width, 1))
        lines = [
            f"Color {i} " + "*" * (int(h[i]) // divider)
            for i in range(self.n_colors)
        ]
        lines.append(f"Every * is {divider} nodes")
        return "\n".join(lines)

    def balance_index(self, prob: float) -> float:
        """BalancingIndex = sqrt(Σ_{used c}(count_c − n/nCol)² / (n·p))
        (reference coloringMCMC_prints.cu:162-167 — note the reference sums
        only over *used* colors)."""
        n = self.colors.shape[0]
        avg = n / self.n_colors
        h = self.histogram
        used = h > 0
        bi = float(((h[used] - avg) ** 2).sum())
        denom = n * prob if prob > 0 else n
        return float(np.sqrt(bi / denom))

    def efficiency_num_processors(self, n_processors: int) -> float:
        """Scheduling-efficiency metric E = mean over classes of
        (cs/P) / ceil(cs/P) (reference colorer.cpp:105-114)."""
        h = self.histogram.astype(np.float64)
        nz = h > 0
        if not nz.any():
            return 0.0
        cs = h[nz]
        eff = (cs / n_processors) / np.ceil(cs / n_processors)
        return float(eff.sum() / self.n_colors)


def check_coloring(g: Graph, colors: np.ndarray, allow_uncolored: bool = False) -> bool:
    """Validity check: no edge joins two same-colored nodes — the
    vectorized version of the reference's brute-force checkColoring
    (colorer.cpp:117-132), O(E) instead of O(Σ classSize²)."""
    colors = np.asarray(colors)
    u = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    v = g.cols.astype(np.int64)
    same = colors[u] == colors[v]
    if allow_uncolored:
        same &= colors[u] >= 0
    return not bool(same.any())


def build_coloring(g: Graph, colors: np.ndarray, n_colors: int, **meta) -> Coloring:
    """Package a raw color array (reference Colorer::buildColoring,
    colorer.cpp:20-58)."""
    return Coloring(colors=np.asarray(colors), n_colors=n_colors, **meta)


def count_conflict_edges(graph: EllGraph, colors: jnp.ndarray) -> jnp.ndarray:
    """Number of conflicting edges, deduped by ``neighbor > self`` —
    the reference GPU metric (coloringMCMC_utils.cu:113-116)."""
    n_pad = graph.n_pad
    colors_ext = jnp.concatenate(
        [colors.astype(jnp.int32), jnp.full((1,), -1, jnp.int32)]
    )
    neigh_colors = jnp.take(colors_ext, graph.neighbors, axis=0)
    self_ids = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
    same = (neigh_colors == colors[:, None]) & (graph.neighbors > self_ids)
    return jnp.sum(same, dtype=jnp.int32)


def violating_nodes(graph: EllGraph, colors: jnp.ndarray) -> jnp.ndarray:
    """(n_pad,) bool — node has a neighbor with its color (the reference
    CPU ``violation_count`` predicate, coloringMCMC_CPU.cpp:329-351)."""
    colors_ext = jnp.concatenate(
        [colors.astype(jnp.int32), jnp.full((1,), -1, jnp.int32)]
    )
    neigh_colors = jnp.take(colors_ext, graph.neighbors, axis=0)
    return jnp.any(neigh_colors == colors[:, None], axis=1)
