"""Sequential-semantics MCMC balanced colorer (numpy).

Faithful re-implementation of the reference CPU chain
(coloringMCMC_CPU.cpp, semantics in SURVEY §3.1): violating-*node* count
metric, per-node free-color scan, the STANDARD proposal formulas of
``fill_p`` (:393-481), pre-drawn per-node uniforms, taboo counters, and the
always-accept swap (the Hastings test is commented out in the reference,
:239-262).  The tailcut epilogue implements the *intended* greedy
(ascending-histogram first-free recolor) — the reference's inner loop has a
loop-variable bug (:296, SURVEY §9.1).

This model is the statistical golden reference for the TPU chain and the
``--mcmccpu`` CLI algorithm.  It is intentionally plain numpy: clarity over
speed.
"""

from __future__ import annotations

import time

import numpy as np

from mcmc_colorer_tpu.config import MCMCParams
from mcmc_colorer_tpu.graph.container import Graph
from mcmc_colorer_tpu.models.base import Coloring


class SequentialMCMCColorer:
    def __init__(self, graph: Graph, params: MCMCParams) -> None:
        self.graph = graph
        self.params = params

    def _violating(self, colors: np.ndarray) -> np.ndarray:
        """Per-node violation flags (violation_count, _CPU.cpp:329-351)."""
        g = self.graph
        u = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
        conflict = colors[u] == colors[g.cols]
        out = np.zeros(g.n, dtype=bool)
        np.logical_or.at(out, u[conflict], True)
        return out

    def run(self, seed: int, repetition: int = 0) -> Coloring:
        g, p = self.graph, self.params
        n, n_col = g.n, p.n_colors
        eps = p.epsilon
        rng = np.random.default_rng(seed + repetition)  # main.cu:171 pattern
        t0 = time.perf_counter()

        colors = rng.integers(0, n_col, size=n).astype(np.int64)
        taboo = np.zeros(n, dtype=np.int64)
        z = p.tailcut_threshold(n)
        trace = []
        rip = 0
        viols = self._violating(colors)
        n_viol = int(viols.sum())
        trace.append(n_viol)

        while n_viol > z and rip < p.max_iterations:
            rip += 1
            node_probab = rng.random(n)  # drawn up front (_CPU.cpp:139)
            new_colors = colors.copy()
            for i in range(n):
                if taboo[i] > 0:
                    taboo[i] -= 1
                    new_colors[i] = colors[i]
                    continue
                neigh = g.neighbors_of(i)
                occupied = np.zeros(n_col, dtype=bool)
                occupied[colors[neigh]] = True
                zv = int(occupied.sum())
                zvcomp = n_col - zv
                cur = colors[i]
                prob = np.empty(n_col, dtype=np.float64)
                if viols[i]:
                    if zvcomp == 0:
                        # all colors occupied: keep current w.h.p.
                        # (_CPU.cpp:402-411)
                        prob.fill(eps)
                        prob[cur] = 1.0 - (n_col - 1) * eps
                    else:
                        # free ← (1−ε·Zv)/Zvcomp, occupied ← ε (:414-420)
                        prob.fill(eps)
                        prob[~occupied] = (1.0 - eps * zv) / zvcomp
                else:
                    prob.fill(eps)
                    prob[cur] = 1.0 - (n_col - 1) * eps  # :471-479
                # inverse-CDF walk against the pre-drawn uniform (:493-528)
                cdf = np.cumsum(prob)
                c = int(np.searchsorted(cdf, node_probab[i], side="right"))
                if c >= n_col:
                    c = int(rng.integers(0, n_col))  # overflow guard (:521)
                new_colors[i] = c
                if c == cur and p.taboo_iterations > 0:
                    taboo[i] = p.taboo_iterations  # :526-527
            colors = new_colors
            viols = self._violating(colors)
            n_viol = int(viols.sum())
            trace.append(n_viol)

        max_iter_reached = rip >= p.max_iterations
        if p.tailcut and n_viol > 0:
            colors = self._tailcut(colors)
            viols = self._violating(colors)
            n_viol = int(viols.sum())

        dur = (time.perf_counter() - t0) * 1e3
        return Coloring(
            colors=colors.astype(np.int32),
            n_colors=n_col,
            iterations=rip,
            converged=n_viol <= z,
            duration_ms=dur,
            conflict_trace=np.asarray(trace),
            extra={
                "final_violations": n_viol,
                "max_iter_reached": max_iter_reached,
            },
        )

    def _tailcut(self, colors: np.ndarray) -> np.ndarray:
        """Intended tailcut (_CPU.cpp:272-311 semantics without the :296
        bug): visit violating nodes, recolor to the first free color in
        ascending-histogram order, until violation-free."""
        g, p = self.graph, self.params
        colors = colors.copy()
        hist = np.bincount(colors, minlength=p.n_colors)
        order = np.argsort(hist, kind="stable")
        for _round in range(g.n + 1):
            viols = self._violating(colors)
            if not viols.any():
                break
            for i in np.flatnonzero(viols):
                neigh = g.neighbors_of(i)
                occupied = np.zeros(p.n_colors, dtype=bool)
                occupied[colors[neigh]] = True
                if occupied[colors[i]]:
                    for c in order:
                        if not occupied[c]:
                            colors[i] = c
                            break
        return colors
