"""Independent-chain MCMC ensemble.

The reference runs repetitions sequentially on one GPU (main.cu:82 loop).
Here N chains run simultaneously: `vmap` over the whole device-resident
chain (`models.mcmc._run_chain`), sharded over the ``chains`` mesh axis so
each device advances its own chains with zero communication; finished
chains freeze in place (lax.while_loop batching).  Best-of-chains selection
picks the chain with (fewest conflicts, most balanced classes).

Lock-step pooled annealing across chains lives in
:mod:`mcmc_colorer_tpu.parallel.sharded` (it needs a shared iteration
clock); this module keeps chains fully asynchronous.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcmc_colorer_tpu.config import MCMCParams
from mcmc_colorer_tpu.graph.container import Graph
from mcmc_colorer_tpu.models.base import Coloring
from mcmc_colorer_tpu.models.mcmc import MCMCColorer, _run_chain, choose_block_size
from mcmc_colorer_tpu.utils import rng as rngu


class EnsembleMCMCColorer:
    """Run ``n_chains`` independent chains, return the best coloring.

    ``mesh`` may be None (all chains on the default device) or a
    `jax.sharding.Mesh` with a ``chains`` axis; ``n_chains`` must then be a
    multiple of that axis size.
    """

    def __init__(
        self,
        graph: Graph,
        params: MCMCParams,
        n_chains: int,
        mesh: Mesh | None = None,
        block_size: int | None = None,
        backend: str = "auto",
        layout: str = "flat",
    ) -> None:
        """``layout='bucketed'``: every chain runs over degree-bucketed
        rectangles (graph/container.py:BucketedEll) — required on skewed
        graphs whose flat max-degree rectangle exceeds HBM."""
        self.graph = graph
        self.params = params
        self.n_chains = n_chains
        self.mesh = mesh
        self.block = block_size or choose_block_size(
            graph.n, params.n_colors * max(1, n_chains // 8)
        )
        if backend == "auto":
            backend = (
                "pallas"
                if jax.default_backend() not in ("cpu", "gpu")
                else "xla"
            )
        from mcmc_colorer_tpu.graph.container import degree_pad_for

        self.layout = layout
        if layout == "bucketed":
            self.block = min(self.block, 2048)
            g2, perm = graph.degree_relabel()
            self._perm = perm
            self.ell = g2.to_ell_bucketed(
                block=128,
                min_lane=128 if backend == "pallas" else 8,
            )
            self._pos = self.ell.real_positions()
        elif layout == "flat":
            self._perm = None
            self.ell = graph.to_ell(
                pad_nodes_to=self.block,
                pad_degree_to=degree_pad_for(graph, backend),
            )
        else:
            raise ValueError(f"unknown layout {layout!r}")

        run = jax.vmap(
            partial(
                _run_chain, params=params, block=self.block, backend=backend
            ),
            in_axes=(None, 0),
        )
        if mesh is not None:
            if "chains" not in mesh.axis_names:
                raise ValueError("mesh must have a 'chains' axis")
            c_ax = mesh.shape["chains"]
            if n_chains % c_ax:
                raise ValueError(
                    f"n_chains={n_chains} not divisible by mesh chains={c_ax}"
                )
            key_sharding = NamedSharding(mesh, P("chains"))
            repl = NamedSharding(mesh, P())
            self._jit_run = jax.jit(
                run,
                in_shardings=(repl, key_sharding),
            )
        else:
            self._jit_run = jax.jit(run)

    def run(self, seed: int, repetition: int = 0):
        """Returns (best Coloring, list of per-chain summaries)."""
        root = rngu.for_repetition(rngu.root_key(seed), repetition)
        keys = jax.vmap(lambda c: rngu.for_chain(root, c))(
            jnp.arange(self.n_chains, dtype=jnp.uint32)
        )
        t0 = time.perf_counter()
        colors, rips, conflicts, traces, tc_rounds = self._jit_run(
            self.ell, keys
        )
        raw = np.asarray(jax.device_get(colors))
        if self._perm is not None:
            colors = np.empty((self.n_chains, self.graph.n), np.int32)
            colors[:, self._perm] = raw[:, self._pos]
        else:
            colors = raw[:, : self.graph.n]
        conflicts = np.asarray(conflicts)
        rips = np.asarray(rips)
        dur = (time.perf_counter() - t0) * 1e3

        # best-of-chains: fewest conflicts, then smallest class-size std
        stds = np.array(
            [
                np.bincount(c, minlength=self.params.n_colors).std()
                for c in colors
            ]
        )
        order = np.lexsort((stds, conflicts))
        best = int(order[0])
        z = self.params.tailcut_threshold(self.graph.n)
        summaries = [
            {
                "chain": int(i),
                "iterations": int(rips[i]),
                "conflicts": int(conflicts[i]),
                "class_std": float(stds[i]),
            }
            for i in range(self.n_chains)
        ]
        best_coloring = Coloring(
            colors=colors[best],
            n_colors=self.params.n_colors,
            iterations=int(rips[best]),
            converged=int(conflicts[best]) <= z,
            duration_ms=dur,
            conflict_trace=np.asarray(traces[best])[: int(rips[best]) + 1],
            extra={
                "final_conflicts": int(conflicts[best]),
                "max_iter_reached": bool(
                    rips[best] >= self.params.max_iterations
                ),
                "best_chain": best,
                "n_chains": self.n_chains,
            },
        )
        return best_coloring, summaries
