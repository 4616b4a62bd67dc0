"""Vertex-sharded, lock-step multi-chain MCMC over a (chains, shards) mesh.

The reference caps at one GPU's HBM — its nnodes×nCol ``colorsChecker``
matrix is the limiter (coloringMCMC_main.cu:39; SURVEY §6 long-context
note).  Here one chain's vertices are partitioned over the ``shards`` mesh
axis and whole chains over the ``chains`` axis, inside one `shard_map`:

* each shard owns ``n_pad/S`` ELL rows and resamples only those vertices;
* boundary colors are exchanged with one tiled `all_gather` per sweep —
  the distributed analogue of the reference's per-iteration D2H/H2D
  histogram round-trip (coloringMCMC_main.cu:210-214);
* conflict counts `psum` over shards, deduped by global vertex id
  (owner = lower id, mirroring the ``idx < neigh`` rule,
  coloringMCMC_utils.cu:115; SURVEY §10 hard part 6);
* chains advance in lock-step, enabling **pooled annealing**: when the
  pooled (cross-chain mean) conflict count stalls, ε is boosted so chains
  explore more — the systematic version of the reference's interactive
  live-ε editing (dbg.cpp:358-381).

All chains and shards run the loop to the globally-last convergence;
converged chains freeze in place.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcmc_colorer_tpu.config import MCMCParams
from mcmc_colorer_tpu.graph.container import Graph
from mcmc_colorer_tpu.models.base import Coloring
from mcmc_colorer_tpu.models.mcmc import (
    MCMCColorer,
    _needs_histogram,
    _proposal_q,
    _sample_cdf,
    _variant_distribution,
    choose_block_size,
)
from mcmc_colorer_tpu.ops.neighbor import occupancy_matrix
from mcmc_colorer_tpu.utils import rng as rngu


@dataclass(frozen=True)
class AnnealConfig:
    """Pooled ε-annealing: if the pooled mean conflict count improves by
    less than ``tol`` for ``window`` consecutive sweeps, multiply ε by
    ``boost`` (capped so (nCol−1)·ε stays well below 1)."""

    enabled: bool = False
    tol: float = 0.01
    window: int = 10
    boost: float = 4.0


class ShardedMCMCColorer:
    """MCMC ensemble over a 2D ``(chains, shards)`` mesh."""

    def __init__(
        self,
        graph: Graph,
        params: MCMCParams,
        mesh: Mesh,
        n_chains: int | None = None,
        anneal: AnnealConfig | None = None,
        block_size: int | None = None,
        backend: str = "auto",
    ) -> None:
        if params.hastings:
            raise NotImplementedError(
                "Metropolis-Hastings acceptance is single-chip only for now"
            )
        if backend == "auto":
            backend = (
                "pallas"
                if jax.default_backend() not in ("cpu", "gpu")
                else "xla"
            )
        self.backend = backend
        self.graph = graph
        self.params = params
        self.mesh = mesh
        mc = mesh.shape["chains"]
        ms = mesh.shape["shards"]
        self.n_chains = n_chains or mc
        if self.n_chains % mc:
            raise ValueError("n_chains must be a multiple of the chains axis")
        cl = self.n_chains // mc
        self.anneal = anneal or AnnealConfig()
        # size the per-shard slice so every shard owns real vertices
        # (naively padding to shards*block can leave whole shards with
        # nothing but phantom padding on small graphs)
        per_shard = -(-graph.n // ms)
        per_shard = ((per_shard + 127) // 128) * 128
        self.block = min(
            block_size
            or choose_block_size(graph.n, params.n_colors * cl),
            per_shard,
        )
        n_loc = ((per_shard + self.block - 1) // self.block) * self.block
        from mcmc_colorer_tpu.graph.container import degree_pad_for

        self.ell = graph.to_ell(
            pad_nodes_to=ms * n_loc,
            pad_degree_to=degree_pad_for(graph, backend),
        )
        self._n_pad = self.ell.n_pad
        self._jit_run = jax.jit(
            partial(
                _run_sharded,
                mesh=mesh,
                params=params,
                block=self.block,
                chains_per_dev=cl,
                anneal=self.anneal,
                n_nodes=graph.n,
                backend=backend,
            ),
            static_argnames=(),
        )

    def run(self, seed: int, repetition: int = 0):
        """Returns (best Coloring [tailcut applied if configured],
        per-chain summaries)."""
        root = rngu.for_repetition(rngu.root_key(seed), repetition)
        keys = jax.vmap(lambda c: rngu.for_chain(root, c))(
            jnp.arange(self.n_chains, dtype=jnp.uint32)
        )
        keys = jax.device_put(keys, NamedSharding(self.mesh, P("chains")))
        neighbors = jax.device_put(
            self.ell.neighbors, NamedSharding(self.mesh, P("shards", None))
        )
        t0 = time.perf_counter()
        colors, rip, conflicts, traces, eps_scale = self._jit_run(
            neighbors, keys
        )
        colors = np.asarray(jax.device_get(colors))[:, : self.graph.n]
        conflicts = np.array(conflicts, copy=True)
        dur = (time.perf_counter() - t0) * 1e3

        stds = np.array(
            [
                np.bincount(c, minlength=self.params.n_colors).std()
                for c in colors
            ]
        )
        order = np.lexsort((stds, conflicts))
        best = int(order[0])
        z = self.params.tailcut_threshold(self.graph.n)
        best_colors = colors[best]
        tc_rounds = 0
        if self.params.tailcut and conflicts[best] > 0:
            # tail-cutting on the best chain via the single-chip machinery
            from mcmc_colorer_tpu.models.mcmc import (
                _conflict_edges,
                _tailcut,
            )

            ell = self.graph.to_ell(pad_nodes_to=self.block)
            pad = np.full(ell.n_pad, self.params.n_colors, np.int32)
            pad[: self.graph.n] = best_colors
            cols = jnp.asarray(pad)
            conf = _conflict_edges(ell, cols)
            cols, conf, tcr = jax.jit(
                partial(_tailcut, params=self.params, block=self.block)
            )(ell, cols, conf, rngu.for_iteration(root, 999_999))
            best_colors = np.asarray(cols)[: self.graph.n]
            conflicts[best] = int(conf)
            tc_rounds = int(tcr)

        summaries = [
            {
                "chain": int(i),
                "conflicts": int(conflicts[i]),
                "class_std": float(stds[i]),
            }
            for i in range(self.n_chains)
        ]
        coloring = Coloring(
            colors=best_colors,
            n_colors=self.params.n_colors,
            iterations=int(rip),
            converged=int(conflicts[best]) <= max(z, 0),
            duration_ms=dur,
            conflict_trace=np.asarray(traces[best])[: int(rip) + 1],
            extra={
                "final_conflicts": int(conflicts[best]),
                "max_iter_reached": int(rip) >= self.params.max_iterations,
                "best_chain": best,
                "n_chains": self.n_chains,
                "tailcut_rounds": tc_rounds,
                "final_eps_scale": float(eps_scale),
            },
        )
        return coloring, summaries


# ------------------------------ shard_map body -----------------------------


def _run_sharded(
    neighbors,  # [n_pad, d_pad] sharded P('shards', None)
    keys,       # [C] sharded P('chains')
    *,
    mesh: Mesh,
    params: MCMCParams,
    block: int,
    chains_per_dev: int,
    anneal: AnnealConfig,
    n_nodes: int,
    backend: str = "xla",
):
    n_pad, d_pad = neighbors.shape
    ms = mesh.shape["shards"]
    n_loc = n_pad // ms
    cl = chains_per_dev
    n_colors = params.n_colors
    z = jnp.int32(params.tailcut_threshold(n_nodes))
    eps_cap = 0.4 / max(n_colors - 1, 1)

    def body_fn(neigh_loc, keys_loc):
        shard_id = jax.lax.axis_index("shards")
        offset = shard_id.astype(jnp.int32) * jnp.int32(n_loc)
        self_gids = offset + jnp.arange(n_loc, dtype=jnp.int32)
        real_loc = self_gids < jnp.int32(n_nodes)
        full_real = jnp.arange(n_pad, dtype=jnp.int32) < jnp.int32(n_nodes)

        def init_chain(key):
            k_init, k_loop = jax.random.split(key)
            u = jax.random.uniform(k_init, (n_pad,), dtype=jnp.float32)
            cols = jnp.minimum(
                (u * n_colors).astype(jnp.int32), n_colors - 1
            )
            return jnp.where(full_real, cols, jnp.int32(n_colors)), k_loop

        colors0, loop_keys = jax.vmap(init_chain)(keys_loc)  # [cl, n_pad]

        def conflicts_of(colors_full):
            """Per-chain global conflict-edge count: local rows counted with
            the neigh > global-id dedup, then psum over shards."""

            def one(cf):
                cf_ext = jnp.concatenate(
                    [cf, jnp.full((1,), -1, jnp.int32)]
                )
                nc = jnp.take(cf_ext, neigh_loc, axis=0)
                own = jnp.take(cf, jnp.clip(self_gids, 0, n_pad - 1))
                same = (nc == own[:, None]) & (
                    neigh_loc > self_gids[:, None]
                )
                return jnp.sum(same, dtype=jnp.int32)

            local = jax.vmap(one)(colors_full)  # [cl]
            return jax.lax.psum(local, "shards")

        conflicts0 = conflicts_of(colors0)
        taboo0 = jnp.zeros((cl, n_loc), jnp.int32)
        trace0 = jnp.full(
            (cl, params.max_iterations + 1), -1, jnp.int32
        )
        trace0 = trace0.at[:, 0].set(conflicts0)
        undone0 = jax.lax.psum(
            jnp.sum((conflicts0 > z).astype(jnp.int32)), "chains"
        )

        def cond(carry):
            (_, _, _, rip, conflicts, _, undone, *_a) = carry
            return (undone > 0) & (rip < jnp.int32(params.max_iterations))

        def loop_body(carry):
            (
                colors_full,
                taboo,
                ks,
                rip,
                conflicts,
                trace,
                undone,
                eps_scale,
                prev_pooled,
                stall,
            ) = carry
            active = conflicts > z  # [cl]
            eps_eff = jnp.minimum(
                jnp.float32(params.epsilon) * eps_scale, eps_cap
            )

            def chain_sweep(cf, tb, key):
                key, ku = jax.random.split(key)
                u_loc = jax.random.uniform(
                    jax.random.fold_in(ku, shard_id),
                    (n_loc,),
                    dtype=jnp.float32,
                )
                if _needs_histogram(params):
                    hist = (
                        jnp.zeros((n_colors,), jnp.int32)
                        .at[jnp.where(full_real, cf, n_colors)]
                        .add(1, mode="drop")
                    )
                else:
                    hist = None
                p_eff = _variant_distribution(params, hist, n_nodes)
                cf_ext = jnp.concatenate(
                    [cf, jnp.full((1,), -1, jnp.int32)]
                )
                cur_loc = jnp.take(cf, jnp.clip(self_gids, 0, n_pad - 1))

                if backend == "pallas":
                    from mcmc_colorer_tpu.ops.pallas_resample import (
                        pallas_sweep,
                    )

                    nc_loc = jnp.take(cf_ext, neigh_loc, axis=0)
                    p_eff_arr = (
                        p_eff
                        if p_eff is not None
                        else jnp.zeros((n_colors,), jnp.float32)
                    )
                    star, _q, new_tb, _c = pallas_sweep(
                        nc_loc,
                        neigh_loc,
                        cur_loc,
                        tb,
                        u_loc,
                        p_eff_arr,
                        eps_eff,
                        params=params,
                        block=min(block, 128),
                        self_ids=self_gids,
                    )
                    star = jnp.where(real_loc, star, cur_loc)
                    new_tb = jnp.where(real_loc, new_tb, 0)
                    return star, new_tb, key

                n_blocks = n_loc // block

                def block_fn(xs):
                    nb, cur_b, tb_b, u_b, real_b = xs
                    nc = jnp.take(cf_ext, nb, axis=0)
                    occ = occupancy_matrix(nc, n_colors)
                    q = _proposal_q(cur_b, occ, params, p_eff, eps_eff)
                    chosen = _sample_cdf(q, u_b)
                    t_act = tb_b > 0
                    chosen = jnp.where(t_act, cur_b, chosen)
                    new_tb = jnp.where(
                        t_act,
                        tb_b - 1,
                        jnp.where(
                            chosen == cur_b,
                            jnp.int32(params.taboo_iterations),
                            0,
                        ),
                    )
                    chosen = jnp.where(real_b, chosen, cur_b)
                    return chosen, new_tb

                xs = (
                    neigh_loc.reshape(n_blocks, block, d_pad),
                    cur_loc.reshape(n_blocks, block),
                    tb.reshape(n_blocks, block),
                    u_loc.reshape(n_blocks, block),
                    real_loc.reshape(n_blocks, block),
                )
                star_b, tb_b = jax.lax.map(block_fn, xs)
                return star_b.reshape(n_loc), tb_b.reshape(n_loc), key

            # python loop over the per-device chains (cl is small & static;
            # avoids vmap-of-pallas_call)
            stars, taboos, keys_out = [], [], []
            for c in range(cl):
                s, t, k = chain_sweep(colors_full[c], taboo[c], ks[c])
                stars.append(s)
                taboos.append(t)
                keys_out.append(k)
            star_loc = jnp.stack(stars)
            new_taboo = jnp.stack(taboos)
            new_keys = jnp.stack(keys_out)
            # halo exchange: owned slices -> full coloring on every shard
            star_full = jax.lax.all_gather(
                star_loc, "shards", axis=1, tiled=True
            )
            conflicts_star = conflicts_of(star_full)
            # freeze finished chains
            colors_next = jnp.where(
                active[:, None], star_full, colors_full
            )
            taboo_next = jnp.where(active[:, None], new_taboo, taboo)
            conflicts_next = jnp.where(active, conflicts_star, conflicts)
            rip = rip + 1
            trace = trace.at[:, rip].set(conflicts_next)
            undone = jax.lax.psum(
                jnp.sum((conflicts_next > z).astype(jnp.int32)), "chains"
            )
            # pooled annealing
            if anneal.enabled:
                pooled = (
                    jax.lax.psum(
                        jnp.sum(conflicts_next.astype(jnp.float32)),
                        "chains",
                    )
                    / jnp.float32(cl * mesh.shape["chains"])
                )
                rel = (prev_pooled - pooled) / jnp.maximum(prev_pooled, 1.0)
                stalled = rel < jnp.float32(anneal.tol)
                stall = jnp.where(stalled, stall + 1, 0)
                do_boost = stall >= jnp.int32(anneal.window)
                eps_scale = jnp.where(
                    do_boost, eps_scale * jnp.float32(anneal.boost), eps_scale
                )
                stall = jnp.where(do_boost, 0, stall)
                prev_pooled = pooled
            return (
                colors_next,
                taboo_next,
                new_keys,
                rip,
                conflicts_next,
                trace,
                undone,
                eps_scale,
                prev_pooled,
                stall,
            )

        init = (
            colors0,
            taboo0,
            loop_keys,
            jnp.int32(0),
            conflicts0,
            trace0,
            undone0,
            jnp.float32(1.0),
            jnp.float32(1e30),
            jnp.int32(0),
        )
        (
            colors_full,
            _taboo,
            _ks,
            rip,
            conflicts,
            trace,
            _undone,
            eps_scale,
            _pp,
            _st,
        ) = jax.lax.while_loop(cond, loop_body, init)
        return colors_full, rip, conflicts, trace, eps_scale

    mapped = jax.shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P("shards", None), P("chains")),
        out_specs=(
            P("chains", None),
            P(),
            P("chains"),
            P("chains", None),
            P(),
        ),
        check_vma=False,
    )
    return mapped(neighbors, keys)
