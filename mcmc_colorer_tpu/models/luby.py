"""Luby-inspired greedy MIS colorer.

Re-design of the reference's ``ColoringLuby`` (coloringLuby.cu) /
``run_fast`` (coloringLubyFast.cu): peel off maximal independent sets, one
per color.  The reference's fast variant drives its kernels from a parent
CUDA kernel via dynamic parallelism to avoid host round-trips
(coloringLubyFast.cu:51-107); here the entire nested loop lives in one
`jax.jit` as two nested `lax.while_loop`s — the exact TPU analogue
(SURVEY §2.3 item 4).

Conflict resolution among coin-flip-selected candidates is the
deterministic rendition of check_conflicts_k (coloringLuby.cu:269-276):
a selected node survives iff its degree exceeds that of every selected
neighbor (the reference's benign-racy rule removes a node when
``deg_i <= deg_j``, so the higher-degree endpoint survives and degree ties
eliminate both — reproduced here without the race, SURVEY §6
race-detection note).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_colorer_tpu.graph.container import EllGraph, Graph
from mcmc_colorer_tpu.models.base import Coloring
from mcmc_colorer_tpu.utils import rng as rngu


class LubyColorer:
    def __init__(self, graph: Graph) -> None:
        self.graph = graph
        self.ell = graph.to_ell()
        self._jit_run = jax.jit(_run_luby)

    def run(self, seed: int, repetition: int = 0) -> Coloring:
        key = rngu.for_repetition(rngu.root_key(seed), repetition)
        t0 = time.perf_counter()
        colors, n_colors = self._jit_run(self.ell, key)
        colors = np.asarray(jax.device_get(colors))[: self.graph.n]
        dur = (time.perf_counter() - t0) * 1e3
        n_colors = int(n_colors)
        return Coloring(
            colors=colors,
            n_colors=n_colors,
            iterations=n_colors,
            converged=True,
            duration_ms=dur,
        )


def _run_luby(ell: EllGraph, key):
    """Whole colorer on-device.  Colors are 0-based here (the reference's
    1-based convention with 0=uncolored, coloringLuby.cu:328-341, is
    normalised at the API boundary, SURVEY §8)."""
    n_pad = ell.n_pad
    node_ids = jnp.arange(n_pad, dtype=jnp.int32)
    real = ell.node_mask
    deg_ext = jnp.concatenate([ell.degrees, jnp.zeros((1,), jnp.int32)])
    neigh_degs = jnp.take(deg_ext, ell.neighbors, axis=0)  # [n_pad, d_pad]
    degs = ell.degrees

    def any_uncolored(colors):
        return jnp.any((colors < 0) & real)

    def outer_cond(carry):
        colors, n_colors, key = carry
        return any_uncolored(colors)

    def outer_body(carry):
        colors, n_colors, key = carry
        cands0 = (colors < 0) & real  # prune_eligible (coloringLuby.cu:223-228)
        is0 = jnp.zeros((n_pad,), jnp.bool_)

        def inner_cond(icarry):
            cands, is_set, key = icarry
            return jnp.any(cands)

        def inner_body(icarry):
            cands, is_set, key = icarry
            key, ku = jax.random.split(key)
            u = jax.random.uniform(ku, (n_pad,), dtype=jnp.float32)
            sel = cands & (u < 0.5)  # set_initial_distr_k coin flip
            sel_ext = jnp.concatenate([sel, jnp.zeros((1,), jnp.bool_)])
            neigh_sel = jnp.take(sel_ext, ell.neighbors, axis=0)
            # survive iff deg_i > deg_j for every selected neighbor j
            beaten = jnp.any(neigh_sel & (neigh_degs >= degs[:, None]), axis=1)
            surv = sel & ~beaten
            is_set = is_set | surv  # update_eligible_k accumulate
            surv_ext = jnp.concatenate([surv, jnp.zeros((1,), jnp.bool_)])
            near_surv = jnp.any(
                jnp.take(surv_ext, ell.neighbors, axis=0), axis=1
            )
            cands = cands & ~surv & ~near_surv
            return cands, is_set, key

        cands, is_set, key = jax.lax.while_loop(
            inner_cond, inner_body, (cands0, is0, key)
        )
        colors = jnp.where(is_set, n_colors, colors)
        return colors, n_colors + 1, key

    colors0 = jnp.where(real, jnp.int32(-1), jnp.int32(0))
    colors, n_colors, key = jax.lax.while_loop(
        outer_cond, outer_body, (colors0, jnp.int32(0), key)
    )
    return colors, n_colors
