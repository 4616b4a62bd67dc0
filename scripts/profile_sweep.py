"""Break down the resample-sweep pipeline cost on the real chip.

Times (1) the XLA neighbor-color gather, (2) the Pallas kernel on a
precomputed nc matrix, (3) the conflict-edge reduction, (4) the full sweep
— each as K repetitions inside one jit'd scan so tunnel latency amortises.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
from mcmc_colorer_tpu.graph.generate import erdos_renyi
from mcmc_colorer_tpu.models.mcmc import (
    _conflict_edges,
    _sweep_pallas,
    _variant_distribution,
    choose_block_size,
)
from mcmc_colorer_tpu.ops.neighbor import color_histogram, neighbor_colors
from mcmc_colorer_tpu.ops.pallas_resample import pallas_sweep

K = 10
N = 100_000
P = 0.01


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    out = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
    )
    run_s = time.perf_counter() - t0
    print(
        f"{name}: {run_s*1e3/K:.1f} ms/iter (compile+first {compile_s:.1f}s)",
        flush=True,
    )
    return out


def main():
    g = erdos_renyi(N, P, seed=0)
    params = MCMCParams(
        n_colors=g.max_degree, proposal=ProposalKind.BALANCE_DYNAMIC
    )
    block = choose_block_size(g.n, params.n_colors)
    ell = g.to_ell(pad_nodes_to=block)
    print(
        f"n={g.n} d_pad={ell.d_pad} nCol={params.n_colors} block={block}",
        flush=True,
    )
    key = jax.random.key(0)
    colors = jnp.where(
        ell.node_mask,
        jax.random.randint(key, (ell.n_pad,), 0, params.n_colors, jnp.int32),
        jnp.int32(params.n_colors),
    )
    taboo = jnp.zeros((ell.n_pad,), jnp.int32)
    unif = jax.random.uniform(key, (ell.n_pad,), dtype=jnp.float32)

    @jax.jit
    def gather_k(ell, colors):
        def body(c, _):
            nc = neighbor_colors(ell.neighbors, c)
            # fold back to a color vector so the loop carries a dependency
            return jnp.min(nc, axis=1) % params.n_colors, None

        c, _ = jax.lax.scan(body, colors, None, length=K)
        return c

    timed("gather [n,d]", gather_k, ell, colors)

    nc0 = jax.jit(lambda e, c: neighbor_colors(e.neighbors, c))(ell, colors)
    hist = color_histogram(colors, params.n_colors, ell.node_mask)
    p_eff = _variant_distribution(params, hist, ell.n_nodes)

    @jax.jit
    def kernel_k(nc, colors, taboo, unif, p_eff):
        def body(carry, _):
            c, t = carry
            star, q, t2 = pallas_sweep(
                nc, c, t, unif, p_eff,
                jnp.float32(params.epsilon), params=params, block=256,
            )
            return (star, t2), None

        (c, t), _ = jax.lax.scan(body, (colors, taboo), None, length=K)
        return c

    timed("pallas kernel only", kernel_k, nc0, colors, taboo, unif, p_eff)

    @jax.jit
    def conflicts_k(ell, colors):
        def body(c, _):
            n = _conflict_edges(ell, c)
            return (c + n % 2).astype(jnp.int32) % params.n_colors, None

        c, _ = jax.lax.scan(body, colors, None, length=K)
        return c

    timed("conflict count", conflicts_k, ell, colors)

    @jax.jit
    def hist_k(colors):
        def body(c, _):
            h = color_histogram(c, params.n_colors, ell.node_mask)
            return (c + h[0] % 2).astype(jnp.int32), None

        c, _ = jax.lax.scan(body, colors, None, length=K)
        return c

    timed("histogram", hist_k, colors)

    @jax.jit
    def sweep_k(ell, colors, taboo):
        def body(carry, _):
            c, t = carry
            hist = color_histogram(c, params.n_colors, ell.node_mask)
            pe = _variant_distribution(params, hist, ell.n_nodes)
            star, t2, _ = _sweep_pallas(
                ell, params, block, c, t, unif, pe
            )
            return (star, t2), None

        (c, t), _ = jax.lax.scan(body, (colors, taboo), None, length=K)
        return c

    timed("full sweep", sweep_k, ell, colors, taboo)


if __name__ == "__main__":
    main()
