"""Flat vs degree-bucketed ELL on skewed-degree (Barabási–Albert) graphs.

Measures steady-state resample-sweep time per layout and runs the
end-to-end bucketed chain.  At n=1e6 the flat rectangle would need
n·d_pad·4B ≈ tens of GB of HBM — more than the chip has — so only the
bucketed layout runs there (pass --flat to force the comparison anyway).

Usage: python scripts/bench_ba.py [--n 100000] [--m 16] [--iters 10] [--flat]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
from mcmc_colorer_tpu.graph.generate import barabasi_albert
from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.models.mcmc import (
    MCMCColorer,
    _needs_histogram,
    _sweep_pallas_fused_any,
    _variant_distribution,
)
from mcmc_colorer_tpu.ops.neighbor import color_histogram


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sweep_time(colorer, params, n_nodes, iters):
    ell = colorer.ell
    n_pad = ell.n_pad
    block = colorer.block

    @jax.jit
    def run_k(ell, colors, taboo, key):
        def body(carry, it):
            colors, taboo, key = carry
            key, ku = jax.random.split(key)
            unif = jax.random.uniform(ku, (n_pad,), dtype=jnp.float32)
            hist = color_histogram(colors, params.n_colors, ell.node_mask)
            p_eff = _variant_distribution(params, hist, n_nodes)
            star, taboo, _lq, conf = _sweep_pallas_fused_any(
                ell, params, block, colors, taboo, unif, p_eff
            )
            return (star, taboo, key), conf

        return jax.lax.scan(body, (colors, taboo, key), jnp.arange(iters))

    key = jax.random.key(1)
    colors = jnp.where(
        ell.node_mask,
        jax.random.randint(key, (n_pad,), 0, params.n_colors, jnp.int32),
        jnp.int32(params.n_colors),
    )
    taboo = jnp.zeros((n_pad,), jnp.int32)
    t0 = time.perf_counter()
    _, confl = run_k(ell, colors, taboo, key)
    np.asarray(confl)
    cold = time.perf_counter() - t0
    null = jax.jit(lambda: jnp.zeros(()))
    float(null())
    t0 = time.perf_counter()
    for _ in range(3):
        float(null())
    rt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    _, confl = run_k(ell, colors, taboo, key)
    np.asarray(confl)
    return max(1e-9, time.perf_counter() - t0 - rt) / iters, cold


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument(
        "--ncol",
        type=int,
        default=0,
        help="palette size; default min(maxdeg, 1024).  The fused kernel's "
        "per-block color-axis temporaries live in VMEM, which bounds the "
        "palette at ~3k colors per 128-row block — plenty for power-law "
        "graphs whose chromatic number is far below maxdeg",
    )
    args = ap.parse_args()

    t0 = time.perf_counter()
    g = barabasi_albert(args.n, args.m, seed=args.seed)
    log(
        f"graph n={g.n} m={g.n_edges} maxdeg={g.max_degree} "
        f"({time.perf_counter()-t0:.2f}s to generate)"
    )
    params = MCMCParams(
        n_colors=args.ncol or min(g.max_degree, 1024),
        proposal=ProposalKind.BALANCE_DYNAMIC,
        tailcut=True,
    )
    log(f"nCol={params.n_colors}")
    buck = MCMCColorer(g, params, layout="bucketed")
    log(
        "buckets: "
        + str([(s.h_pad, s.d_pad) for s in buck.ell.slices])
        + f" gather={buck.ell.gather_elements/1e6:.1f}M"
    )
    tb, cb = sweep_time(buck, params, g.n, args.iters)
    log(f"bucketed: {tb*1e3:.0f} ms/iter (cold {cb:.0f}s)")
    if args.flat:
        flat = MCMCColorer(g, params, layout="flat")
        log(f"flat gather={flat.ell.neighbors.size/1e6:.0f}M")
        tf, cf = sweep_time(flat, params, g.n, args.iters)
        log(f"flat:     {tf*1e3:.0f} ms/iter (cold {cf:.0f}s)")
        log(f"speedup {tf/tb:.1f}x")

    t0 = time.perf_counter()
    r = buck.run(seed=3)
    ok = check_coloring(g, r.colors)
    log(
        f"end-to-end bucketed chain: conflicts="
        f"{r.extra['final_conflicts']} iters={r.iterations} valid={ok} "
        f"wall={time.perf_counter()-t0:.1f}s"
    )


if __name__ == "__main__":
    main()
