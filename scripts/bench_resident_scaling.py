"""Resident-path scaling on the real chip: time-to-solution vs n.

For each n at the bench density (p=0.01), the hash-defined graph is
materialised ON the device (zero upload), the full balance-dynamic
chain runs to a valid coloring with tailcut, and the coloring is
verified against the host re-derivation of the same edge set.  Records
device generation seconds, chain seconds, steady sweep rate, and
validity — the scaling evidence behind PERF.md's round-4 resident
section.  The upper bound is the packed-adjacency HBM cap
(n_pad <= 286,720).

Usage (real TPU): MCMC_COLORER_COMPILE_CACHE=1 python \
    scripts/bench_resident_scaling.py [--out docs/resident_scaling.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def one_point(n: int, p: float, seed: int, sweeps: int = 10) -> dict:
    from mcmc_colorer_tpu.models.base import check_coloring
    from mcmc_colorer_tpu.models.mcmc import (
        _sweep_matmul,
        _variant_distribution,
        color_histogram,
    )
    from mcmc_colorer_tpu.models.mcmc_resident import ResidentMCMCColorer

    colorer = ResidentMCMCColorer(n, p, graph_seed=seed)
    params, ell, adj, block = (
        colorer.params, colorer.ell, colorer.adj, colorer.block,
    )
    n_pad = ell.n_pad

    @jax.jit
    def run_k(ell, adj, colors, taboo, key):
        def body(carry, it):
            colors, taboo, key = carry
            key, ku = jax.random.split(key)
            unif = jax.random.uniform(ku, (n_pad,), dtype=jnp.float32)
            hist = color_histogram(colors, params.n_colors, ell.node_mask)
            p_eff = _variant_distribution(params, hist, ell.n_nodes)
            star, taboo, _, conf, _nc = _sweep_matmul(
                ell, adj, params, block, colors, taboo, unif, p_eff
            )
            return (star, taboo, key), conf

        state, confl = jax.lax.scan(
            body, (colors, taboo, key), jnp.arange(sweeps)
        )
        return state[0], state[1], confl

    key = jax.random.key(1)
    colors0 = jnp.where(
        ell.node_mask,
        jax.random.randint(key, (n_pad,), 0, params.n_colors, jnp.int32),
        jnp.int32(params.n_colors),
    )
    taboo0 = jnp.zeros((n_pad,), jnp.int32)
    o = run_k(ell, adj, colors0, taboo0, key)
    np.asarray(o[2])  # compile + warm
    t0 = time.perf_counter()
    o = run_k(ell, adj, colors0, taboo0, key)
    np.asarray(o[2])
    steady = time.perf_counter() - t0

    t0 = time.perf_counter()
    r = colorer.run(seed=5)
    run_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = colorer.host_graph()
    valid = bool(check_coloring(g, r.colors))
    verify_s = time.perf_counter() - t0
    return {
        "n": n,
        "m": colorer.n_edges,
        "max_degree": colorer.max_degree,
        "gen_s": round(colorer.gen_seconds, 2),
        "chain_s": round(run_s, 2),
        "tts_s": round(colorer.gen_seconds + run_s, 2),
        "iterations": r.iterations,
        "tailcut_rounds": r.extra["tailcut_rounds"],
        "updates_per_s": round(n * sweeps / steady),
        "valid": valid,
        "host_verify_s": round(verify_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/resident_scaling.json")
    ap.add_argument("--p", type=float, default=0.01)
    ap.add_argument(
        "--sizes", type=int, nargs="*",
        default=[25_000, 50_000, 100_000, 200_000],
    )
    args = ap.parse_args()
    from mcmc_colorer_tpu.utils import compcache

    compcache.enable()
    report = {
        "backend": jax.default_backend(),
        "p": args.p,
        "points": [],
    }
    for n in args.sizes:
        pt = one_point(n, args.p, seed=n)
        report["points"].append(pt)
        print(pt, flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("report →", args.out)


if __name__ == "__main__":
    main()
