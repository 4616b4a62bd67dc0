"""On-chip TTS: resident frontier (active) vs resident full sweeps at a
tight-palette config (VERDICT r4 item 3 'done' criterion — PERF.md
showed ~2x headroom for the active chain at the reference-hard config).
Writes docs/resident_active_probe.json."""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    from mcmc_colorer_tpu.utils import compcache
    compcache.enable()
    t0 = time.perf_counter()
    float(jax.jit(lambda: jax.numpy.zeros(()))())
    log("warmup:", round(time.perf_counter() - t0, 1), "s")

    from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
    from mcmc_colorer_tpu.models.base import check_coloring
    from mcmc_colorer_tpu.models.mcmc_resident import ResidentMCMCColorer

    n, p, seed = 100_000, 0.01, 0
    c0 = ResidentMCMCColorer(n, p, graph_seed=seed)
    out = {"n": n, "p": p, "maxdeg": c0.max_degree,
           "gen_s": round(c0.gen_seconds, 2), "cells": {}}
    log(f"graph: n={n} m={c0.n_edges} maxdeg={c0.max_degree} "
        f"gen={c0.gen_seconds:.1f}s")

    # the frontier mode wins when the chain is LONG (its per-iteration
    # cost tracks the decaying frontier, the full matmul sweep's does
    # not) — scan palette tightness to locate and record the crossover
    for denom_name, n_col in (
        ("maxdeg_2_3", max(4, c0.max_degree * 2 // 3)),
        ("maxdeg_1_2", max(4, c0.max_degree // 2)),
        ("maxdeg_2_5", max(4, c0.max_degree * 2 // 5)),
    ):
        params = MCMCParams(
            n_colors=n_col,
            proposal=ProposalKind.BALANCE_DYNAMIC,
            tailcut=True,
            max_iterations=300,
        )
        cell = {"n_colors": n_col}
        for mode, active in (("full", False), ("active", True)):
            col = ResidentMCMCColorer(
                n, p, graph_seed=seed, params=params, active=active
            )  # adjacency comes from the single-slot cache — no regen
            col.run(seed=100)  # throwaway: amortizes compiles
            times, iters, tcs = [], [], []
            for s in (5, 6):
                t0 = time.perf_counter()
                r = col.run(seed=s)
                times.append(time.perf_counter() - t0)
                iters.append(r.iterations)
                tcs.append(r.extra["tailcut_rounds"])
                assert r.extra["final_conflicts"] == 0, (mode, s)
            cell[mode] = {
                "chain_s_best": round(min(times), 2),
                "chain_s": [round(t, 2) for t in times],
                "iterations": iters,
                "tailcut_rounds": tcs,
            }
            log(f"{denom_name} {mode}: {cell[mode]}")
        cell["speedup_active_vs_full"] = round(
            cell["full"]["chain_s_best"]
            / cell["active"]["chain_s_best"], 2
        )
        out["cells"][denom_name] = cell
        log(f"{denom_name} speedup: {cell['speedup_active_vs_full']}")

    # validate one active coloring against the host re-derivation
    params_v = MCMCParams(
        n_colors=max(4, c0.max_degree // 2),
        proposal=ProposalKind.BALANCE_DYNAMIC,
        tailcut=True,
        max_iterations=300,
    )
    col = ResidentMCMCColorer(
        n, p, graph_seed=seed, params=params_v, active=True
    )
    r = col.run(seed=5)
    g = col.host_graph()
    out["active_valid"] = bool(check_coloring(g, r.colors))
    assert out["active_valid"]
    log("valid:", out["active_valid"])
    with open("/root/repo/docs/resident_active_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote docs/resident_active_probe.json")


if __name__ == "__main__":
    main()
