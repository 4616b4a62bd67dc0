"""TPU batch: historical-config timing, ensemble-on-TPU, 1M-node attempt.

(a) reference's historical benchmark config (n=50000, p=0.001,
    testColoring_Benchmark.cu:60-69) — full vs active time-to-solution;
(b) 8-chain ensemble on the real chip (vmap-of-pallas validation);
(c) ER(1e6, 0.001) — BASELINE config 3 scale — guarded attempt.
"""

import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
from mcmc_colorer_tpu.graph.generate import erdos_renyi
from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.models.mcmc import MCMCColorer
from mcmc_colorer_tpu.models.mcmc_active import ActiveMCMCColorer


def stage_a():
    g = erdos_renyi(50_000, 0.001, seed=0)
    params = MCMCParams(
        n_colors=g.max_degree,
        proposal=ProposalKind.BALANCE_DYNAMIC,
        taboo_iterations=4,  # historical config taboo
        tailcut=True,
    )
    print(f"[a] n={g.n} m={g.n_edges} maxdeg={g.max_degree}", flush=True)
    for name, colorer in [
        ("full", MCMCColorer(g, params, backend="pallas")),
        (
            "active",
            ActiveMCMCColorer(g, params, min_bucket=2048, bucket_factor=8),
        ),
    ]:
        r = colorer.run(seed=1)  # compile
        t0 = time.perf_counter()
        r = colorer.run(seed=2)
        dt = time.perf_counter() - t0
        print(
            f"[a] {name}: {dt*1e3:.0f} ms, iters={r.iterations}, "
            f"conflicts={r.extra['final_conflicts']}, "
            f"valid={check_coloring(g, r.colors)}",
            flush=True,
        )


def stage_b():
    from mcmc_colorer_tpu.parallel.chains import EnsembleMCMCColorer

    g = erdos_renyi(20_000, 0.002, seed=1)
    params = MCMCParams(
        n_colors=g.max_degree, proposal=ProposalKind.BALANCE_DYNAMIC
    )
    ens = EnsembleMCMCColorer(g, params, n_chains=8)
    best, summaries = ens.run(seed=9)
    print(
        f"[b] ensemble on TPU: best chain {best.extra['best_chain']}, "
        f"conflicts={best.extra['final_conflicts']}, "
        f"valid={check_coloring(g, best.colors)}, "
        f"spread={[s['conflicts'] for s in summaries]}",
        flush=True,
    )


def stage_c():
    t0 = time.perf_counter()
    g = erdos_renyi(1_000_000, 0.001, seed=2)
    print(
        f"[c] generated n={g.n} m={g.n_edges} maxdeg={g.max_degree} "
        f"in {time.perf_counter()-t0:.0f}s",
        flush=True,
    )
    params = MCMCParams(
        n_colors=g.max_degree,
        proposal=ProposalKind.BALANCE_DYNAMIC,
        tailcut=True,
    )
    colorer = ActiveMCMCColorer(
        g, params, min_bucket=8192, bucket_factor=16
    )
    t0 = time.perf_counter()
    r = colorer.run(seed=3)
    dt = time.perf_counter() - t0
    print(
        f"[c] 1M nodes: {dt:.0f}s (incl. compile), iters={r.iterations}, "
        f"conflicts={r.extra['final_conflicts']}, "
        f"used={r.used_colors}/{params.n_colors}, "
        f"BI={r.balance_index(0.001):.2f}, "
        f"valid={check_coloring(g, r.colors)}",
        flush=True,
    )


if __name__ == "__main__":
    for stage in (stage_a, stage_b, stage_c):
        try:
            stage()
        except Exception as e:
            print(f"{stage.__name__} FAILED: {type(e).__name__}: {e}",
                  flush=True)
