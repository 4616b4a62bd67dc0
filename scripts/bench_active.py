"""Time-to-solution comparison: full-sweep vs active-set chain on TPU.

Config: ER(100k, 0.01), nCol = maxDeg/2 (harder palette → more
iterations), balance-dynamic + tailcut — the regime the active-set design
targets.
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


def main():
    n, p = 100_000, 0.01
    g = erdos_renyi(n, p, seed=0)
    params = MCMCParams(
        n_colors=max(4, g.max_degree // 2),
        proposal=ProposalKind.BALANCE_DYNAMIC,
        tailcut=True,
    )
    print(
        f"n={g.n} m={g.n_edges} maxdeg={g.max_degree} nCol={params.n_colors}",
        flush=True,
    )

    act = ActiveMCMCColorer(g, params, min_bucket=2048, bucket_factor=8)
    r1 = act.run(seed=1)  # includes all compiles
    t0 = time.perf_counter()
    r1 = act.run(seed=2)
    t_act = time.perf_counter() - t0
    print(
        f"active: {t_act:.2f}s, iters={r1.iterations}, "
        f"conflicts={r1.extra['final_conflicts']}, "
        f"valid={check_coloring(g, r1.colors)}, trace={list(r1.conflict_trace[:8])}...",
        flush=True,
    )

    full = MCMCColorer(g, params, backend="pallas")
    r2 = full.run(seed=1)
    t0 = time.perf_counter()
    r2 = full.run(seed=2)
    t_full = time.perf_counter() - t0
    print(
        f"full:   {t_full:.2f}s, iters={r2.iterations}, "
        f"conflicts={r2.extra['final_conflicts']}, "
        f"valid={check_coloring(g, r2.colors)}",
        flush=True,
    )
    print(f"speedup: {t_full / max(t_act, 1e-9):.1f}x", flush=True)


if __name__ == "__main__":
    main()
