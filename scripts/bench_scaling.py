"""Sharded-path scaling validation + modeled multi-chip efficiency.

On this machine only ONE real TPU chip exists; the 8-device mesh is
virtual (all shards share the host CPU), so wall-clock weak-scaling is not
measurable — virtual shards add total work on fixed silicon.  This script
therefore validates what CAN be validated here:

1. the sharded chain executes correctly at 1/2/4/8 shards and its results
   are quality-equivalent across shard counts;
2. the modeled per-chip cost breakdown (gather-bound compute vs
   all_gather communication) that determines real-hardware weak scaling.

Model: per sweep per chip, compute ≈ (n/S)·d_pad / 133e6 s (the measured
gather throughput, PERF.md) and communication ≈ 4·n bytes over ICI
(~45 GB/s/link on v5e).  Efficiency = compute / (compute + comm).

Usage: python scripts/bench_scaling.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import numpy as np

from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
from mcmc_colorer_tpu.graph.generate import erdos_renyi
from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.parallel.mesh import make_mesh
from mcmc_colorer_tpu.parallel.sharded import ShardedMCMCColorer

GATHER_RATE = 133e6      # measured elems/s (PERF.md)
ICI_BW = 45e9            # bytes/s per v5e link (public figure)


def validate_correctness():
    g = erdos_renyi(4000, 0.02, seed=7)
    params = MCMCParams(
        n_colors=g.max_degree,
        proposal=ProposalKind.BALANCE_DYNAMIC,
        tailcut=True,
    )
    stats = {}
    for shards in (1, 2, 4, 8):
        mesh = make_mesh(
            chains=1, shards=shards, devices=jax.devices()[:shards]
        )
        best, _ = ShardedMCMCColorer(g, params, mesh, n_chains=1).run(seed=3)
        ok = check_coloring(g, best.colors)
        stats[shards] = (ok, best.used_colors, best.class_stats()["std"])
        print(
            f"shards={shards}: valid={ok} used={best.used_colors} "
            f"class_std={best.class_stats()['std']:.2f}",
            flush=True,
        )
    used = [v[1] for v in stats.values()]
    assert all(v[0] for v in stats.values()), "invalid coloring"
    assert max(used) - min(used) <= 0.1 * max(used), (
        "quality drifts with shard count"
    )
    print("correctness across shard counts: OK")


def model_efficiency(n=1_000_000, d=1150):
    """Per-sweep cost model, both sharded backends.  Collective volume is
    the HLO-verified n·4 bytes/chip/sweep (scripts/collective_volume.py:
    measured/model ratio 1.00); compute is the measured gather wall
    (gather backend) or the bit-matmul HBM stream (strip backend,
    bench_packed r3: 0.92 n²/80e9 s per full matrix read, n_c color
    windows)."""
    n_c = max(1, -(-((d + 127) // 128 * 128) // 1024))  # color windows
    print(f"\nmodeled per-sweep cost at n={n}, d_pad={d} (n_c={n_c}):")
    for s in (1, 2, 4, 8, 16, 32, 64):
        comm = 4.0 * n / ICI_BW if s > 1 else 0.0
        gather = (n / s) * d / GATHER_RATE
        strip = 0.92 * n_c * (n / s) * n / 8 / 80e9
        eff_g = gather / (gather + comm)
        eff_m = strip / (strip + comm)
        strip_gb = n / s * n / 8 / 1e9
        print(
            f"  shards={s:>2}: gather {gather*1e3:8.1f} ms (eff {eff_g:.3f})"
            f" | strip-matmul {strip*1e3:8.1f} ms (eff {eff_m:.3f},"
            f" {strip_gb:6.1f} GB/chip) | all_gather {comm*1e3:5.2f} ms"
        )


if __name__ == "__main__":
    validate_correctness()
    model_efficiency()
