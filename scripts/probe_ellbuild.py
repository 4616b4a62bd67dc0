"""Measure the O(2m+n) device-side ELL build (ops/ell_build.py) against
the host-rectangle upload on the real chip, at VERDICT r4 item 2's
target config: an imported-style BA(100k, 16) skewed-degree graph.
Reference H2D boundary being matched: graphGPU.cu:211-226."""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    from mcmc_colorer_tpu.utils import compcache
    compcache.enable()
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    g1 = barabasi_albert(100_000, 16, seed=4)
    g2 = barabasi_albert(100_000, 16, seed=4)
    log("BA graph: n", g1.n, "m", g1.n_edges, "maxdeg", g1.max_degree)
    t0 = time.perf_counter()
    float(jax.jit(lambda: jax.numpy.zeros(()))())
    log("warmup:", round(time.perf_counter() - t0, 2), "s")

    stats: dict = {}
    t0 = time.perf_counter()
    e_dev = g1.to_ell(pad_nodes_to=128, device_build=True, build_stats=stats)
    dev_total = time.perf_counter() - t0
    log("device build:", json.dumps(stats), "total", round(dev_total, 2), "s")

    t0 = time.perf_counter()
    e_host = g2.to_ell(pad_nodes_to=128, device_build=False)
    np.asarray(e_host.neighbors[:1, :1])
    host_total = time.perf_counter() - t0
    rect_bytes = e_host.neighbors.size * 4
    log(
        "host rectangle:", round(host_total, 2), "s upload of",
        round(rect_bytes / 1e6, 1), "MB",
    )
    log(
        "bytes ratio:", round(rect_bytes / stats["upload_bytes"], 1),
        "x; wall ratio:", round(host_total / dev_total, 1), "x",
    )
    eq = bool(jax.jit(lambda a, b: (a == b).all())(e_dev.neighbors, e_host.neighbors))
    log("bit-equal on TPU:", eq)
    assert eq
    out = {
        "n": g1.n, "m": g1.n_edges, "maxdeg": g1.max_degree,
        "device_build": stats, "device_total_s": round(dev_total, 2),
        "host_rect_s": round(host_total, 2),
        "host_rect_bytes": rect_bytes,
        "bytes_ratio": round(rect_bytes / stats["upload_bytes"], 1),
        "wall_ratio": round(host_total / dev_total, 1),
        "bit_equal": eq,
    }
    with open("/root/repo/docs/ellbuild_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote docs/ellbuild_probe.json")


if __name__ == "__main__":
    main()
