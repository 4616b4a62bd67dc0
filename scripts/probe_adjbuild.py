"""Probe: adjacency build strategies on the real chip.

Times the one-time dense/packed adjacency builds both ways — host edge
arrays scattered chunk-wise (round 2) vs scatter from the device-resident
ELL rectangle (round 3, no host transfer) — and cross-checks them via
per-row sums.  BENCH_r02 measured the host dense build at 151.5 s at
n=100k; this probe answers where that time goes and how much the ELL
build saves (feeds the backend='auto' amortization gate, VERDICT item 2).

Usage: python scripts/probe_adjbuild.py [n] [p]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01

    from mcmc_colorer_tpu.graph.generate import erdos_renyi
    from mcmc_colorer_tpu.ops import dense_adj as da

    log(f"backend={jax.default_backend()}")
    t0 = time.perf_counter()
    g = erdos_renyi(n, p, seed=0)
    log(
        f"graph: n={g.n} m={g.n_edges} maxdeg={g.max_degree} "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    ell = g.to_ell(pad_nodes_to=128)
    n_pad = ell.n_pad
    # materialise the ELL on device before timing anything
    np.asarray(ell.neighbors[:1, :1])
    log(f"n_pad={n_pad} d_pad={ell.neighbors.shape[1]}")

    def rowsums(a):
        if a.dtype == jnp.uint32:
            # popcount per word, summed per row
            x = a
            c = jnp.zeros(a.shape, jnp.int32)
            for s in range(32):
                c = c + ((x >> jnp.uint32(s)) & jnp.uint32(1)).astype(
                    jnp.int32
                )
            return jnp.sum(c, axis=1)
        return jnp.sum(a.astype(jnp.int32), axis=1)

    sums = {}

    def run(name, fn):
        t0 = time.perf_counter()
        a = fn()
        rs = np.asarray(jax.jit(rowsums)(a))
        dt = time.perf_counter() - t0
        sums[name] = rs
        log(f"{name}: {dt:.1f}s (nnz={int(rs.sum()):,})")
        del a

    run("dense/host", lambda: da.build_dense_adjacency(g, n_pad))
    run("dense/ell ", lambda: da.build_dense_adjacency_from_ell(ell))
    run("packed/host", lambda: da.build_packed_adjacency(g, n_pad))
    run("packed/ell ", lambda: da.build_packed_adjacency_from_ell(ell))
    ok = (
        np.array_equal(sums["dense/host"], sums["dense/ell "])
        and np.array_equal(sums["packed/host"], sums["packed/ell "])
        and np.array_equal(sums["dense/host"], sums["packed/host"])
    )
    log(f"row-sum cross-check: {'OK' if ok else 'MISMATCH'}")
    try:
        st = jax.local_devices()[0].memory_stats()
        log(f"HBM peak: {st.get('peak_bytes_in_use', 0)/1e9:.1f} GB")
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()
