"""Probe: bit-packed adjacency sweeps (pallas bit-matmul) on the chip.

Times, at a given config, steady-state full-iteration sweeps through
``_sweep_matmul`` with (a) the dense int8 adjacency (round-2 backend,
skipped above its 102400-row cap) and (b) the bit-packed uint32
adjacency via the requested PACKED_NC_IMPL ('pallas' in-kernel unpack
or 'xla' chunked unpack).

Usage: python scripts/bench_packed.py [n] [p] [iters] [impl]
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def roundtrip_s():
    null = jax.jit(lambda: jnp.zeros(()))
    float(null())
    t0 = time.perf_counter()
    for _ in range(3):
        float(null())
    return (time.perf_counter() - t0) / 3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    impl = sys.argv[4] if len(sys.argv) > 4 else "pallas"

    from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
    from mcmc_colorer_tpu.graph.generate import erdos_renyi
    from mcmc_colorer_tpu.models.mcmc import (
        _sweep_matmul,
        _variant_distribution,
        choose_block_size,
    )
    from mcmc_colorer_tpu.ops import dense_adj as da
    from mcmc_colorer_tpu.ops.neighbor import color_histogram

    da.PACKED_NC_IMPL = impl
    log(f"backend={jax.default_backend()} impl={impl}")
    t0 = time.perf_counter()
    g = erdos_renyi(n, p, seed=0)
    log(
        f"graph: n={g.n} m={g.n_edges} maxdeg={g.max_degree} "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    params = MCMCParams(
        n_colors=g.max_degree, proposal=ProposalKind.BALANCE_DYNAMIC
    )
    block = choose_block_size(g.n, params.n_colors)
    ell = g.to_ell(pad_nodes_to=block)
    n_pad = ell.n_pad
    rt = roundtrip_s()
    log(f"n_pad={n_pad} nCol={params.n_colors} roundtrip {rt*1e3:.0f}ms")

    @partial(jax.jit, static_argnames=())
    def run_k(ell, adj, colors, taboo, key):
        def body(carry, _):
            colors, taboo, key = carry
            key, ku = jax.random.split(key)
            unif = jax.random.uniform(ku, (n_pad,), dtype=jnp.float32)
            hist = color_histogram(colors, params.n_colors, ell.node_mask)
            p_eff = _variant_distribution(params, hist, ell.n_nodes)
            star, taboo, _, conf, _nc = _sweep_matmul(
                ell, adj, params, block, colors, taboo, unif, p_eff
            )
            return (star, taboo, key), conf

        (colors, taboo, key), confl = jax.lax.scan(
            body, (colors, taboo, key), None, length=iters
        )
        return colors, taboo, confl

    key = jax.random.key(1)
    colors = jnp.where(
        ell.node_mask,
        jax.random.randint(key, (n_pad,), 0, params.n_colors, jnp.int32),
        jnp.int32(params.n_colors),
    )
    taboo = jnp.zeros((n_pad,), jnp.int32)

    def measure(name, adj):
        t0 = time.perf_counter()
        out = run_k(ell, adj, colors, taboo, key)
        tail = np.asarray(out[2])
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run_k(ell, adj, colors, taboo, key)
        tail = np.asarray(out[2])
        steady = max(1e-9, time.perf_counter() - t0 - rt)
        log(
            f"{name}: {iters} sweeps in {steady*1e3:.0f}ms -> "
            f"{steady/iters*1e3:.1f}ms/iter (first {t_first:.1f}s); "
            f"updates/s={g.n*iters/steady:,.0f}; tail {tail[-3:].tolist()}"
        )
        return steady / iters

    if n_pad <= da.DENSE_ADJ_MAX_N:
        t0 = time.perf_counter()
        adj_d = da.build_dense_adjacency_from_ell(ell)
        np.asarray(adj_d[:1, :1])
        log(f"dense A build {time.perf_counter()-t0:.1f}s "
            f"({adj_d.size/1e9:.1f} GB)")
        t_dense = measure("dense ", adj_d)
        del adj_d
    else:
        log("dense A skipped (over HBM cap)")
        t_dense = None

    t0 = time.perf_counter()
    adj_p = da.build_packed_adjacency_from_ell(ell)
    np.asarray(adj_p[:1, :1])
    log(
        f"packed A build {time.perf_counter()-t0:.1f}s "
        f"({adj_p.size*4/1e9:.2f} GB)"
    )
    t_packed = measure("packed", adj_p)
    if t_dense:
        log(f"packed/dense speedup: {t_dense/t_packed:.2f}x")
    try:
        st = jax.local_devices()[0].memory_stats()
        log(f"HBM peak: {st.get('peak_bytes_in_use', 0)/1e9:.1f} GB")
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()
