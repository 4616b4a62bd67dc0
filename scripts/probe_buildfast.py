"""Probe: can the one-time packed-adjacency build beat the 59.7 s
chunked scatter measured cold at ER(100k)?  (BENCH_r04 phase split)

Candidates, all building the same [n_pad, words] uint32 bit matrix:
  scatter        — current build (ops/dense_adj.py, pack_ell_rows)
  scatter-sorted — same, but ELL rows sorted per row so the chunk's flat
                   indices are globally ascending + indices_are_sorted
  compare        — scatter-free: per row-chunk and 4096-column window,
                   bits[r, jl] = sum_d (neigh[r,d] == W+jl) on the VPU,
                   folded to uint32 words by the pack_ell_rows shift-sum

Cross-checked via per-row popcounts against the scatter build.

Usage: python scripts/probe_buildfast.py [n] [p]
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


def rows_popcount(a):
    return np.asarray(
        jax.jit(
            lambda x: jnp.sum(
                jax.lax.population_count(x).astype(jnp.int32), axis=1
            )
        )(a)
    )


def build_compare(ell, n_pad, chunk_rows=2048):
    """Scatter-free build: compare each row chunk's ELL lanes against
    each 4096-column window (VPU), fold bits to words."""
    from mcmc_colorer_tpu.ops.dense_adj import (
        PACKED_K_CHUNK,
        packed_adj_words,
    )

    words = packed_adj_words(n_pad)
    n_windows = words // 128
    d_pad = ell.neighbors.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]

    def chunk_fn(neigh):
        # [rows, d_pad] -> [rows, words] uint32
        def win(w, acc):
            base = w * PACKED_K_CHUNK
            cols = base + jnp.arange(PACKED_K_CHUNK, dtype=jnp.int32)
            bits = jnp.sum(
                (neigh[:, :, None] == cols[None, None, :]).astype(jnp.int8),
                axis=1,
            )  # [rows, 4096]
            zw = bits.reshape(-1, 1, 32, 128).astype(jnp.uint32)
            wd = jnp.sum(zw << shifts, axis=2, dtype=jnp.uint32)
            return jax.lax.dynamic_update_slice(
                acc, wd.reshape(-1, 128), (0, w * 128)
            )

        acc = jnp.zeros((neigh.shape[0], words), jnp.uint32)
        return jax.lax.fori_loop(0, n_windows, win, acc)

    jitted = jax.jit(chunk_fn)
    out = []
    for r0 in range(0, n_pad, chunk_rows):
        neigh = jax.lax.dynamic_slice(
            ell.neighbors, (r0, 0), (chunk_rows, d_pad)
        )
        out.append(jitted(neigh))
    a = jnp.concatenate(out, axis=0)
    np.asarray(a[:1, :1])
    return a


def build_scatter_sorted(ell, n_pad, n_real):
    """Current chunked scatter but on per-row-sorted lanes with
    indices_are_sorted=True.  To keep the chunk's flat indices GLOBALLY
    ascending, sentinels clamp to each row's own last column
    (k_total-1) — a phantom column whenever n_real < k_total — and that
    single bit is cleared afterwards in one elementwise pass."""
    from mcmc_colorer_tpu.ops.dense_adj import (
        _row_chunking,
        packed_adj_words,
        packed_bit_coords,
    )

    words = packed_adj_words(n_pad)
    k_total = words * 32
    assert n_real < k_total, "no phantom column to absorb sentinels"
    neigh_sorted = jax.jit(lambda x: jnp.sort(x, axis=1))(ell.neighbors)
    np.asarray(neigh_sorted[:1, :1])
    t_sort = time.perf_counter()
    n_chunks = _row_chunking(n_pad, k_total, k_total * 5, 1536 * 1024**2)
    chunk = n_pad // n_chunks
    d_pad = neigh_sorted.shape[1]
    n_k = words // 128
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]

    def insert_rows(a, neigh, r0):
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, d_pad), 0)
        col = jnp.minimum(neigh, jnp.int32(k_total - 1))
        flat = (rows * jnp.int32(k_total) + col).reshape(-1)
        z = jnp.zeros((chunk * k_total,), jnp.int8)
        z = z.at[flat].set(jnp.int8(1), indices_are_sorted=True)
        zw = z.reshape(chunk, n_k, 32, 128).astype(jnp.uint32)
        packed = jnp.sum(zw << shifts, axis=2, dtype=jnp.uint32).reshape(
            chunk, words
        )
        return jax.lax.dynamic_update_slice(a, packed, (r0, 0))

    jitted = jax.jit(insert_rows, donate_argnums=(0,))
    a = jnp.zeros((n_pad, words), jnp.uint32)
    for c in range(n_chunks):
        neigh = jax.lax.dynamic_slice(
            neigh_sorted, (c * chunk, 0), (chunk, d_pad)
        )
        a = jitted(a, neigh, jnp.int32(c * chunk))
    # clear the sentinel bit (phantom column k_total-1) everywhere
    w_s, b_s = packed_bit_coords(np.array([k_total - 1]))
    keep = np.full((words,), 0xFFFFFFFF, np.uint32)
    keep[int(w_s[0])] = np.uint32(0xFFFFFFFF) ^ (
        np.uint32(1) << np.uint32(int(b_s[0]))
    )
    a = jax.jit(lambda x, k: x & k[None, :])(a, jnp.asarray(keep))
    np.asarray(a[:1, :1])
    return a, time.perf_counter() - t_sort


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01

    from mcmc_colorer_tpu.graph.generate import erdos_renyi
    from mcmc_colorer_tpu.ops import dense_adj as da
    from mcmc_colorer_tpu.utils import compcache

    compcache.enable()
    log(f"backend={jax.default_backend()}")
    t0 = time.perf_counter()
    g = erdos_renyi(n, p, seed=0)
    log(
        f"graph: n={g.n} m={g.n_edges} maxdeg={g.max_degree} "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    ell = g.to_ell(pad_nodes_to=2048)
    n_pad = ell.n_pad
    np.asarray(ell.neighbors[:1, :1])
    log(f"n_pad={n_pad} d_pad={ell.neighbors.shape[1]}")

    t0 = time.perf_counter()
    stats = {}
    a0 = da.build_packed_adjacency_from_ell(ell, stats=stats)
    log(
        f"scatter       : {time.perf_counter()-t0:.1f}s "
        f"(compile {stats.get('compile_s',0):.1f} + "
        f"scatter {stats.get('scatter_s',0):.1f})"
    )
    ref = rows_popcount(a0)
    del a0

    t0 = time.perf_counter()
    a1, t_after_sort = build_scatter_sorted(ell, n_pad, g.n)
    t1 = time.perf_counter() - t0
    ok1 = np.array_equal(rows_popcount(a1), ref)
    log(f"scatter-sorted: {t1:.1f}s (post-sort {t_after_sort:.1f}s) ok={ok1}")
    del a1

    t0 = time.perf_counter()
    a2 = build_compare(ell, n_pad)
    t2 = time.perf_counter() - t0
    ok2 = np.array_equal(rows_popcount(a2), ref)
    log(f"compare       : {t2:.1f}s ok={ok2}")
    del a2


if __name__ == "__main__":
    main()
