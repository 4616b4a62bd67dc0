"""Probe: neighbor-color counts as a dense int8 matmul on the MXU.

Round-2 attack on the 133M elem/s XLA dynamic-gather wall (PERF.md): the
sweep's neighbor-color aggregation NC[i,c] = #{j in N(i): color_j = c} is
exactly A @ onehot(colors) with A the n x n adjacency.  For the headline
bench config ER(100k, 0.01) a dense int8 A (~10 GB) fits single-chip HBM,
so the whole per-edge cost moves from the serial gather unit to the MXU.

Measures, on the real chip:
  0. int8 x int8 -> int32 dot support (tiny shapes)
  1. A build: host bit-pack -> 1.25 GB transfer -> device unpack to int8
  2. NC = A @ onehot(colors) steady-state (chained, CSE-proof)
  3. full MCMC sweep step (hist + matmul + proposal + sample + conflicts)
  4. (last, may be slow) device scatter A build for comparison
  5. small-n correctness vs the gather/occupancy formulation

Usage: python scripts/probe_matmul.py [n] [p]
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


def round_up(x, m):
    return (x + m - 1) // m * m


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
    log(f"backend: {jax.default_backend()}")

    # ---- 0) int8 dot support --------------------------------------------
    try:
        f = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )
        r = f(jnp.ones((256, 256), jnp.int8), jnp.ones((256, 128), jnp.int8))
        log(f"int8 dot: ok, r[0,0]={np.asarray(r)[0, 0]} dtype={r.dtype}")
        int8_ok = True
    except Exception as e:  # noqa: BLE001
        log(f"int8 dot FAILED: {type(e).__name__}: {e}")
        int8_ok = False

    from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
    from mcmc_colorer_tpu.graph.generate import erdos_renyi
    from mcmc_colorer_tpu.models.mcmc import (
        _proposal_q,
        _sample_cdf,
        _variant_distribution,
    )
    from mcmc_colorer_tpu.ops.neighbor import color_histogram

    t0 = time.perf_counter()
    g = erdos_renyi(n, p, seed=0)
    log(
        f"graph: n={g.n} m={g.n_edges} maxdeg={g.max_degree} "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    n_col = g.max_degree
    block = 4096
    n_pad = round_up(g.n, block)
    n_colp = round_up(n_col, 128)
    rt = roundtrip_s()
    log(f"null roundtrip {rt * 1e3:.1f}ms; n_pad={n_pad} n_colp={n_colp}")

    if not int8_ok:
        log("skipping matmul timing (no int8 dot); would need bf16 slabs")
        return

    # ---- 1) A build: row-chunked local 1-D scatters + donated in-place
    # row insertion.  (2-D [m,2] index pairs tile to T(8,128) = 51 GB copy;
    # a full 1-D scatter aliases but its final 1D->2D reshape is a 9.8 GB
    # layout copy -> OOM.  Chunk-local flat indices also fit int32.) ------
    n_chunks = 8
    chunk = n_pad // n_chunks
    u = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    flat = u * n_pad + g.cols.astype(np.int64)
    max_len = 0
    chunk_idx = []
    for c in range(n_chunks):
        lo = np.searchsorted(u, c * chunk)
        hi = np.searchsorted(u, (c + 1) * chunk)
        loc = flat[lo:hi] - c * chunk * n_pad
        assert loc.size == 0 or loc.max() < chunk * n_pad < 2**31
        chunk_idx.append(loc.astype(np.int32))
        max_len = max(max_len, loc.size)
    oob = chunk * n_pad  # mode="drop" discards padding slots
    chunk_idx = [
        np.concatenate([ci, np.full(max_len - ci.size, oob, np.int32)])
        for ci in chunk_idx
    ]

    @partial(jax.jit, donate_argnums=(0,))
    def insert_rows(A, flat_local, r0):
        z = jnp.zeros((chunk * n_pad,), jnp.int8)
        z = z.at[flat_local].set(
            jnp.int8(1),
            indices_are_sorted=True,
            unique_indices=True,
            mode="drop",
        )
        return jax.lax.dynamic_update_slice(
            A, z.reshape(chunk, n_pad), (r0, 0)
        )

    t0 = time.perf_counter()
    A = jnp.zeros((n_pad, n_pad), jnp.int8)
    for c in range(n_chunks):
        A = insert_rows(A, jnp.asarray(chunk_idx[c]), jnp.int32(c * chunk))
    d0 = np.asarray(
        jax.jit(lambda A: jnp.sum(A[:8, :], axis=1, dtype=jnp.int32))(A)
    )
    t_build = time.perf_counter() - t0
    log(
        f"device scatter A build: {t_build:.1f}s incl compile "
        f"(deg[:3]={d0[:3].tolist()} expect {g.degrees[:3].tolist()})"
    )
    del flat, chunk_idx, u

    col_ids = jnp.arange(n_colp, dtype=jnp.int32)
    node_mask = jnp.arange(n_pad, dtype=jnp.int32) < g.n

    def nc_of(A, colors):
        oh = (
            jnp.where(node_mask, colors, -1)[:, None] == col_ids[None, :]
        ).astype(jnp.int8)
        return jax.lax.dot_general(
            A, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # ---- 2) steady-state matmul, chained so iterations can't be CSE'd ----
    iters = 8

    @jax.jit
    def mm_loop(A, colors):
        def body(c, _):
            nc = nc_of(A, c)
            c2 = (c + nc[:, 0]) % n_col
            return c2, nc[0, 0]
        return jax.lax.scan(body, colors, None, length=iters)

    key = jax.random.key(0)
    colors0 = jax.random.randint(key, (n_pad,), 0, n_col, jnp.int32)
    t0 = time.perf_counter()
    c_out, tr = mm_loop(A, colors0)
    np.asarray(tr)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    c_out, tr = mm_loop(A, colors0)
    np.asarray(tr)
    t_mm = max(1e-9, time.perf_counter() - t0 - rt)
    log(
        f"NC matmul: {iters} iters in {t_mm * 1e3:.0f}ms -> "
        f"{t_mm / iters * 1e3:.1f}ms/iter (first call {t_first:.1f}s); "
        f"edge-rate {2 * g.n_edges * iters / t_mm / 1e9:.2f}G elem/s"
    )

    # ---- 3) full sweep step ----------------------------------------------
    params = MCMCParams(
        n_colors=n_col, proposal=ProposalKind.BALANCE_DYNAMIC
    )
    sweep_block = 4096
    nb = n_pad // sweep_block

    def sweep(A, colors, taboo, key):
        key, ku = jax.random.split(key)
        unif = jax.random.uniform(ku, (n_pad,), dtype=jnp.float32)
        hist = color_histogram(colors, n_col, node_mask)
        p_eff = _variant_distribution(params, hist, g.n)
        p_eff_pad = jnp.zeros((n_colp,), jnp.float32).at[:n_col].set(p_eff)
        nc = nc_of(A, colors)

        def block_fn(xs):
            nc_b, cur_b, tb_b, u_b, real_b = xs
            occ = nc_b > 0
            conf_b = jnp.sum(
                jnp.where(
                    col_ids[None, :] == cur_b[:, None], nc_b, 0
                ),
                dtype=jnp.int32,
            )
            q = _proposal_q(cur_b, occ, params, p_eff_pad, n_colors=n_col)
            chosen = _sample_cdf(q, u_b, n_colors=n_col)
            taboo_active = tb_b > 0
            chosen = jnp.where(taboo_active, cur_b, chosen)
            new_tb = jnp.where(
                taboo_active,
                tb_b - 1,
                jnp.where(
                    chosen == cur_b, jnp.int32(params.taboo_iterations), 0
                ),
            )
            chosen = jnp.where(real_b, chosen, cur_b)
            return chosen, new_tb, conf_b

        xs = (
            nc.reshape(nb, sweep_block, n_colp),
            colors.reshape(nb, sweep_block),
            taboo.reshape(nb, sweep_block),
            unif.reshape(nb, sweep_block),
            node_mask.reshape(nb, sweep_block),
        )
        star_b, tb_b, conf_b = jax.lax.map(block_fn, xs)
        return (
            star_b.reshape(n_pad),
            tb_b.reshape(n_pad),
            jnp.sum(conf_b) // 2,
            key,
        )

    @jax.jit
    def sweep_loop(A, colors, taboo, key):
        def body(carry, _):
            colors, taboo, key = carry
            star, tb, conf, key = sweep(A, colors, taboo, key)
            return (star, tb, key), conf
        return jax.lax.scan(
            body, (colors, taboo, key), None, length=iters
        )

    colors1 = jnp.where(node_mask, colors0, n_col)
    taboo0 = jnp.zeros((n_pad,), jnp.int32)
    t0 = time.perf_counter()
    (_, _, _), confs = sweep_loop(A, colors1, taboo0, key)
    confs = np.asarray(confs)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    (_, _, _), confs = sweep_loop(A, colors1, taboo0, key)
    confs = np.asarray(confs)
    t_sw = max(1e-9, time.perf_counter() - t0 - rt)
    log(
        f"full sweep: {iters} iters in {t_sw * 1e3:.0f}ms -> "
        f"{t_sw / iters * 1e3:.1f}ms/iter (first {t_first:.1f}s); "
        f"conflict trace {confs.tolist()}"
    )
    log(
        f"=> updates/s = {g.n * iters / t_sw:,.0f} "
        f"(r1 bench: 96,130; 5x bar: 480,650)"
    )
    try:
        st = jax.local_devices()[0].memory_stats()
        log(f"HBM peak: {st.get('peak_bytes_in_use', 0) / 1e9:.1f} GB")
    except Exception:  # noqa: BLE001
        pass



def check_small():
    """Correctness: matmul NC vs gather/occupancy on a small graph."""
    from mcmc_colorer_tpu.graph.generate import erdos_renyi
    from mcmc_colorer_tpu.ops.neighbor import neighbor_colors

    g = erdos_renyi(1024, 0.05, seed=3)
    n_col = g.max_degree
    n_pad = round_up(g.n, 128)
    ell = g.to_ell(pad_nodes_to=128)
    key = jax.random.key(7)
    colors = jax.random.randint(key, (n_pad,), 0, n_col, jnp.int32)

    bits = np.zeros((n_pad, n_pad), np.int8)
    u = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    bits[u, g.cols] = 1
    A = jnp.asarray(bits)
    node_mask = jnp.arange(n_pad) < g.n
    oh = (
        jnp.where(node_mask, colors, -1)[:, None]
        == jnp.arange(n_col, dtype=jnp.int32)[None, :]
    ).astype(jnp.int8)
    nc_mm = jax.lax.dot_general(
        A, oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    ncg = neighbor_colors(ell.neighbors, jnp.where(node_mask, colors, -1))
    ref = jax.vmap(
        lambda row: jnp.sum(
            row[:, None] == jnp.arange(n_col)[None, :], axis=0,
            dtype=jnp.int32,
        )
    )(ncg)
    ok = bool(jnp.all(nc_mm[: g.n] == ref[: g.n]))
    log(f"small-n correctness (matmul NC == gather NC): {ok}")
    assert ok


if __name__ == "__main__":
    check_small()
    main()
