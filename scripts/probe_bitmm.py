"""Probe: bit-matmul kernel tuning on the chip.

The NC bit-matmul is MXU-bound (~24.2 int8 T-ops at n_pad=102400,
nCol=1152 → ~61 ms floor on a v5e); with BIT_MM_BLOCK_COLS=1024 the
1152-wide palette splits into n_c=2 color windows, each pass re-reading
the packed A and re-running the unpack — measured 121 ms.  A window cap
>= 1152 makes n_c=1 (one pass) if the onehot slab still fits VMEM.  This
probe times the raw NC op across (block_cols cap, block_rows) combos.

Usage: python scripts/probe_bitmm.py [n] [p] [iters]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from mcmc_colorer_tpu.graph.generate import erdos_renyi
    from mcmc_colorer_tpu.ops import dense_adj as da
    from mcmc_colorer_tpu.ops import pallas_bitmatmul as bm

    g = erdos_renyi(n, p, seed=0)
    ell = g.to_ell(pad_nodes_to=2048)
    n_pad = ell.n_pad
    n_col = g.max_degree
    n_col_pad = (n_col + 127) // 128 * 128
    log(f"n_pad={n_pad} nCol={n_col} ncp={n_col_pad}")
    adj = da.build_packed_adjacency_from_ell(ell)
    np.asarray(adj[:1, :1])
    key = jax.random.key(1)
    colors = jnp.where(
        ell.node_mask,
        jax.random.randint(key, (n_pad,), 0, n_col, jnp.int32),
        jnp.int32(-1),
    )

    ref_sum = None
    for bc_cap in (1024, 2048):
        for block_rows in (256, 128, 512):
            bm_cap_old = bm.BIT_MM_BLOCK_COLS
            bm.BIT_MM_BLOCK_COLS = bc_cap
            try:
                br = block_rows

                def k_body(i, acc, a=adj, br=br):
                    # roll the colors so consecutive NCs cannot be CSE'd
                    c = jnp.roll(colors, i)
                    nc = bm.packed_nc_pallas(a, c, n_col_pad, block_rows=br)
                    return acc + jnp.sum(nc, dtype=jnp.int64)

                fn = jax.jit(
                    lambda a: jax.lax.fori_loop(
                        0, iters, lambda i, acc: k_body(i, acc, a),
                        jnp.int64(0),
                    )
                )
                t0 = time.perf_counter()
                s = int(fn(adj))
                first = time.perf_counter() - t0
                t0 = time.perf_counter()
                s = int(fn(adj))
                dt = (time.perf_counter() - t0 - 0.03) / iters
                ok = ref_sum is None or s == ref_sum
                ref_sum = ref_sum or s
                log(
                    f"bc_cap={bc_cap} rows={block_rows}: "
                    f"{dt*1e3:.1f} ms/NC (first {first:.1f}s) "
                    f"sum={'OK' if ok else 'MISMATCH'}"
                )
            except Exception as e:  # noqa: BLE001 — probing compile limits
                log(f"bc_cap={bc_cap} rows={block_rows}: FAILED {e}")
            finally:
                bm.BIT_MM_BLOCK_COLS = bm_cap_old


if __name__ == "__main__":
    main()
