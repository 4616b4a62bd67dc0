"""Dense bit-adjacency for the MXU neighbor-color-count formulation.

Round-2 attack on the neighbor-gather wall (PERF.md): the sweep's
neighbor color counts are exactly

    NC[i, c] = #{j in N(i) : colors[j] = c} = (A @ onehot(colors))[i, c]

with A the n x n 0/1 adjacency.  On TPU the XLA dynamic gather runs at
~133M elem/s (scalar-unit bound), while an int8 A @ onehot matmul rides
the MXU: measured 130 ms per sweep on ER(100k, 0.01) vs 1040 ms for the
fused-gather path (scripts/probe_matmul.py).  NC also subsumes every
downstream consumer: occupancy (NC>0), per-vertex conflict counts
(NC[i, c_i]), conflict-edge totals (sum/2), and the Hastings reverse
occupancy (NC of the star coloring).

The cost is HBM: A is n_pad^2 bytes (10.5 GB at n=102400), so the
formulation is regime-gated to n_pad <= DENSE_ADJ_MAX_N on a 16 GB chip.
Counterpart of the reference's hot loop coloringMCMC_balance.cu:79-143
(per-thread neighbor scans), re-expressed as a contraction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# n_pad^2 int8 <= ~10.5 GB leaves room for NC/onehot/ELL on a 16 GB chip
DENSE_ADJ_MAX_N = 102_400


def dense_adj_bytes(n_pad: int) -> int:
    return n_pad * n_pad


def dense_adj_ok(n_pad: int, d_mean: float | None = None) -> bool:
    """Whether the dense-A formulation is worth it: fits HBM, and the
    graph is large enough that the one-time build (~10 s at 100k) is
    amortised by the per-sweep win.  Small graphs stay on the gather
    path (their sweeps are already sub-working-set)."""
    if n_pad > DENSE_ADJ_MAX_N:
        return False
    if d_mean is not None and n_pad * d_mean < 2_000_000:
        return False  # gather volume already < ~15 ms/sweep
    return True


def build_dense_adjacency(graph, n_pad: int, n_chunks: int = 8):
    """[n_pad, n_pad] int8 adjacency on the default device.

    Built as row-chunked 1-D scatters (chunk-local flat indices stay
    int32) inserted in place into a donated buffer: a single full-size
    1-D scatter aliases, but its 1D->2D reshape is an n_pad^2-byte layout
    copy and 2-D [m,2] index pairs tile to T(8,128) (64x padding) — both
    measured OOM paths on the 16 GB chip (scripts/probe_matmul.py).
    ~10 s one-time at n=100k, m=50M; cache per graph."""
    # chunk must divide n_pad, stay a lane multiple, AND keep the
    # chunk-local flat indices (chunk * n_pad) inside int32 — a 100096-row
    # pad has no 8-way split satisfying all three, so search upward from
    # the requested count (round-2 fix)
    def ok(c):
        return (
            n_pad % c == 0
            and (n_pad // c) % 128 == 0
            and (n_pad // c) * n_pad < 2**31
        )

    cands = [c for c in range(n_chunks, 4097) if ok(c)]
    if not cands:  # non-128-multiple n_pad: legacy descent, no lane rule
        cands = [
            c
            for c in range(1, 4097)
            if n_pad % c == 0 and (n_pad // c) * n_pad < 2**31
        ]
    if not cands:
        raise ValueError(
            f"no feasible row chunking for n_pad={n_pad}; pad the node "
            "axis to a multiple of 128"
        )
    n_chunks = cands[0]
    chunk = n_pad // n_chunks
    degs = graph.degrees.astype(np.int64)
    u = np.repeat(np.arange(graph.n, dtype=np.int64), degs)
    flat = u * n_pad + graph.cols.astype(np.int64)
    chunk_idx = []
    max_len = 0
    for c in range(n_chunks):
        lo = np.searchsorted(u, c * chunk)
        hi = np.searchsorted(u, (c + 1) * chunk)
        loc = flat[lo:hi] - c * chunk * n_pad
        assert loc.size == 0 or loc.max() < chunk * n_pad < 2**31
        chunk_idx.append(loc.astype(np.int32))
        max_len = max(max_len, int(loc.size))
    oob = np.int32(min(chunk * n_pad, 2**31 - 1))  # mode="drop" discards
    chunk_idx = [
        np.concatenate([ci, np.full(max_len - ci.size, oob, np.int32)])
        for ci in chunk_idx
    ]

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("chunk",))
    def insert_rows(a, flat_local, r0, *, chunk):
        z = jnp.zeros((chunk * n_pad,), jnp.int8)
        z = z.at[flat_local].set(
            jnp.int8(1),
            indices_are_sorted=True,
            unique_indices=True,
            mode="drop",
        )
        return jax.lax.dynamic_update_slice(
            a, z.reshape(chunk, n_pad), (r0, 0)
        )

    a = jnp.zeros((n_pad, n_pad), jnp.int8)
    for c in range(n_chunks):
        a = insert_rows(
            a, jnp.asarray(chunk_idx[c]), jnp.int32(c * chunk), chunk=chunk
        )
    return a


def neighbor_color_counts(
    adj: jnp.ndarray,       # [n_pad, n_pad] int8
    colors: jnp.ndarray,    # [n_pad] int32 (out-of-palette = phantom)
    n_colors: int,
    node_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[n_pad, n_col_pad] int32 neighbor color counts via one MXU
    contraction.  The color axis is padded to a lane multiple; padded
    and phantom columns are exactly zero."""
    n_col_pad = (n_colors + 127) // 128 * 128
    if node_mask is not None:
        colors = jnp.where(node_mask, colors, -1)
    onehot = (
        colors[:, None]
        == jnp.arange(n_col_pad, dtype=jnp.int32)[None, :]
    ).astype(jnp.int8)
    return jax.lax.dot_general(
        adj,
        onehot,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
