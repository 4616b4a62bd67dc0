"""Device-side ELL build from an O(2m+n) CSR upload.

The reference ships exactly ``cumulDegs`` + ``neighs`` = 2m+n words at
its H2D boundary (/root/reference/src/graph/graphGPU.cu:211-226).  Until
round 5 this repo shipped the padded [n_pad, d_pad] ELL rectangle
instead — 465 MB at ER(100k, 0.01) over the ~9 MB/s tunnel, and far
worse on skewed-degree graphs, where d_pad is the MAX degree: a
BA(100k, 16) rectangle is ~60x the edge count.  This module restores
the reference's O(2m) transfer boundary and moves the rectangle
scatter onto the device:

* upload ``row_ptr`` (n+1 int32) and ``cols`` (2m int32) — the same two
  arrays the reference copies;
* derive each edge's row id ON DEVICE without a per-edge searchsorted:
  scatter a marker at every row boundary that falls inside the band and
  take an exclusive prefix sum (row(k) counts boundaries ≤ k), then
  ``slot = k - row_ptr[row]`` via one small-table gather;
* scatter ``ell[row, slot] = cols[k]`` in wall-safe edge bands
  (single device executions past ~60 s crash the worker — the build is
  host-driven like every other sweep in the repo).

Per-edge device cost is ~3 HBM passes + one gather + one scatter —
seconds where the rectangle upload was minutes.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# edges per band: ~3 vector passes + a gather + a scatter per edge stays
# a few seconds of device time, far inside the ~60 s execution wall
ELL_BUILD_BAND_EDGES = 32 * 1024 * 1024


def _build_band(ell, cum, cols_seg, e0, row0, *, band, m2, n_pad):
    """Scatter edges [e0, e0+band) into the rectangle.

    row(k) = #{r in 0..n: cum[r] <= k} - 1 computed incrementally:
    row0 = row(e0) (host-side, free), and inside the band
    row(k) - row0 = #{r: e0 < cum[r] <= k} — a marker scattered at
    index cum[r]-e0-1 and an inclusive prefix sum read at k-e0-1,
    i.e. an exclusive cumsum of the marker vector.  Duplicate markers
    (empty rows) accumulate via scatter-add, so the sum jumps past
    zero-degree vertices exactly like searchsorted would.
    """
    k = e0 + jnp.arange(band, dtype=jnp.int32)
    marker = jnp.zeros((band,), jnp.int32)
    # NB mode='drop' drops only non-negative OOB indices (negatives
    # still wrap in jax indexing) — route boundaries outside the band,
    # including negative ones, to the explicit OOB index `band`
    midx = cum - e0 - 1
    midx = jnp.where((midx >= 0) & (midx < band), midx, jnp.int32(band))
    marker = marker.at[midx].add(1, mode="drop")
    row_rel = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(marker)[:-1]]
    )
    row = row0 + row_rel
    slot = k - cum[jnp.minimum(row, cum.shape[0] - 1)]
    # edges past 2m (last-band padding) scatter out of bounds -> dropped
    row = jnp.where(k < m2, row, jnp.int32(n_pad))
    return ell.at[row, slot].set(cols_seg, mode="drop")


def ell_neighbors_from_csr_device(
    row_ptr: np.ndarray,
    cols: np.ndarray,
    n_pad: int,
    d_pad: int,
    stats: dict | None = None,
    band_edges: int = ELL_BUILD_BAND_EDGES,
):
    """[n_pad, d_pad] int32 neighbor rectangle (sentinel ``n_pad`` in
    padding slots), built on the device from the O(2m+n) CSR upload.
    Bit-equal to the host rectangle ``Graph.to_ell`` builds (by test).
    """
    m2 = int(cols.shape[0])
    if m2 + 1 >= 2**31:
        raise ValueError(
            f"CSR int32 index space exhausted: 2m={m2} >= 2^31; shard "
            f"the graph (parallel/sharded.py) instead"
        )
    if stats is None:
        stats = {}
    # shrink the band to the edge count (rounded to 1M for shape reuse):
    # padding cols to a full 32M-edge band would upload 128 MB for a
    # 3 M-edge graph — the exact waste this module exists to remove
    band_edges = min(
        band_edges, -(-max(m2, 1) // (1 << 20)) * (1 << 20)
    )
    t0 = time.perf_counter()
    cum_d = jnp.asarray(np.asarray(row_ptr, dtype=np.int32))
    m2_pad = -(-max(m2, 1) // band_edges) * band_edges
    cols_h = np.full(m2_pad, n_pad, dtype=np.int32)
    cols_h[:m2] = cols
    cols_d = jnp.asarray(cols_h)
    # force the H2D transfers so upload_s is the transfer, not dispatch
    cum_d.block_until_ready()
    _ = np.asarray(cols_d[-1:])  # readback = the only true sync on axon
    stats["upload_s"] = round(time.perf_counter() - t0, 3)
    stats["upload_bytes"] = int(cum_d.nbytes + cols_d.nbytes)

    t0 = time.perf_counter()
    band_fn = jax.jit(
        partial(_build_band, band=band_edges, m2=m2, n_pad=n_pad),
        donate_argnums=(0,),
    )
    ell = jnp.full((n_pad, d_pad), jnp.int32(n_pad))
    seg0 = jax.lax.dynamic_slice(cols_d, (0,), (band_edges,))
    compiled = band_fn.lower(
        ell, cum_d, seg0, jnp.int32(0), jnp.int32(0)
    ).compile()
    stats["compile_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    rp = np.asarray(row_ptr)
    for e0 in range(0, m2_pad, band_edges):
        row0 = int(np.searchsorted(rp, e0, side="right") - 1)
        seg = jax.lax.dynamic_slice(cols_d, (e0,), (band_edges,))
        ell = compiled(ell, cum_d, seg, jnp.int32(e0), jnp.int32(row0))
    _ = np.asarray(ell[:1, :1])
    stats["scatter_s"] = round(time.perf_counter() - t0, 3)
    stats["bands"] = m2_pad // band_edges
    return ell
