"""Vectorized neighbor/occupancy primitives.

These replace the reference's per-thread CSR walks and the persistent
``colorsChecker_d`` nnodes×nCol bool matrix (its main memory consumer,
coloringMCMC_main.cu:39): occupancy is materialised only per vertex-block,
never for the whole graph (SURVEY §10 hard part 3).
"""

from __future__ import annotations

import jax.numpy as jnp


def extend_colors(colors: jnp.ndarray, fill: int = -1) -> jnp.ndarray:
    """Append one sentinel slot so ELL padding gathers land on `fill`."""
    return jnp.concatenate(
        [colors.astype(jnp.int32), jnp.full((1,), fill, jnp.int32)]
    )


def neighbor_colors(
    neighbors: jnp.ndarray, colors: jnp.ndarray
) -> jnp.ndarray:
    """[B, d_pad] colors of each vertex's neighbors; padding slots get -1.

    ``colors`` must cover all vertex ids that appear in ``neighbors`` plus
    the sentinel (pass the full color vector even when ``neighbors`` is a
    block slice).
    """
    return jnp.take(extend_colors(colors), neighbors, axis=0)


def occupancy_matrix(neigh_cols: jnp.ndarray, n_colors: int) -> jnp.ndarray:
    """[B, n_colors] bool — occ[v, c] iff some neighbor of v has color c.

    Functional equivalent of the reference's per-vertex ``colorsChecker``
    fill loop (coloringMCMC_standard.cu:29-30).  Out-of-range colors
    (padding -1, phantom palette nCol) are dropped by the scatter.
    """
    b = neigh_cols.shape[0]
    rows = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], neigh_cols.shape
    )
    # negative padding sentinels would WRAP under .at[] indexing; shift
    # them beyond the palette so mode="drop" discards them
    neigh_cols = jnp.where(neigh_cols < 0, jnp.int32(n_colors), neigh_cols)
    occ = jnp.zeros((b, n_colors), dtype=jnp.bool_)
    return occ.at[rows, neigh_cols].set(True, mode="drop")


def take_rows(ell, ids: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Gather the adjacency rows of the given padded-global vertex ids.

    Returns [cap, d_out] int32 padded-global neighbor ids; slots of
    invalid rows and width padding hold the sentinel ``ell.n_pad``.

    On the flat ELL this is one ``jnp.take``.  On the bucketed layout
    (``BucketedEll``) each degree-class rectangle is gathered at its own
    width and widened into the common output (total gather volume
    cap·Σ_b d_b).  The frontier is small by construction, so paying the
    max width per frontier row is immaterial next to the full sweep's
    Σ h_b·d_b — this single helper is what composes every frontier
    (active-set) colorer with the bucketed layout.
    """
    n_pad = ell.n_pad
    ids_c = jnp.minimum(ids, n_pad - 1)
    slices = getattr(ell, "slices", None)
    if slices is None:
        rows = jnp.take(ell.neighbors, ids_c, axis=0)
        return jnp.where(valid[:, None], rows, jnp.int32(n_pad))
    cap = ids.shape[0]
    d_out = max(s.d_pad for s in slices)
    out = jnp.full((cap, d_out), n_pad, jnp.int32)
    for s in slices:
        local = ids_c - s.start
        in_s = valid & (local >= 0) & (local < s.h_pad)
        lc = jnp.clip(local, 0, s.h_pad - 1)
        rows_s = jnp.take(s.neighbors, lc, axis=0)
        if s.d_pad < d_out:
            rows_s = jnp.concatenate(
                [
                    rows_s,
                    jnp.full((cap, d_out - s.d_pad), n_pad, jnp.int32),
                ],
                axis=1,
            )
        out = jnp.where(in_s[:, None], rows_s, out)
    return out


def color_histogram(
    colors: jnp.ndarray, n_colors: int, node_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[n_colors] int32 class sizes (reference host histogram step,
    coloringMCMC_main.cu:211-214, moved on-device).  Colors outside the
    palette (phantom padding vertices) are dropped."""
    if node_mask is not None:
        colors = jnp.where(node_mask, colors, n_colors)
    hist = jnp.zeros((n_colors,), dtype=jnp.int32)
    return hist.at[colors].add(1, mode="drop")
