"""Fused Pallas resample-sweep kernel — the framework's hot op.

The reference's hottest kernel is the per-vertex proposal
(selectStarColoringBalanceDynamic, coloringMCMC_balance.cu:79-143): scan
neighbor colors into a per-vertex occupancy row, then CDF-walk the proposal
distribution.  On TPU the naive XLA formulation needs an n×nCol scatter,
which Mosaic/XLA serialises (measured >20 s/sweep at degree ~1000).  This
kernel replaces it with a **bit-packed occupancy** built entirely in VMEM:

* grid over vertex blocks of B rows; the block's neighbor-color matrix
  ``nc [B, d_pad]`` streams HBM→VMEM once;
* occupancy lives as W = nColPad/32 uint32 words per vertex (32× smaller
  than the reference's nnodes×nCol bool ``colorsChecker_d``,
  coloringMCMC_main.cu:39 — its HBM limiter);
* per word: compare-select + logarithmic OR-tree over the degree axis —
  pure VPU work, no scatter;
* the word mask expands back to a [B, nColPad] free/occupied mask with a
  static `pltpu.repeat` + variable shifts, feeding the shared proposal
  formula (`models.mcmc._proposal_q`) and inverse-CDF sampler unchanged —
  so the kernel is bit-identical in distribution to the XLA path.

The neighbor-color gather itself (``colors[neighbors]``) stays in XLA,
which handles large dynamic gathers well; the kernel fuses everything
after it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_colorer_tpu.config import MCMCParams


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Vectors travel as 8-sublane tiles: [n_blocks*8, 128] with each grid
# block's `block` values in the first block/128 rows of its tile.  A plain
# [n, 1] operand is T(8,128)-padded 128x by XLA (catastrophic at n=1e6) and
# a [block/128, 128] block violates the 8-sublane tiling rule; this layout
# is exact under T(8,128) at an 8/(block/128) memory factor on the small
# vector arrays only.


def _vec_pack(x, block: int):
    n_pad = x.shape[0]
    nb = n_pad // block
    rows = block // 128
    y = x.reshape(nb, rows, 128)
    pad = jnp.zeros((nb, 8 - rows, 128), x.dtype)
    return jnp.concatenate([y, pad], axis=1).reshape(nb * 8, 128)


def _vec_unpack(y, block: int, n_pad: int):
    nb = n_pad // block
    rows = block // 128
    return y.reshape(nb, 8, 128)[:, :rows, :].reshape(n_pad)


def _cumsum_lanes(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Inclusive prefix sum along the lane axis via Hillis–Steele shifted
    adds (Mosaic has no cumsum primitive)."""
    assert axis == 1
    b, n = x.shape
    zeros = jnp.zeros_like(x)
    s = 1
    while s < n:
        shifted = jnp.concatenate([zeros[:, :s], x[:, : n - s]], axis=1)
        x = x + shifted
        s *= 2
    return x


def _or_reduce_cols(x: jnp.ndarray) -> jnp.ndarray:
    """[B, d] int32 → [B, 1] bitwise-OR over columns via a halving tree
    (Mosaic has no native OR-reduction).

    Odd widths fold the last column into the first BEFORE halving — the
    halve-then-patch formulation emitted a zero-width slice whenever the
    width reduced to exactly 3 (e.g. d = 3·2^k: 768, 24, ...), which the
    interpreter tolerates but Mosaic rejects ("vector types must have
    positive constant sizes")."""
    d = x.shape[1]
    while d > 1:
        if d % 2:
            x = jnp.concatenate(
                [
                    jnp.bitwise_or(x[:, :1], x[:, d - 1 : d]),
                    x[:, 1 : d - 1],
                ],
                axis=1,
            )
            d -= 1
        half = d // 2
        x = jnp.bitwise_or(x[:, :half], x[:, half:d])
        d = half
    return x


# ---------------------------------------------------------------------------
# chunked color axis (palettes beyond the ~3k single-pass VMEM bound)
# ---------------------------------------------------------------------------
# The single-pass kernel materialises several [B, nColPad] temporaries; at
# block=128 that caps the palette at ~3072 colors (PERF.md).  Above it the
# chunked path walks the color axis in _COLOR_CHUNK-wide windows inside
# ``lax.fori_loop``s — the loop is what bounds VMEM: an unrolled python
# loop lets the Mosaic scheduler overlap every chunk's temporaries and
# still blows the 16 MB scoped budget (measured: 20.3 MB at nCol=4500).
# Three passes: per-vertex aggregates (Zn, reminder, violating), the
# inverse-CDF walk with a running prefix, and the chosen color's
# probability.  Each pass re-derives the chunk occupancy from the
# neighbor colors (the OR-tree is cheap next to the XLA gather that
# feeds the kernel).

_COLOR_CHUNK = 1024


def _occ_chunk(nc, k, chunk: int):
    """[B, chunk] bool occupancy of chunk ``k`` (a traced scalar), derived
    from the neighbor colors: chunk-locally striped words (local color l ↔
    word l mod Wc, bit l div Wc; Wc = chunk/32) built with the same
    compare-select + OR-tree as the single-pass kernel, expanded with one
    tile-repeat plus blockwise shifts."""
    wc = chunk // 32
    b = nc.shape[0]
    loc = nc - k * chunk
    in_k = (loc >= 0) & (loc < chunk)
    lc = jnp.clip(loc, 0, chunk - 1)  # keep shifts in-range off-chunk
    hi = jax.lax.rem(lc, jnp.int32(wc))
    bit = jax.lax.shift_left(
        jnp.ones_like(nc), jax.lax.div(lc, jnp.int32(wc))
    )
    zero = jnp.zeros_like(nc)
    words = [
        _or_reduce_cols(jnp.where(in_k & (hi == w), bit, zero))
        for w in range(wc)
    ]
    occ_words = jnp.concatenate(words, axis=1)      # [B, Wc]
    expanded = pltpu.repeat(occ_words, 32, axis=1)  # [B, chunk]
    shifts = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1), jnp.int32(wc)
    )
    return (
        jnp.bitwise_and(jax.lax.shift_right_logical(expanded, shifts), 1)
        == 1
    )


def _proposal_sample_chunked(
    cur,        # [B] current colors
    nc,         # [B, d_pad] neighbor colors (-1 padding)
    unif,       # [B] pre-drawn uniforms
    p_eff_ref,  # ref [n_chunks, chunk] f32 variant distribution (0-padded)
    eps,        # scalar f32
    *,
    params: MCMCParams,
    n_col_pad: int,
    chunk: int,
):
    """(chosen, qstar): the chunked rendition of models.mcmc._proposal_q +
    _sample_cdf — same formulas (selectStarColoring* CDF terms,
    _standard.cu:50-58, _decrease.cu:42-58, _balance.cu:122-135), never
    materialising a full [B, nColPad] row."""
    from mcmc_colorer_tpu.config import ProposalKind

    n_colors = params.n_colors
    kind = params.proposal
    b = cur.shape[0]
    n_chunks = n_col_pad // chunk
    lam = jnp.float32(params.lambda_)

    def cols_of(k):
        return k * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (b, chunk), 1
        )

    def p_row(k):
        return p_eff_ref[k, :]  # dynamic sublane read, [chunk]

    zero_f = jnp.zeros((b,), jnp.float32)
    zero_i = jnp.zeros((b,), jnp.int32)

    # ---- pass 1: per-vertex aggregates ----------------------------------
    def pass1(k, carry):
        zn, viol, rem = carry
        occk = _occ_chunk(nc, k, chunk)
        colk = cols_of(k)
        ock = occk & (colk < n_colors)
        zn = zn + jnp.sum(ock.astype(jnp.int32), axis=1)
        viol = viol + jnp.sum(
            (ock & (colk == cur[:, None])).astype(jnp.int32), axis=1
        )
        if kind != ProposalKind.STANDARD:
            rem = rem + jnp.sum(
                jnp.where(ock, p_row(k)[None, :] - eps, 0.0), axis=1
            )
        return zn, viol, rem

    zn, viol_cnt, reminder = jax.lax.fori_loop(
        0, n_chunks, pass1, (zero_i, zero_i, zero_f)
    )
    zp = jnp.int32(n_colors) - zn
    zp_f = jnp.maximum(zp, 1).astype(jnp.float32)
    violating = viol_cnt > 0
    keep_hi = 1.0 - (n_colors - 1) * eps
    if kind in (ProposalKind.DECREASE_LINE, ProposalKind.DECREASE_EXP):
        if params.lambda_ == 0.0:
            denom_r = zp_f
        else:
            denom_r = (1.0 - jnp.exp(-lam * zp_f)) / (1.0 - jnp.exp(-lam))

    def q_chunk(k, free_prefix):
        """[B, chunk] proposal probabilities of chunk k (mirrors
        _proposal_q branch for branch) and the free count it adds."""
        occk = _occ_chunk(nc, k, chunk)
        colk = cols_of(k)
        validk = colk < n_colors
        freek = ~occk & validk
        col_is_cur = colk == cur[:, None]
        keep_q = jnp.where(col_is_cur, keep_hi, eps)
        if kind == ProposalKind.STANDARD:
            move_q = jnp.where(
                freek,
                ((1.0 - eps * zn.astype(jnp.float32)) / zp_f)[:, None],
                eps,
            )
        elif kind in (ProposalKind.DECREASE_LINE, ProposalKind.DECREASE_EXP):
            pk = p_row(k)
            j = (
                free_prefix[:, None]
                + _cumsum_lanes(freek.astype(jnp.float32), axis=1)
                - 1.0
            )
            if params.lambda_ == 0.0:
                w = jnp.ones_like(j) / denom_r[:, None]
            else:
                w = jnp.exp(-lam * j) / denom_r[:, None]
            move_q = jnp.where(
                freek, pk[None, :] + reminder[:, None] * w, eps
            )
        else:  # BALANCE_LINE / BALANCE_EXP / BALANCE_DYNAMIC
            pk = p_row(k)
            move_q = jnp.where(
                freek, pk[None, :] + (reminder / zp_f)[:, None], eps
            )
        q = jnp.where((violating & (zp > 0))[:, None], move_q, keep_q)
        q = jnp.where((zp == 0)[:, None], col_is_cur.astype(jnp.float32), q)
        q = jnp.where(validk, q, 0.0)
        return q, jnp.sum(freek.astype(jnp.float32), axis=1)

    # ---- pass 2: inverse-CDF walk with running prefix --------------------
    def pass2(k, carry):
        prefix, below, free_prefix = carry
        q, nfree = q_chunk(k, free_prefix)
        cdf = prefix[:, None] + _cumsum_lanes(q, axis=1)
        below = below + jnp.sum(
            (cdf < unif[:, None]).astype(jnp.int32), axis=1
        )
        return cdf[:, chunk - 1], below, free_prefix + nfree

    _, below, _ = jax.lax.fori_loop(
        0, n_chunks, pass2, (zero_f, zero_i, zero_f)
    )
    chosen = jnp.minimum(below, jnp.int32(n_colors - 1))

    # ---- pass 3: probability of the chosen color ------------------------
    def pass3(k, carry):
        qstar, free_prefix = carry
        q, nfree = q_chunk(k, free_prefix)
        qstar = qstar + jnp.sum(
            jnp.where(cols_of(k) == chosen[:, None], q, 0.0), axis=1
        )
        return qstar, free_prefix + nfree

    qstar, _ = jax.lax.fori_loop(0, n_chunks, pass3, (zero_f, zero_f))
    return chosen, qstar


def _kernel_chunked(
    nc_ref,
    neigh_ref,
    gid_ref,
    cur_ref,
    taboo_ref,
    unif_ref,
    p_eff_ref,   # [n_chunks, chunk] (unlike the single-pass [1, nColPad])
    eps_ref,
    star_ref,
    qstar_ref,
    taboo_out_ref,
    conf_ref,
    *,
    params: MCMCParams,
    n_col_pad: int,
):
    """Wide-palette variant of `_kernel`: same contract, color axis walked
    in _COLOR_CHUNK windows (see module note above)."""
    n_colors = params.n_colors
    nc = nc_ref[:]
    b = nc.shape[0]
    rows = b // 128
    cur = cur_ref[0:rows, :].reshape(b)
    unif = unif_ref[0:rows, :].reshape(b)
    taboo = taboo_ref[0:rows, :].reshape(b)
    gids = gid_ref[0:rows, :].reshape(b)
    eps = eps_ref[0, 0]

    same = (nc == cur[:, None]) & (neigh_ref[:] > gids[:, None])
    conf = jnp.sum(same.astype(jnp.int32), axis=1)
    conf_ref[0:rows, :] = conf.reshape(rows, 128)

    chosen, qstar = _proposal_sample_chunked(
        cur,
        nc,
        unif,
        p_eff_ref,
        eps,
        params=params,
        n_col_pad=n_col_pad,
        chunk=_COLOR_CHUNK,
    )

    t_act = taboo > 0
    keep_prob = 1.0 - (n_colors - 1) * eps
    chosen = jnp.where(t_act, cur, chosen)
    qstar = jnp.where(t_act, keep_prob, qstar)
    new_taboo = jnp.where(
        t_act,
        taboo - 1,
        jnp.where(chosen == cur, jnp.int32(params.taboo_iterations), 0),
    )
    star_ref[0:rows, :] = chosen.reshape(rows, 128)
    qstar_ref[0:rows, :] = qstar.reshape(rows, 128)
    taboo_out_ref[0:rows, :] = new_taboo.reshape(rows, 128)


def _kernel(
    nc_ref,      # [B, d_pad] int32 neighbor colors (-1 padding)
    neigh_ref,   # [B, d_pad] int32 neighbor ids (sentinel n_pad padding)
    gid_ref,     # [8, 128] int32 tile; rows 0..B/128-1 hold this block's
                 # global vertex ids (rows need not be contiguous: the
                 # active-set path passes a gathered subset)
    cur_ref,     # [8, 128] int32 tile: current colors
    taboo_ref,   # [8, 128] int32 tile
    unif_ref,    # [8, 128] f32 tile: pre-drawn uniforms
    p_eff_ref,   # [1, nColPad] f32 variant distribution (zero-padded)
    eps_ref,     # [1, 1] f32 effective epsilon (SMEM)
    star_ref,    # [8, 128] int32 out tile
    qstar_ref,   # [8, 128] f32 out tile
    taboo_out_ref,  # [8, 128] int32 out tile
    conf_ref,    # [8, 128] int32 out tile — per-vertex conflict counts of
                 # the CURRENT coloring (dedup: neighbor id > own id),
                 # fused here so the chain loop needs ONE neighbor-color
                 # gather per iteration (the reference does calcConflicts
                 # as a separate kernel + reduction, _utils.cu:184-198)
    *,
    params: MCMCParams,
    n_col_pad: int,
):
    from mcmc_colorer_tpu.models.mcmc import _proposal_q, _sample_cdf

    n_colors = params.n_colors
    n_words = n_col_pad // 32
    nc = nc_ref[:]
    b = nc.shape[0]

    # ---- bit-packed occupancy: the functional colorsChecker fill --------
    # Striped layout: color c ↔ word (c mod W), bit (c div W).  This makes
    # the word→color expansion a pure tile-repeat (pltpu.repeat tiles the
    # whole word vector) plus a blockwise shift — no per-lane word gather.
    # lax.rem/div are C-style: nc = -1 (padding) → word -1, matches no w.
    hi = jax.lax.rem(nc, jnp.int32(n_words))
    bit = jax.lax.shift_left(
        jnp.ones_like(nc), jax.lax.div(nc, jnp.int32(n_words))
    )
    words = []
    zero = jnp.zeros_like(nc)
    for w in range(n_words):
        vals = jnp.where(hi == w, bit, zero)
        words.append(_or_reduce_cols(vals))
    occ_words = jnp.concatenate(words, axis=1)        # [B, W]

    # ---- expand words → [B, nColPad] occupancy bools --------------------
    expanded = pltpu.repeat(occ_words, 32, axis=1)     # [B, W*32], tiled
    shifts = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (b, n_col_pad), 1),
        jnp.int32(n_words),
    )
    occ = (
        jnp.bitwise_and(
            jax.lax.shift_right_logical(expanded, shifts), 1
        )
        == 1
    )

    rows = b // 128
    cur = cur_ref[0:rows, :].reshape(b)
    unif = unif_ref[0:rows, :].reshape(b)
    taboo = taboo_ref[0:rows, :].reshape(b)
    gids = gid_ref[0:rows, :].reshape(b)
    eps = eps_ref[0, 0]

    # ---- fused conflict count of the current coloring -------------------
    same = (nc == cur[:, None]) & (neigh_ref[:] > gids[:, None])
    conf = jnp.sum(same.astype(jnp.int32), axis=1)
    conf_ref[0:rows, :] = conf.reshape(rows, 128)

    # ---- shared proposal formula + inverse-CDF sample -------------------
    q = _proposal_q(
        cur,
        occ,
        params,
        p_eff_ref[0, :],
        eps=eps,
        n_colors=n_colors,
        cumsum=_cumsum_lanes,
    )
    chosen = _sample_cdf(q, unif, n_colors=n_colors, cumsum=_cumsum_lanes)
    col_is_chosen = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n_col_pad), 1)
        == chosen[:, None]
    )
    qstar = jnp.sum(jnp.where(col_is_chosen, q, 0.0), axis=1)

    # ---- taboo: explicit keep (SURVEY §9.5) -----------------------------
    t_act = taboo > 0
    keep_prob = 1.0 - (n_colors - 1) * eps
    chosen = jnp.where(t_act, cur, chosen)
    qstar = jnp.where(t_act, keep_prob, qstar)
    new_taboo = jnp.where(
        t_act,
        taboo - 1,
        jnp.where(chosen == cur, jnp.int32(params.taboo_iterations), 0),
    )

    star_ref[0:rows, :] = chosen.reshape(rows, 128)
    qstar_ref[0:rows, :] = qstar.reshape(rows, 128)
    taboo_out_ref[0:rows, :] = new_taboo.reshape(rows, 128)


@functools.partial(
    jax.jit,
    static_argnames=("params", "block", "interpret"),
)
def pallas_sweep(
    nc: jnp.ndarray,       # [n_pad, d_pad] int32 neighbor colors (-1 pad)
    neighbors: jnp.ndarray,  # [n_pad, d_pad] int32 neighbor ids
    cur: jnp.ndarray,      # [n_pad] int32
    taboo: jnp.ndarray,    # [n_pad] int32
    unif: jnp.ndarray,     # [n_pad] f32
    p_eff: jnp.ndarray,    # [nCol] f32 (or dummy zeros for STANDARD)
    eps: jnp.ndarray,      # scalar f32 effective epsilon
    *,
    params: MCMCParams,
    block: int = 128,
    interpret: bool = False,
    self_ids: jnp.ndarray | None = None,  # [n_pad] global vertex ids; defaults
                                          # to arange (full-sweep layout)
):
    """One full proposal sweep with fused conflict counting.  Returns
    (star, qstar, new_taboo, conflicts) — conflicts is the scalar
    conflict-edge count of the CURRENT coloring.  ``n_pad`` must be a
    multiple of ``block``."""
    if jax.default_backend() == "cpu":
        interpret = True  # Mosaic targets TPU; CPU runs the interpreter
    n_pad, d_pad = nc.shape
    assert n_pad % block == 0, (n_pad, block)
    n_col_pad = _round_up(params.n_colors, 128)
    chunked = n_col_pad > 3072  # single-pass VMEM bound (PERF.md)
    if chunked:
        n_col_pad = _round_up(n_col_pad, _COLOR_CHUNK)
    p_eff_pad = jnp.zeros((1, n_col_pad), jnp.float32)
    p_eff_pad = p_eff_pad.at[0, : params.n_colors].set(
        p_eff.astype(jnp.float32)
    )
    if chunked:
        # the chunked kernel indexes p_eff by (chunk row, lane) so the
        # per-chunk slice is a dynamic SUBLANE read, not a lane slice
        p_eff_pad = p_eff_pad.reshape(
            n_col_pad // _COLOR_CHUNK, _COLOR_CHUNK
        )
    p_eff_spec = pl.BlockSpec(
        p_eff_pad.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    grid = (n_pad // block,)
    kernel = functools.partial(
        _kernel_chunked if chunked else _kernel,
        params=params,
        n_col_pad=n_col_pad,
    )
    assert block % 128 == 0, block
    vec_spec = pl.BlockSpec(
        (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def v(x):
        return _vec_pack(x, block)
    star, qstar, new_taboo, conf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
            p_eff_spec,
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // block * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_pad // block * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // block * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_pad // block * 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        nc,
        neighbors,
        v(
            self_ids
            if self_ids is not None
            else jnp.arange(n_pad, dtype=jnp.int32)
        ),
        v(cur),
        v(taboo),
        v(unif),
        p_eff_pad,
        eps[None, None],
    )
    return (
        _vec_unpack(star, block, n_pad),
        _vec_unpack(qstar, block, n_pad),
        _vec_unpack(new_taboo, block, n_pad),
        jnp.sum(_vec_unpack(conf, block, n_pad)),
    )
