"""Masked first-fit Pallas kernel (GreedyFF / VFF hot op).

The reference's tentative_coloring / tentative_rebalancing kernels scan a
per-vertex forbidden-color array for the lowest admissible color
(coloringGreedyFF.cu:88-128, coloringVFF.cu:352-388).  The XLA
formulation needs an n×maxColors scatter (serialised on TPU); this kernel
reuses the bit-packed VMEM occupancy of the resample kernel and reduces
``argmax(free & allowed)`` on the VPU.

Returns, per vertex: the smallest color that is not used by any neighbor
AND allowed by the caller's mask, or -1 when none exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_palette_ok(n_colors: int) -> bool:
    """Whether the first-fit/resample kernels can serve this palette.

    The single-pass kernels' [block, paletted] VMEM temporaries cap at
    ~3072 colors (measured: 2304 runs, 4992 overflows — PERF.md); above
    that both kernels switch to the chunked color walk
    (pallas_resample._occ_words_chunked) whose VMEM high-water is
    O(chunk) + the packed words, so the bound is now only the words
    buffer — capped generously here."""
    return _round_up(n_colors, 128) <= 32768


# Round-1 folklore said this kernel "faults the TPU worker inside
# lax.while_loops above ~2^18 rows".  Round 2 root-caused the fault: any
# single XLA program execution past the ~60 s wall kills the worker
# (utils/segmented.py) — tall first-fit loops simply ran long.  The kernel
# itself has no row bound; callers now segment their loops instead of
# gating on rows.


def _kernel(
    nc_ref,      # [B, d_pad] int32 neighbor colors (-1 padding)
    cur_ref,     # [8, 128] int32 tile: own color to exclude (-1 = none;
                 # VFF forbids the current color, coloringVFF.cu:371-372)
    allow_ref,   # [1, nColPad] int32 (1 = admissible target color)
    out_ref,     # [8, 128] int32 tile: smallest free∧allowed color or -1
    *,
    n_colors: int,
    n_col_pad: int,
):
    from mcmc_colorer_tpu.ops.pallas_resample import _or_reduce_cols

    n_words = n_col_pad // 32
    nc = nc_ref[:]
    b = nc.shape[0]

    # striped bit-packed occupancy (see pallas_resample._kernel)
    hi = jax.lax.rem(nc, jnp.int32(n_words))
    bit = jax.lax.shift_left(
        jnp.ones_like(nc), jax.lax.div(nc, jnp.int32(n_words))
    )
    words = []
    zero = jnp.zeros_like(nc)
    for w in range(n_words):
        vals = jnp.where(hi == w, bit, zero)
        words.append(_or_reduce_cols(vals))
    occ_words = jnp.concatenate(words, axis=1)

    expanded = pltpu.repeat(occ_words, 32, axis=1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n_col_pad), 1)
    shifts = jax.lax.div(col_ids, jnp.int32(n_words))
    occ = (
        jnp.bitwise_and(
            jax.lax.shift_right_logical(expanded, shifts), 1
        )
        == 1
    )
    rows = b // 128
    cur = cur_ref[0:rows, :].reshape(b)
    eligible = (
        (~occ)
        & (col_ids < n_colors)
        & (allow_ref[:] != 0)
        & (col_ids != cur[:, None])
    )
    # smallest eligible color: min over (col if eligible else BIG)
    big = jnp.int32(n_col_pad)
    cand = jnp.min(jnp.where(eligible, col_ids, big), axis=1)
    out = jnp.where(cand >= n_colors, jnp.int32(-1), cand)
    out_ref[0:rows, :] = out.reshape(rows, 128)


def _kernel_chunked(
    nc_ref,      # [B, d_pad] int32 neighbor colors (-1 padding)
    cur_ref,     # [8, 128] int32 tile: own color to exclude (-1 = none)
    allow_ref,   # [n_chunks, chunk] int32 (1 = admissible target color)
    out_ref,     # [8, 128] int32 tile: smallest free∧allowed color or -1
    *,
    n_colors: int,
    n_col_pad: int,
):
    """Wide-palette first-fit: a running min over _COLOR_CHUNK-wide color
    windows inside a fori_loop (the loop bounds VMEM — see
    pallas_resample's chunked-section note)."""
    from mcmc_colorer_tpu.ops.pallas_resample import _COLOR_CHUNK, _occ_chunk

    chunk = _COLOR_CHUNK
    nc = nc_ref[:]
    b = nc.shape[0]
    rows = b // 128
    cur = cur_ref[0:rows, :].reshape(b)
    big = jnp.int32(n_col_pad)

    def body(k, cand):
        occk = _occ_chunk(nc, k, chunk)
        colk = k * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (b, chunk), 1
        )
        allowk = allow_ref[k, :]  # dynamic sublane read
        eligible = (
            (~occk)
            & (colk < n_colors)
            & (allowk[None, :] != 0)
            & (colk != cur[:, None])
        )
        return jnp.minimum(
            cand, jnp.min(jnp.where(eligible, colk, big), axis=1)
        )

    cand = jax.lax.fori_loop(
        0, n_col_pad // chunk, body, jnp.full((b,), big, jnp.int32)
    )
    out = jnp.where(cand >= n_colors, jnp.int32(-1), cand)
    out_ref[0:rows, :] = out.reshape(rows, 128)


@functools.partial(
    jax.jit, static_argnames=("n_colors", "block", "interpret")
)
def pallas_first_fit(
    nc: jnp.ndarray,        # [n_pad, d_pad] int32 neighbor colors
    allow: jnp.ndarray,     # [n_colors] bool/int — admissible target colors
    *,
    n_colors: int,
    block: int = 128,
    interpret: bool = False,
    cur: jnp.ndarray | None = None,  # [n_pad] own colors to exclude
):
    """[n_pad] int32: per vertex the smallest admissible free color
    (-1 if none)."""
    if jax.default_backend() == "cpu":
        interpret = True
    n_pad, d_pad = nc.shape
    assert n_pad % block == 0 and block % 128 == 0
    n_col_pad = _round_up(n_colors, 128)
    chunked = n_col_pad > 3072  # single-pass VMEM bound (PERF.md)
    from mcmc_colorer_tpu.ops.pallas_resample import (
        _COLOR_CHUNK,
        _vec_pack,
        _vec_unpack,
    )

    if chunked:
        n_col_pad = _round_up(n_col_pad, _COLOR_CHUNK)
    allow_pad = jnp.zeros((1, n_col_pad), jnp.int32)
    allow_pad = allow_pad.at[0, :n_colors].set(allow.astype(jnp.int32))
    if chunked:
        # per-chunk rows so the kernel's slice is a dynamic SUBLANE read
        allow_pad = allow_pad.reshape(
            n_col_pad // _COLOR_CHUNK, _COLOR_CHUNK
        )
    allow_spec = pl.BlockSpec(
        allow_pad.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_chunked if chunked else _kernel,
            n_colors=n_colors,
            n_col_pad=n_col_pad,
        ),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec(
                (block, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            allow_spec,
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad // block * 8, 128), jnp.int32
        ),
        interpret=interpret,
    )(
        nc,
        _vec_pack(
            (
                cur
                if cur is not None
                else jnp.full((n_pad,), -1, jnp.int32)
            ),
            block,
        ),
        allow_pad,
    )
    return _vec_unpack(out, block, n_pad)
