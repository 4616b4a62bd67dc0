"""Pallas bit-matmul: NC = unpack(A_packed) @ onehot(colors) on the MXU.

The speed-of-light formulation of the sweep's neighbor color counts
(the hot loop of the reference, coloringMCMC_balance.cu:79-143): the
dense int8 backend (ops/dense_adj.py) already moved the per-edge cost
from the 133M elem/s gather unit to the MXU, but it streams the full
n_pad^2-byte adjacency from HBM every sweep and caps at n_pad<=102400.
This kernel streams the **bit-packed** adjacency instead — n_pad^2/8
bytes, 8x less HBM traffic — and unpacks it in VMEM on the fly:

- A is packed in the ``packed_bit_coords`` order (dense_adj.py): within
  each 4096-column window, column jl lives in word jl%128, bit jl//128.
  A [BI, 128]-word block then unpacks with ONE tile-semantics
  ``pltpu.repeat`` along lanes plus a lane-indexed logical shift — the
  same striped-word trick as the resample kernel's occupancy expansion
  (pallas_resample.py:124-152), no gathers.
- The onehot operand is never materialised in HBM at all: the kernel
  rebuilds the [4096, BC] window from the raw color ids (16 KB per
  window) with an iota compare on the VPU, overlapped with the MXU.
- Accumulation runs over the k grid axis (innermost) into the output
  block, int8 x int8 -> int32 on the MXU.

Per sweep the kernel reads n_c * n_pad^2/8 + n_k*n_c*16K bytes and
writes n_pad*C*4, where n_c = n_col_pad / BC is the number of
color-window grid steps: each packed block is refetched once per color
window (the cost_estimate encodes this), so the packed A streams exactly
once only when n_col_pad <= BIT_MM_BLOCK_COLS.  At n=100k, nCol<=1024
that is ~1.3 GB vs the dense path's ~10.6 GB; at nCol=3072 it is ~3.9 GB
(still 2.7x less).  Above the dense cap it is the only MXU formulation
that fits: packed A at n_pad=286720 is 10.3 GB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_colorer_tpu.ops.dense_adj import PACKED_K_CHUNK

# rows per output block.  Hardware-probed at n_pad=100352, nCol=1152
# (scripts/probe_bitmm.py): 128 -> 187.9 ms/NC, 256 -> 115.6, 512 ->
# 81.3 (Mosaic fuses the unpack chain, so the [rows, 4096] temporaries
# never fully materialize); 1024 fails to compile (VMEM).  512 is ~75%
# of the pure-MXU floor (~61 ms of int8 MACs at this shape).
BIT_MM_BLOCK_ROWS = 512
# color-window width per grid step (onehot slab [4096, BC] int8 = 4 MB)
BIT_MM_BLOCK_COLS = 1024


def _kernel(pk_ref, col_ref, out_ref, *, bc: int):
    k = pl.program_id(2)
    c = pl.program_id(1)
    # ---- unpack the [BI, 128] word block to [BI, 4096] 0/1 ----------
    rep = pltpu.repeat(pk_ref[:], 32, axis=1)  # lane l -> word l % 128
    shifts = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1), jnp.int32(128)
    )
    bits = jnp.bitwise_and(
        jax.lax.shift_right_logical(rep, shifts.astype(jnp.uint32)),
        jnp.uint32(1),
    ).astype(jnp.int8)
    # ---- rebuild the onehot window [4096, BC] from raw color ids ----
    cw = col_ref[0]  # [32, 128] int32, element (s, t) = colors[k*4096+s*128+t]
    c_ids = c * bc + jax.lax.broadcasted_iota(jnp.int32, (32, 128, bc), 2)
    oh = (cw[:, :, None] == c_ids).astype(jnp.int8).reshape(
        PACKED_K_CHUNK, bc
    )
    # ---- MXU contraction, accumulated over the k axis ----------------
    acc = jax.lax.dot_general(
        bits,
        oh,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(
    jax.jit, static_argnames=("n_col_pad", "interpret", "block_rows")
)
def packed_nc_pallas(
    packed: jnp.ndarray,   # [n_pad, words] uint32 (packed_bit_coords order)
    colors: jnp.ndarray,   # [n_pad] int32, already masked (-1 = phantom)
    n_col_pad: int,
    *,
    interpret: bool = False,
    block_rows: int = BIT_MM_BLOCK_ROWS,
) -> jnp.ndarray:
    """[n_pad, n_col_pad] int32 neighbor color counts."""
    if jax.default_backend() == "cpu":
        interpret = True  # Mosaic targets TPU; CPU runs the interpreter
    n_pad, words = packed.shape
    while n_pad % block_rows:
        block_rows //= 2
    if block_rows < 8:
        raise ValueError(f"n_pad={n_pad} not a multiple of 8 rows")
    if words % 128:
        raise ValueError(f"words={words} not a multiple of 128")
    if n_col_pad % 128:
        raise ValueError(f"n_col_pad={n_col_pad} not a multiple of 128")
    n_k = words // 128
    k_total = n_k * PACKED_K_CHUNK
    # the color-window width must divide n_col_pad: largest 128-multiple
    # divisor <= BIT_MM_BLOCK_COLS (worst case 128, which always divides)
    bc = max(
        c
        for c in range(128, BIT_MM_BLOCK_COLS + 1, 128)
        if n_col_pad % c == 0
    )
    n_c = n_col_pad // bc
    # pad by the COLOR source length (== rows for the square adjacency;
    # rows is a shard strip height in the sharded formulation)
    colors_k = jnp.pad(
        colors,
        (0, k_total - colors.shape[0]),
        constant_values=jnp.int32(-1),
    ).reshape(n_k, 32, 128)
    grid = (n_pad // block_rows, n_c, n_k)
    return pl.pallas_call(
        functools.partial(_kernel, bc=bc),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, 128),
                lambda i, c, k: (i, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 32, 128),
                lambda i, c, k: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, bc), lambda i, c, k: (i, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_col_pad), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_total * n_col_pad,
            bytes_accessed=n_pad * words * 4 * n_c
            + n_pad * n_col_pad * 4,
            transcendentals=0,
        ),
    )(packed, colors_k)
