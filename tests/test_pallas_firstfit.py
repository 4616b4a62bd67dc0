"""The first-fit kernel (interpret mode) must agree with the XLA
formulation, and the pallas-backend GFF/VFF must match the xla backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.models.greedy_ff import GreedyFFColorer
from mcmc_colorer_tpu.models.vff import VFFColorer
from mcmc_colorer_tpu.ops.neighbor import neighbor_colors, occupancy_matrix
from mcmc_colorer_tpu.ops.pallas_firstfit import pallas_first_fit


def test_first_fit_kernel_matches_xla(medium_er):
    g = medium_er
    max_colors = g.max_degree + 1
    block = 128
    ell = g.to_ell(pad_nodes_to=block)
    key = jax.random.key(1)
    # partial coloring with some uncolored (-1)
    colors = jax.random.randint(
        key, (ell.n_pad,), -1, max_colors, dtype=jnp.int32
    )
    nc = neighbor_colors(ell.neighbors, colors)
    allow = np.ones(max_colors, bool)
    allow[::7] = False  # arbitrary mask
    out = pallas_first_fit(
        nc,
        jnp.asarray(allow),
        n_colors=max_colors,
        block=block,
        interpret=True,
        cur=colors,
    )
    occ = occupancy_matrix(nc, max_colors)
    col_ids = jnp.arange(max_colors)[None, :]
    eligible = (
        (~occ) & jnp.asarray(allow)[None, :] & (col_ids != colors[:, None])
    )
    expect = jnp.where(
        jnp.any(eligible, axis=1),
        jnp.argmax(eligible, axis=1),
        -1,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_gff_backends_agree(medium_er):
    a = GreedyFFColorer(medium_er, backend="xla").run()
    b = GreedyFFColorer(medium_er, backend="pallas").run()
    assert np.array_equal(a.colors, b.colors)  # deterministic algorithm
    assert check_coloring(medium_er, b.colors)


def test_vff_backends_agree(medium_er):
    a = VFFColorer(medium_er, backend="xla").run()
    b = VFFColorer(medium_er, backend="pallas").run()
    assert check_coloring(medium_er, b.colors)
    assert np.array_equal(a.colors, b.colors)


def test_chunked_first_fit_wide_palette():
    """Wide palettes (> 3072) route through the chunked first-fit kernel;
    compare against a numpy reference over random rows, with an allow
    mask and own-color exclusion."""
    import numpy as np

    from mcmc_colorer_tpu.ops.pallas_firstfit import (
        pallas_first_fit,
        pallas_palette_ok,
    )

    assert pallas_palette_ok(4500) and pallas_palette_ok(20000)
    assert not pallas_palette_ok(40000)
    rng = np.random.default_rng(11)
    n_pad, d_pad, n_colors = 256, 40, 4500
    nc = rng.integers(-1, n_colors, size=(n_pad, d_pad), dtype=np.int32)
    allow = rng.integers(0, 2, size=(n_colors,), dtype=np.int32)
    allow[:64] = 0  # force some first-fits deep into the palette
    cur = rng.integers(-1, n_colors, size=(n_pad,), dtype=np.int32)
    got = np.asarray(
        pallas_first_fit(
            jnp.asarray(nc),
            jnp.asarray(allow),
            n_colors=n_colors,
            block=128,
            cur=jnp.asarray(cur),
            interpret=True,
        )
    )
    for v in range(n_pad):
        occ = np.zeros(n_colors, bool)
        row = nc[v][(nc[v] >= 0) & (nc[v] < n_colors)]
        occ[row] = True
        elig = ~occ & (allow != 0)
        if 0 <= cur[v] < n_colors:
            elig[cur[v]] = False
        want = int(np.argmax(elig)) if elig.any() else -1
        assert got[v] == want, (v, got[v], want)
