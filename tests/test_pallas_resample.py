"""The Pallas kernel must be bit-identical to the XLA sweep path (same
formulas, same CDF walk, same uniforms) — run in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
from mcmc_colorer_tpu.models.mcmc import (
    _needs_histogram,
    _sweep,
    _variant_distribution,
)
from mcmc_colorer_tpu.ops.neighbor import color_histogram, neighbor_colors
from mcmc_colorer_tpu.ops.pallas_resample import pallas_sweep


@pytest.mark.parametrize(
    "kind",
    [
        ProposalKind.STANDARD,
        ProposalKind.BALANCE_DYNAMIC,
        ProposalKind.DECREASE_EXP,
        ProposalKind.BALANCE_LINE,
    ],
)
@pytest.mark.parametrize("taboo_iters", [0, 3])
def test_pallas_matches_xla_sweep(medium_er, kind, taboo_iters):
    g = medium_er
    params = MCMCParams(
        n_colors=g.max_degree,
        proposal=kind,
        taboo_iterations=taboo_iters,
        epsilon=1e-4,
    )
    block = 128
    ell = g.to_ell(pad_nodes_to=block)
    n_pad = ell.n_pad
    key = jax.random.key(5)
    k1, k2, k3 = jax.random.split(key, 3)
    colors = jnp.where(
        ell.node_mask,
        jax.random.randint(k1, (n_pad,), 0, params.n_colors, jnp.int32),
        jnp.int32(params.n_colors),
    )
    taboo = jax.random.randint(k2, (n_pad,), 0, 2, jnp.int32)
    unif = jax.random.uniform(k3, (n_pad,), dtype=jnp.float32)

    hist = (
        color_histogram(colors, params.n_colors, ell.node_mask)
        if _needs_histogram(params)
        else None
    )
    p_eff = _variant_distribution(params, hist, ell.n_nodes)

    star_x, taboo_x, _ = _sweep(ell, params, block, colors, taboo, unif, p_eff)

    nc = neighbor_colors(ell.neighbors, colors)
    p_eff_arr = (
        p_eff
        if p_eff is not None
        else jnp.zeros((params.n_colors,), jnp.float32)
    )
    star_p, qstar_p, taboo_p, conf_p = pallas_sweep(
        nc,
        ell.neighbors,
        colors,
        taboo,
        unif,
        p_eff_arr,
        jnp.float32(params.epsilon),
        params=params,
        block=block,
        interpret=True,
    )
    # phantom rows are masked outside the kernel
    star_p = jnp.where(ell.node_mask, star_p, colors)

    real = np.asarray(ell.node_mask)
    np.testing.assert_array_equal(
        np.asarray(star_p)[real], np.asarray(star_x)[real]
    )
    np.testing.assert_array_equal(
        np.asarray(taboo_p)[real], np.asarray(taboo_x)[real]
    )
    q = np.asarray(qstar_p)[real]
    assert (q > 0).all() and (q <= 1.0 + 1e-5).all()
    # fused conflict count matches the standalone reduction
    from mcmc_colorer_tpu.models.mcmc import _conflict_edges

    assert int(conf_p) == int(_conflict_edges(ell, colors))


def test_fused_chain_matches_xla_chain(medium_er):
    """The fused pallas chain (interpret mode on CPU) must converge like
    the XLA chain and produce a valid coloring."""
    from mcmc_colorer_tpu.models.base import check_coloring
    from mcmc_colorer_tpu.models.mcmc import MCMCColorer

    params = MCMCParams(
        n_colors=medium_er.max_degree,
        proposal=ProposalKind.BALANCE_DYNAMIC,
        taboo_iterations=2,
    )
    r_pal = MCMCColorer(medium_er, params, backend="pallas").run(seed=31)
    r_xla = MCMCColorer(medium_er, params, backend="xla").run(seed=31)
    assert r_pal.extra["final_conflicts"] == 0
    assert r_xla.extra["final_conflicts"] == 0
    assert check_coloring(medium_er, r_pal.colors)


def test_or_reduce_cols_all_widths():
    """The halving OR-tree must be exact for every width — widths that
    reduce to exactly 3 (24, 48, 768, ...) used to emit a zero-width
    slice that real Mosaic rejects."""
    import jax.numpy as jnp
    import numpy as np

    from mcmc_colorer_tpu.ops.pallas_resample import _or_reduce_cols

    rng = np.random.default_rng(0)
    for d in [1, 2, 3, 5, 6, 8, 12, 24, 48, 97, 128, 768, 2304]:
        x = rng.integers(0, 2**31 - 1, size=(4, d), dtype=np.int32)
        got = np.asarray(_or_reduce_cols(jnp.asarray(x)))
        want = np.bitwise_or.reduce(x, axis=1, keepdims=True)
        assert np.array_equal(got, want), d


# ------------------- chunked color axis (wide palettes) ---------------------


@pytest.mark.parametrize(
    "kind",
    [
        ProposalKind.STANDARD,
        ProposalKind.BALANCE_DYNAMIC,
        ProposalKind.DECREASE_EXP,
    ],
)
def test_chunked_kernel_wide_palette_matches_xla(kind):
    """Palettes beyond the single-pass ~3k VMEM bound route through the
    chunked color walk — it must reproduce the XLA sweep exactly (same
    formulas, same uniforms)."""
    from mcmc_colorer_tpu.graph.generate import erdos_renyi

    g = erdos_renyi(512, 0.05, seed=3, use_native=False)
    params = MCMCParams(
        n_colors=4500,  # n_col_pad 4608 > 3072 -> chunked path
        proposal=kind,
        taboo_iterations=2,
        epsilon=1e-6,
    )
    block = 128
    ell = g.to_ell(pad_nodes_to=block)
    n_pad = ell.n_pad
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    colors = jnp.where(
        ell.node_mask,
        jax.random.randint(k1, (n_pad,), 0, params.n_colors, jnp.int32),
        jnp.int32(params.n_colors),
    )
    taboo = jax.random.randint(k2, (n_pad,), 0, 2, jnp.int32)
    unif = jax.random.uniform(k3, (n_pad,), dtype=jnp.float32)
    hist = (
        color_histogram(colors, params.n_colors, ell.node_mask)
        if _needs_histogram(params)
        else None
    )
    p_eff = _variant_distribution(params, hist, ell.n_nodes)
    star_x, taboo_x, _ = _sweep(
        ell, params, block, colors, taboo, unif, p_eff
    )
    nc = neighbor_colors(ell.neighbors, colors)
    p_eff_arr = (
        p_eff
        if p_eff is not None
        else jnp.zeros((params.n_colors,), jnp.float32)
    )
    star_p, qstar_p, taboo_p, conf_p = pallas_sweep(
        nc,
        ell.neighbors,
        colors,
        taboo,
        unif,
        p_eff_arr,
        jnp.float32(params.epsilon),
        params=params,
        block=block,
        interpret=True,
    )
    real = np.asarray(ell.node_mask)
    assert np.array_equal(
        np.asarray(star_p)[real], np.asarray(star_x)[real]
    )
    assert np.array_equal(
        np.asarray(taboo_p)[real], np.asarray(taboo_x)[real]
    )
    # qstar must equal the XLA q at the chosen color
    from mcmc_colorer_tpu.models.mcmc import _proposal_q
    from mcmc_colorer_tpu.ops.neighbor import occupancy_matrix

    occ = occupancy_matrix(nc, params.n_colors)
    q_x = _proposal_q(colors, occ, params, p_eff)
    q_sel = np.take_along_axis(
        np.asarray(q_x), np.asarray(star_x)[:, None], axis=1
    )[:, 0]
    tb = np.asarray(taboo) > 0
    keep = 1.0 - (params.n_colors - 1) * params.epsilon
    expect = np.where(tb, keep, q_sel)
    assert np.allclose(np.asarray(qstar_p)[real], expect[real], atol=1e-6)


def test_fused_sweep_super_blocked_bitexact(medium_er):
    """Capping the per-super-block NC matrix (the ER(1M) compile-OOM fix,
    round 3) must not change the sweep: same stars, taboo and conflict
    count as the monolithic call."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
    from mcmc_colorer_tpu.models import mcmc as m

    g = medium_er
    ell = g.to_ell(pad_nodes_to=128)
    params = MCMCParams(
        n_colors=g.max_degree,
        proposal=ProposalKind.BALANCE_DYNAMIC,
        taboo_iterations=2,
    )
    key = jax.random.key(3)
    k_c, k_u = jax.random.split(key)
    colors = jnp.where(
        ell.node_mask,
        jax.random.randint(k_c, (ell.n_pad,), 0, params.n_colors, jnp.int32),
        jnp.int32(params.n_colors),
    )
    taboo = jnp.zeros((ell.n_pad,), jnp.int32)
    unif = jax.random.uniform(k_u, (ell.n_pad,), dtype=jnp.float32)
    from mcmc_colorer_tpu.models.mcmc import _variant_distribution
    from mcmc_colorer_tpu.ops.neighbor import color_histogram

    hist = color_histogram(colors, params.n_colors, ell.node_mask)
    p_eff = _variant_distribution(params, hist, g.n)

    ref = m._sweep_pallas_fused(ell, params, 128, colors, taboo, unif, p_eff)
    assert m._fused_super_block(ell.n_pad, ell.neighbors.shape[1]) == ell.n_pad
    cap_old = m._FUSED_NC_BYTES_CAP
    try:
        m._FUSED_NC_BYTES_CAP = 128 * ell.neighbors.shape[1] * 4  # SB=128
        assert m._fused_super_block(ell.n_pad, ell.neighbors.shape[1]) == 128
        got = m._sweep_pallas_fused(
            ell, params, 128, colors, taboo, unif, p_eff
        )
    finally:
        m._FUSED_NC_BYTES_CAP = cap_old
    for a, b in zip(ref[:2], got[:2]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.isclose(float(ref[2]), float(got[2]), rtol=1e-5)
    assert int(ref[3]) == int(got[3])
