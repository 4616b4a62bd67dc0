import numpy as np

from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.models.greedy_ff import GreedyFFColorer
from mcmc_colorer_tpu.models.greedy_seq import SequentialGreedyColorer
from mcmc_colorer_tpu.models.luby import LubyColorer
from mcmc_colorer_tpu.models.vff import VFFColorer


def test_luby_valid(small_er):
    r = LubyColorer(small_er).run(seed=1)
    assert check_coloring(small_er, r.colors)
    assert (r.colors >= 0).all() and (r.colors < r.n_colors).all()
    # MIS peel uses at most maxDeg+1 colors
    assert r.n_colors <= small_er.max_degree + 1


def test_luby_medium(medium_er):
    r = LubyColorer(medium_er).run(seed=2)
    assert check_coloring(medium_er, r.colors)


def test_greedy_ff_valid(small_er):
    r = GreedyFFColorer(small_er).run()
    assert check_coloring(small_er, r.colors)
    assert r.n_colors <= small_er.max_degree + 1


def test_greedy_ff_medium(medium_er):
    r = GreedyFFColorer(medium_er).run()
    assert check_coloring(medium_er, r.colors)


def test_vff_stays_in_palette(small_er, medium_er):
    """Rebalancing must not invent colors beyond the GFF palette
    (reference coloringVFF.cu:381 scans only the used colors)."""
    for g in (small_er, medium_er):
        r = VFFColorer(g).run()
        assert int(np.max(r.colors)) < r.n_colors
        assert len(np.unique(r.colors)) <= r.n_colors


def test_vff_valid_and_balanced(medium_er):
    gff = GreedyFFColorer(medium_er).run()
    vff = VFFColorer(medium_er).run()
    assert check_coloring(medium_er, vff.colors)
    if not vff.extra["livelock_fallback"]:
        # rebalancing must not worsen the size spread
        assert vff.class_stats()["std"] <= gff.class_stats()["std"] + 1e-6


def test_greedy_seq(small_er):
    r = SequentialGreedyColorer(small_er).run()
    assert check_coloring(small_er, r.colors)
    assert r.n_colors <= small_er.max_degree + 1


def test_determinism_gff(medium_er):
    a = GreedyFFColorer(medium_er).run()
    b = GreedyFFColorer(medium_er).run()
    assert np.array_equal(a.colors, b.colors)


def test_greedy_ff_active_matches_full(small_er, medium_er):
    """The frontier variant is behaviourally identical to the full loop
    (same deterministic first-fit + lowest-id-wins rules), so the final
    colorings must match exactly."""
    for g in (small_er, medium_er):
        full = GreedyFFColorer(g).run()
        act = GreedyFFColorer(g, active=True).run()
        assert np.array_equal(full.colors, act.colors)
        assert act.iterations == full.iterations


def test_greedy_ff_active_bucket_ladder(medium_er):
    # tiny buckets force several capacity switches through the ladder
    r = GreedyFFColorer(
        medium_er, active=True, min_bucket=128, bucket_factor=2
    ).run()
    assert check_coloring(medium_er, r.colors)
    assert r.n_colors <= medium_er.max_degree + 1


def test_luby_active_valid(small_er, medium_er):
    for g in (small_er, medium_er):
        r = LubyColorer(g, active=True).run(seed=5)
        assert check_coloring(g, r.colors)
        assert (r.colors >= 0).all() and (r.colors < r.n_colors).all()
        assert r.n_colors <= g.max_degree + 1


def test_vff_active_valid_and_balanced(small_er, medium_er):
    """Frontier VFF must keep the full variant's contract: valid coloring
    within the GFF palette; when no livelock fallback fired the class-size
    spread must not exceed the plain GFF one."""
    for g in (small_er, medium_er):
        gff = GreedyFFColorer(g).run()
        r = VFFColorer(g, active=True).run()
        assert check_coloring(g, r.colors)
        assert int(np.max(r.colors)) < r.n_colors
        if not r.extra["livelock_fallback"]:
            assert r.class_stats()["std"] <= gff.class_stats()["std"] + 1e-6


def test_vff_active_matches_full_palette(medium_er):
    full = VFFColorer(medium_er).run()
    act = VFFColorer(medium_er, active=True).run()
    # phase 1 is deterministic and identical, so the palettes agree
    assert act.n_colors == full.n_colors


def test_luby_active_classes_are_maximal(small_er):
    """Each peeled class must be a maximal independent set of the residual
    graph; for class 0 that means every vertex either is in it or has a
    neighbor in it (maximality over the whole graph)."""
    g = small_er
    r = LubyColorer(g, active=True).run(seed=9)
    in0 = r.colors == 0
    for v in range(g.n):
        if not in0[v]:
            assert in0[g.neighbors_of(v)].any(), v


# ---------------------- degree-bucketed layouts -----------------------------


def test_bucketed_gff_valid_and_welsh_powell(medium_er):
    """Bucketed GFF relabels hubs to low ids (Welsh-Powell order) — the
    coloring must be valid, stay in the palette bound, and not use more
    colors than the unordered flat loop on this graph family."""
    flat = GreedyFFColorer(medium_er).run()
    buck = GreedyFFColorer(medium_er, layout="bucketed").run()
    assert check_coloring(medium_er, buck.colors)
    assert buck.n_colors <= medium_er.max_degree + 1
    assert buck.n_colors <= flat.n_colors + 1


def test_bucketed_luby_valid():
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    g = barabasi_albert(2000, 8, seed=1, use_native=False)
    r = LubyColorer(g, layout="bucketed").run(seed=2)
    assert check_coloring(g, r.colors)
    assert (r.colors >= 0).all() and (r.colors < r.n_colors).all()


def test_bucketed_vff_valid_and_balanced(medium_er):
    r = VFFColorer(medium_er, layout="bucketed").run()
    assert check_coloring(medium_er, r.colors)
    assert int(np.max(r.colors)) < r.n_colors
    if not r.extra["livelock_fallback"]:
        gff = GreedyFFColorer(medium_er, layout="bucketed").run()
        assert r.class_stats()["std"] <= gff.class_stats()["std"] + 1e-6


# ----------------- frontier x bucketed compositions -------------------------
# (round-2: per-slice frontier row gathers, ops/neighbor.py:take_rows)


def _ba_graph(n=2000, m=8, seed=1):
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    return barabasi_albert(n, m, seed=seed, use_native=False)


def test_gff_active_bucketed_matches_full_bucketed(medium_er):
    """Both variants share the descending relabel and the deterministic
    first-fit + lower-id-wins rules, so the colorings match exactly."""
    g = _ba_graph()
    for graph in (medium_er, g):
        full = GreedyFFColorer(graph, layout="bucketed").run()
        act = GreedyFFColorer(graph, active=True, layout="bucketed").run()
        assert np.array_equal(full.colors, act.colors)
        assert act.iterations == full.iterations


def test_vff_active_bucketed_valid(medium_er):
    g = _ba_graph()
    for graph in (medium_er, g):
        r = VFFColorer(graph, active=True, layout="bucketed").run()
        assert check_coloring(graph, r.colors)
        assert int(np.max(r.colors)) < r.n_colors
        full = VFFColorer(graph, layout="bucketed").run()
        # phase 1 is deterministic and identical, so the palettes agree
        assert r.n_colors == full.n_colors


def test_luby_active_bucketed_valid_and_maximal():
    g = _ba_graph()
    r = LubyColorer(g, active=True, layout="bucketed").run(seed=5)
    assert check_coloring(g, r.colors)
    assert (r.colors >= 0).all() and (r.colors < r.n_colors).all()
    assert r.n_colors <= g.max_degree + 1
    in0 = r.colors == 0
    for v in range(g.n):
        if not in0[v]:
            assert in0[g.neighbors_of(v)].any(), v
