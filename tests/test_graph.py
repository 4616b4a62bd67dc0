import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_colorer_tpu.graph.container import Graph
from mcmc_colorer_tpu.graph.generate import _linear_to_triu, erdos_renyi
from mcmc_colorer_tpu.graph import io as gio


def test_linear_to_triu_roundtrip():
    n = 37
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    idx = np.arange(len(pairs), dtype=np.int64)
    i, j = _linear_to_triu(idx, n)
    assert [(a, b) for a, b in zip(i, j)] == pairs


def test_er_structure():
    g = erdos_renyi(200, 0.05, seed=1)
    g.validate()
    # mean edges = C(200,2)*0.05 = 995; allow generous MC slack
    assert 700 < g.n_edges < 1300


def test_er_deterministic():
    a = erdos_renyi(100, 0.1, seed=5)
    b = erdos_renyi(100, 0.1, seed=5)
    assert np.array_equal(a.cols, b.cols)
    c = erdos_renyi(100, 0.1, seed=6)
    assert not np.array_equal(a.cols, c.cols) or a.n_edges != c.n_edges


def test_from_edges_drops_self_loops_and_mirrors():
    g = Graph.from_edges(4, [0, 1, 2, 2], [1, 2, 3, 2])
    assert g.n_edges == 3
    g.validate()
    assert set(g.neighbors_of(2).tolist()) == {1, 3}


def test_dedup():
    g = Graph.from_edges(3, [0, 0, 1], [1, 1, 2])
    assert g.n_edges == 3  # duplicates kept, like the reference
    d = g.dedup_edges()
    assert d.n_edges == 2
    d.validate()


def test_ell_layout(small_er):
    ell = small_er.to_ell(pad_nodes_to=16, pad_degree_to=8)
    assert ell.n_pad % 16 == 0 and ell.d_pad % 8 == 0
    neigh = np.asarray(ell.neighbors)
    degs = np.asarray(ell.degrees)
    for v in range(small_er.n):
        row = neigh[v][neigh[v] < ell.n_pad]
        assert sorted(row.tolist()) == sorted(small_er.neighbors_of(v).tolist())
        assert degs[v] == small_er.degrees[v]
    # padding rows are all-sentinel
    assert (neigh[small_er.n :] == ell.n_pad).all()


def test_edge_list_roundtrip(tmp_path, small_er):
    path = str(tmp_path / "g.txt")
    gio.write_edge_list(small_er, path, use_names=False)
    g2 = gio.load_edge_list_py(path)
    assert g2.n == small_er.n
    assert g2.n_edges == small_er.n_edges
    # node ids are renumbered in first-seen order; degree multiset survives
    assert sorted(g2.degrees.tolist()) == sorted(small_er.degrees.tolist())


def test_native_importer_matches_python(tmp_path, small_er):
    from mcmc_colorer_tpu.graph import native

    if not native.available():
        pytest.skip("native library not built")
    path = str(tmp_path / "g.txt")
    gio.write_edge_list(small_er, path, use_names=False)
    g_py = gio.load_edge_list_py(path)
    g_nat = native.load_edge_list(path)
    assert g_nat.n == g_py.n
    assert np.array_equal(g_nat.row_ptr, g_py.row_ptr)
    # within-row neighbor order is an implementation detail
    for v in range(g_py.n):
        assert sorted(g_nat.neighbors_of(v).tolist()) == sorted(
            g_py.neighbors_of(v).tolist()
        )
    assert g_nat.node_names == g_py.node_names


def test_native_dataset_generator(tmp_path):
    from mcmc_colorer_tpu.graph import native

    if not native.available():
        pytest.skip("native library not built")
    path = str(tmp_path / "ds.txt")
    m = native.generate_dataset(path, 200, 0.05, seed=42)
    assert 600 < m < 1400
    g = gio.load_edge_list_py(path)
    assert g.n <= 200  # isolated nodes don't appear in the edge list
    g.validate()


def test_converters(tmp_path):
    nr = tmp_path / "nr.txt"
    nr.write_text("% comment\n% 5 4 5\n1 2\n2 3\n3 4\n4 5\n")
    out = tmp_path / "nr_conv.txt"
    gio.convert_network_repository(str(nr), str(out))
    lines = out.read_text().strip().split("\n")
    assert lines[1] == "1 2 0.1"
    g = gio.load_edge_list_py(str(out))
    assert g.n == 5 and g.n_edges == 4

    rd = tmp_path / "reddit.csv"
    rd.write_text("a,b,x\nb,c,y\n")
    out2 = tmp_path / "r.txt"
    gio.convert_reddit_csv(str(rd), str(out2))
    assert out2.read_text() == "a b 0.1\nb c 0.1\n"

    sa = tmp_path / "sa.txt"
    sa.write_text("3 3\na b 1\nb b 1\nb c 1\n")
    out3 = tmp_path / "sa_p.txt"
    assert gio.strip_self_arcs(str(sa), str(out3)) == 1
    assert "b b" not in out3.read_text()


def test_barabasi_albert():
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    g = barabasi_albert(500, 3, seed=2)
    g.validate()
    # heavy tail: max degree well above the attachment parameter
    assert g.max_degree > 3 * 4
    assert g.degrees.min() >= 3
    # determinism
    g2 = barabasi_albert(500, 3, seed=2)
    import numpy as np

    assert np.array_equal(g.cols, g2.cols)


def test_real_world_like_pipeline(tmp_path):
    """BASELINE config 4 shape: skewed-degree graph through the converter
    pipeline into the full MCMC colorer."""
    import numpy as np

    from mcmc_colorer_tpu.config import MCMCParams
    from mcmc_colorer_tpu.graph.generate import barabasi_albert
    from mcmc_colorer_tpu.models.base import check_coloring
    from mcmc_colorer_tpu.models.mcmc import MCMCColorer

    g0 = barabasi_albert(400, 4, seed=9)
    # write a reddit-style CSV, convert, strip self arcs, load
    csv = tmp_path / "edges.csv"
    u = np.repeat(np.arange(g0.n), g0.degrees)
    v = g0.cols
    mask = u < v
    with open(csv, "w") as f:
        for a, b in zip(u[mask], v[mask]):
            f.write(f"n{a},n{b},x\n")
    conv = tmp_path / "conv.txt"
    gio.convert_reddit_csv(str(csv), str(conv))
    withhdr = tmp_path / "native.txt"
    withhdr.write_text(f"{g0.n} {int(mask.sum())}\n" + conv.read_text())
    purged = tmp_path / "purged.txt"
    gio.strip_self_arcs(str(withhdr), str(purged))
    g = gio.load_edge_list_py(str(purged))
    assert g.n == g0.n and g.n_edges == g0.n_edges
    r = MCMCColorer(g, MCMCParams(n_colors=g.max_degree, tailcut=True)).run(
        seed=5
    )
    assert check_coloring(g, r.colors)


# ---------------------- degree-bucketed ELL layout -------------------------


def test_degree_relabel_roundtrip():
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    g = barabasi_albert(500, 4, seed=2, use_native=False)
    g2, perm = g.degree_relabel()
    g2.validate()
    assert np.array_equal(np.sort(g.degrees), g2.degrees)
    # adjacency preserved under the relabeling
    inv = np.empty(g.n, np.int64)
    inv[perm] = np.arange(g.n)
    for v in (0, 13, 200, 499):
        want = sorted(inv[g.neighbors_of(v)].tolist())
        got = sorted(g2.neighbors_of(int(inv[v])).tolist())
        assert want == got


def test_bucketed_ell_structure():
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    g = barabasi_albert(2000, 8, seed=1, use_native=False)
    g2, _ = g.degree_relabel()
    bell = g2.to_ell_bucketed(block=128, min_lane=8)
    assert int(bell.node_mask.sum()) == g.n
    # widths ascend, heights are block multiples, sentinel is global n_pad
    widths = [s.d_pad for s in bell.slices]
    assert widths == sorted(widths)
    for s in bell.slices:
        assert s.h_pad % 128 == 0
        assert int(jnp.max(s.neighbors)) <= bell.n_pad
    # every real row holds exactly its neighbors
    pos = bell.real_positions()
    inv_pos = np.full(bell.n_pad + 1, -1, np.int64)
    inv_pos[pos] = np.arange(g2.n)
    for v in (0, 77, 1500, 1999):
        p = int(pos[v])
        s = next(
            s for s in bell.slices if s.start <= p < s.start + s.h_pad
        )
        row = np.asarray(s.neighbors)[p - s.start]
        got = sorted(inv_pos[x] for x in row if x < bell.n_pad)
        assert got == sorted(g2.neighbors_of(v).tolist())


def test_bucketed_saves_gather_volume_on_skewed():
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    g = barabasi_albert(5000, 8, seed=3, use_native=False)
    g2, _ = g.degree_relabel()
    bell = g2.to_ell_bucketed(block=128, min_lane=8)
    flat = g.to_ell().neighbors.size
    assert bell.gather_elements < flat / 3


def test_native_ba_matches_numpy_semantics():
    """Native and numpy BA draw different streams but identical structure:
    same edge count, connected preferential-attachment shape."""
    from mcmc_colorer_tpu.graph import native as native_mod
    from mcmc_colorer_tpu.graph.generate import barabasi_albert

    if not native_mod.available():
        import pytest

        pytest.skip("native library unavailable")
    gn = barabasi_albert(3000, 8, seed=2, use_native=True)
    gf = barabasi_albert(3000, 8, seed=2, use_native=False)
    gn.validate()
    assert gn.n_edges == gf.n_edges == 9 * 8 // 2 + (3000 - 9) * 8
    # degree-proportional attachment -> heavy tail in both
    assert gn.max_degree > 4 * gn.mean_degree
    assert gf.max_degree > 4 * gf.mean_degree


def test_native_mcmc_seq_chain():
    """The compiled sequential chain (bench.py's honest baseline) colors
    validly and matches the numpy model statistically."""
    from mcmc_colorer_tpu.config import MCMCParams
    from mcmc_colorer_tpu.graph import native
    from mcmc_colorer_tpu.graph.generate import erdos_renyi
    from mcmc_colorer_tpu.models.base import check_coloring
    from mcmc_colorer_tpu.models.mcmc_sequential import SequentialMCMCColorer

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    g = erdos_renyi(400, 0.1, seed=5)
    colors, iters = native.run_mcmc_seq(
        g, g.max_degree, max_iterations=250, taboo_iterations=2, seed=3
    )
    assert colors.shape == (g.n,)
    assert 0 < iters <= 250
    assert check_coloring(g, colors)
    r_py = SequentialMCMCColorer(
        g, MCMCParams(n_colors=g.max_degree, taboo_iterations=2)
    ).run(seed=3)
    import numpy as np

    used_c = len(np.unique(colors))
    used_py = len(np.unique(r_py.colors))
    assert abs(used_c - used_py) <= 0.2 * max(used_c, used_py)


def test_to_ell_cache_reuse():
    """Repeated colorers on one graph reuse the padded rectangle (its
    host build + transfer is minutes at the 1M scale); a different pad
    shape still gets a correct rectangle."""
    from mcmc_colorer_tpu.graph.generate import erdos_renyi

    g = erdos_renyi(300, 0.05, seed=3)
    e1 = g.to_ell(pad_nodes_to=128)
    e2 = g.to_ell(pad_nodes_to=128)
    assert e1 is e2  # cache hit
    e3 = g.to_ell(pad_nodes_to=512)
    assert e3.n_pad == 512 and e3 is not e1
    # same adjacency content regardless of pad (sentinels normalised)
    import numpy as np

    a = np.asarray(e1.neighbors)[:300]
    b = np.asarray(e3.neighbors)[:300, : e1.d_pad]
    assert np.array_equal(
        np.where(a == e1.n_pad, -1, a), np.where(b == e3.n_pad, -1, b)
    )
