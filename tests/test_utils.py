import os

import numpy as np

from mcmc_colorer_tpu.models.base import Coloring
from mcmc_colorer_tpu.models.greedy_ff import GreedyFFColorer
from mcmc_colorer_tpu.utils import term
from mcmc_colorer_tpu.utils.memtrack import (
    device_memory_stats,
    estimate_run_bytes,
)
from mcmc_colorer_tpu.utils.timer import Timer


def test_timer():
    with Timer() as t:
        sum(range(10000))
    assert t.duration_ms >= 0


def test_logger_conf_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = term.check_logger_conf()
    assert os.path.exists(path)
    assert not term.trace_enabled(path)
    conf = open(path).read().replace(
        "* TRACE:\n   ENABLED              =  false",
        "* TRACE:\n   ENABLED              =  true",
    )
    open(path, "w").write(conf)
    assert term.trace_enabled(path)
    monkeypatch.setenv("MCMC_COLORER_TRACE", "1")
    assert term.trace_enabled("nonexistent.conf")


def test_memtrack():
    est = estimate_run_bytes(1000, 50, 50)
    assert est["total_bytes"] > 0
    assert est["reference_colors_checker_bytes"] == 1000 * 50
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_class_degree_stats_and_ascii(medium_er):
    r = GreedyFFColorer(medium_er).run()
    mean, std = r.class_degree_stats(medium_er)
    assert mean.shape == (r.n_colors,)
    # overall degree mean is a weighted average of class means
    total = float(
        (mean * r.histogram).sum() / max(r.histogram.sum(), 1)
    )
    assert abs(total - medium_er.mean_degree) < 1e-6
    art = r.ascii_histogram()
    assert art.count("\n") == r.n_colors
    assert "Every * is" in art


def test_analysis_plots(tmp_path):
    from mcmc_colorer_tpu.analysis.log_parser import (
        plot_balance_index,
        plot_speedup,
        plot_var_col_3d,
        var_col_surface,
    )

    fake = {
        "MCMC_TPU": [
            {
                "nodes": 100,
                "prob": 0.1,
                "color_ratio": r,
                "histogram": [20, 30, 25, 25],
                "execution_time_s": 0.1 / r,
            }
            for r in (1.0, 2.0, 4.0)
        ],
        "MCMC_CPU": [
            {
                "nodes": 100,
                "prob": 0.1,
                "histogram": [25, 25, 25, 25],
                "execution_time_s": 1.0,
            }
        ],
    }
    surf = var_col_surface(fake)
    assert (2.0, 0.1) in surf
    # plots return bool (False only when matplotlib missing)
    for fn, name in [
        (lambda: plot_balance_index(fake, str(tmp_path / "b.png"), 0.1), "b"),
        (lambda: plot_speedup(fake, str(tmp_path / "s.png")), "s"),
        (lambda: plot_var_col_3d(fake, str(tmp_path / "v.png")), "v"),
    ]:
        ok = fn()
        assert ok in (True, False)
        if ok:
            assert (tmp_path / f"{name}.png").exists()


def test_compcache_enable(tmp_path, monkeypatch):
    from mcmc_colorer_tpu.utils import compcache

    d = str(tmp_path / "xla_cache")
    got = compcache.enable(d)
    assert got == d
    import os

    assert os.path.isdir(d)


def test_compcache_boolean_env(monkeypatch, tmp_path):
    """MCMC_COLORER_COMPILE_CACHE=1 is the documented on-switch: it must
    select the default cache dir, not create a directory named '1'
    (round-4 regression found in-tree)."""
    from mcmc_colorer_tpu.utils import compcache

    monkeypatch.setenv("MCMC_COLORER_COMPILE_CACHE", "1")
    got = compcache.enable()
    assert got == compcache._DEFAULT_DIR
    explicit = str(tmp_path / "xc")
    monkeypatch.setenv("MCMC_COLORER_COMPILE_CACHE", explicit)
    assert compcache.enable() == explicit
