import pytest

from mcmc_colorer_tpu.config import (
    ColorerKind,
    InitKind,
    MCMCParams,
    ProposalKind,
    RunConfig,
    default_n_colors,
)


def test_default_n_colors():
    # nCol = maxDeg / numColRatio: the flag is inverted at main.cu:53
    # before the multiply at main.cu:162
    assert default_n_colors(64) == 64
    assert default_n_colors(64, 2.0) == 32
    assert default_n_colors(0) == 1  # at least one color


def test_tailcut_threshold():
    p = MCMCParams(n_colors=8, tailcut=True)
    # z = max(50, n/2000) (coloringMCMC_CPU.cpp:91)
    assert p.tailcut_threshold(1000) == 50
    assert p.tailcut_threshold(1_000_000) == 500
    assert MCMCParams(n_colors=8).tailcut_threshold(10**6) == 0


def test_params_replace_and_hash():
    p = MCMCParams(n_colors=8)
    q = p.replace(epsilon=1e-3)
    assert q.epsilon == 1e-3 and p.epsilon == 1e-8
    # hashable (used as a static jit argument)
    assert hash(p) != hash(q)


def test_run_config_derivations(tmp_path):
    cfg = RunConfig(simulate_p=0.01, n_nodes=500, num_color_ratio=2.0)
    assert cfg.graph_name == "500_0.01_2.0"
    assert cfg.output_dir == "500_0.01_2.0_out"
    cfg2 = RunConfig(graph_path="/data/reddit.txt", out_dir="/tmp/o")
    assert cfg2.graph_name == "reddit"
    assert cfg2.output_dir == "/tmp/o"
    # numColRatio clamped to [1, 16] (ArgHandle.cpp:148-156); the flag
    # divides the palette (main.cu:53 inverts, :162 multiplies)
    params = RunConfig(num_color_ratio=99.0).mcmc_params(max_degree=64)
    assert params.n_colors == 4
    params2 = RunConfig(num_color_ratio=0.1).mcmc_params(max_degree=64)
    assert params2.n_colors == 64


def test_enums_cover_reference_variants():
    assert {k.value for k in ProposalKind} == {
        "standard",
        "decrease_line",
        "decrease_exp",
        "balance_line",
        "balance_exp",
        "balance_dynamic",
    }
    assert {k.value for k in InitKind} == {"uniform", "line", "exp"}
    assert len(ColorerKind) == 6
