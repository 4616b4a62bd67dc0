import json
import os

import numpy as np
import pytest

from mcmc_colorer_tpu.analysis.log_parser import (
    balance_index,
    count_non_convergent,
    parse_log_file,
    parse_results_dir,
    save_results_json,
    speedups,
)
from mcmc_colorer_tpu.cli import dataset_gen_main, main as cli_main


def test_cli_simulate_all_algos(tmp_path):
    out = tmp_path / "out"
    rc = cli_main(
        [
            "--simulate",
            "0.1",
            "-n",
            "120",
            "--mcmcgpu",
            "--mcmccpu",
            "--lubygpu",
            "--grdffgpu",
            "--vffgpu",
            "--seed",
            "7",
            "--tailcut",
            "--check",
            "--quiet",
            "--outDir",
            str(out),
        ]
    )
    assert rc == 0
    logs = sorted(os.listdir(out))
    tags = {f.split("-")[-2] for f in logs if f.endswith(".log")}
    assert tags == {"MCMC_TPU", "MCMC_CPU", "LUBY", "GFF", "VFF"}
    # colors files exist and carry one line per node
    cf = [f for f in logs if f.endswith("-colors.txt")][0]
    lines = (out / cf).read_text().strip().split("\n")
    assert len(lines) == 120


def test_cli_ensemble_and_repet(tmp_path):
    out = tmp_path / "out"
    rc = cli_main(
        [
            "--simulate",
            "0.1",
            "-n",
            "80",
            "--mcmcgpu",
            "--chains",
            "3",
            "--repet",
            "2",
            "--seed",
            "3",
            "--check",
            "--quiet",
            "--outDir",
            str(out),
        ]
    )
    assert rc == 0
    logs = [f for f in os.listdir(out) if f.endswith(".log")]
    assert len(logs) == 2  # two repetitions


def test_cli_errors():
    with pytest.raises(SystemExit):
        cli_main(["--simulate", "1.5", "-n", "10", "--quiet"])
    with pytest.raises(SystemExit):
        cli_main(["--simulate", "0.5", "--quiet"])  # missing -n
    with pytest.raises(SystemExit):
        cli_main(["--quiet"])  # neither graph nor simulate


def test_dataset_gen_and_graph_input(tmp_path, capsys):
    ds = tmp_path / "g.txt"
    assert dataset_gen_main(["150", "0.05", str(ds), "5"]) == 0
    out = tmp_path / "out"
    rc = cli_main(
        [
            "--graph",
            str(ds),
            "--lubygpu",
            "--seed",
            "1",
            "--check",
            "--quiet",
            "--outDir",
            str(out),
        ]
    )
    assert rc == 0


def test_log_roundtrip_and_analysis(tmp_path):
    out = tmp_path / "res"
    cli_main(
        [
            "--simulate",
            "0.1",
            "-n",
            "100",
            "--mcmcgpu",
            "--lubygpu",
            "--seed",
            "11",
            "--quiet",
            "--repet",
            "2",
            "--outDir",
            str(out),
        ]
    )
    results = parse_results_dir(str(out))
    assert set(results) == {"MCMC_TPU", "LUBY"}
    rec = results["MCMC_TPU"][0]
    assert rec["nodes"] == 100
    assert rec["n_colors"] > 0
    assert sum(rec["histogram"]) == 100
    assert "execution_time_s" in rec and "iterations" in rec
    assert count_non_convergent(results["MCMC_TPU"]) in (0, 1, 2)
    sp = speedups(results)
    assert isinstance(sp, dict)
    j = save_results_json(str(out), str(tmp_path / "final.json"))
    assert json.load(open(tmp_path / "final.json")).keys() == j.keys()


def test_balance_index_formula():
    # perfectly balanced: BI = 0
    assert balance_index([10, 10, 10], 30, 0.5) == 0.0
    # one-off imbalance matches hand computation
    bi = balance_index([11, 9, 10], 30, 0.5)
    assert abs(bi - np.sqrt(2 / 15)) < 1e-12


def test_cli_rejects_active_bucketed(tmp_path):
    """--active builds the flat max-degree rectangle, defeating
    --layout bucketed — the CLI must refuse the combination loudly
    instead of silently dropping the layout."""
    import pytest

    from mcmc_colorer_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(
            [
                "--simulate", "0.2", "-n", "80", "--mcmcgpu",
                "--active", "--layout", "bucketed",
                "--quiet", "--outDir", str(tmp_path),
            ]
        )
    assert e.value.code == 2
