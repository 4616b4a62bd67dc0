"""Interactive debugger (reference src/utils/dbg.{h,cpp}): break-in REPL,
variable printing, live-epsilon editing, abort — driven through injected
streams (no tty)."""

import io

import numpy as np

from mcmc_colorer_tpu.config import MCMCParams
from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.models.chain_api import SteppedMCMC
from mcmc_colorer_tpu.utils.dbg import DebugAttach, esc_pending


def test_repl_prints_and_continues(small_er):
    p = MCMCParams(n_colors=small_er.max_degree)
    s = SteppedMCMC(small_er, p)
    st = s.init_state(seed=3)
    st = s.step(st, n_steps=1)
    out = io.StringIO()
    dbg = DebugAttach(
        input=iter(
            [
                "p iteration", "p conflicts", "p violating", "p used",
                "p free", "p epsilon", "p taboo", "p colors 0 5",
                "e epsilon 0.25", "p epsilon", "h", "bogus", "c",
            ]
        ),
        output=out,
    )
    dbg.break_in(s, st)
    text = out.getvalue()
    assert str(int(st.iteration)) in text
    assert str(int(st.conflicts)) in text
    assert "0.25" in text
    assert dbg.epsilon == 0.25
    assert not dbg.quit
    assert "commands" in text  # help shown


def test_live_epsilon_edit_changes_dynamics(small_er):
    """A huge epsilon forces near-uniform resampling — the run must still
    finish and the override must actually reach the sweeps (same live-ε
    mechanism as dbg.cpp:358-381)."""
    p = MCMCParams(n_colors=small_er.max_degree, max_iterations=30)
    s = SteppedMCMC(small_er, p)
    dbg = DebugAttach(
        input=iter(["e epsilon 1e-3", "c"]), output=io.StringIO(),
        break_every=True,
    )
    r = s.run(seed=3, segment=2, dbg=dbg)
    assert dbg.epsilon == 1e-3
    assert r.colors.shape == (small_er.n,)


def test_quit_aborts_run(small_er):
    p = MCMCParams(
        n_colors=max(4, small_er.max_degree // 3), max_iterations=200
    )
    s = SteppedMCMC(small_er, p)
    dbg = DebugAttach(
        input=iter(["q"]), output=io.StringIO(), break_every=True
    )
    r = s.run(seed=3, segment=1, dbg=dbg)
    # aborted after the first segment
    assert r.iterations <= 1 or dbg.quit


def test_esc_pending_no_tty():
    assert esc_pending(io.StringIO()) is False


def test_cli_dbg_flag(small_er, tmp_path, monkeypatch):
    """--dbg routes through the stepped chain + DebugAttach; without a tty
    it never breaks in and the run completes normally."""
    from mcmc_colorer_tpu.cli import main

    rc = main(
        [
            "--simulate", "0.2", "-n", "80", "--mcmcgpu", "--dbg",
            "--seed", "3", "--check", "--quiet",
            "--outDir", str(tmp_path),
        ]
    )
    assert rc == 0
