import numpy as np
import pytest

from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.models.chain_api import SteppedMCMC
from mcmc_colorer_tpu.models.mcmc import MCMCColorer


def _params(g, **kw):
    return MCMCParams(n_colors=g.max_degree, **kw)


def test_stepped_run_converges(small_er):
    api = SteppedMCMC(small_er, _params(small_er))
    r = api.run(seed=9)
    assert r.extra["final_conflicts"] == 0
    assert check_coloring(small_er, r.colors)


def test_stepping_and_inspection(small_er):
    api = SteppedMCMC(small_er, _params(small_er, taboo_iterations=2))
    st = api.init_state(seed=4)
    info0 = api.inspect(st)
    assert info0["iteration"] == 0
    assert info0["conflict_edges"] == int(st.conflicts)
    st = api.step(st, n_steps=3)
    info = api.inspect(st)
    assert info["iteration"] <= 3
    assert info["free_colors_min"] <= info["free_colors_avg"] <= info["free_colors_max"]
    assert info["histogram"].sum() == small_er.n
    # converged chains stop stepping (iteration freezes once conflicts==0)
    st = api.step(st, n_steps=500)
    if int(st.conflicts) == 0:
        frozen = api.step(st, n_steps=5)
        assert int(frozen.iteration) == int(st.iteration)


def test_epsilon_live_edit(small_er):
    api = SteppedMCMC(small_er, _params(small_er))
    st = api.init_state(seed=1)
    # a huge epsilon forces chaotic exploration: conflicts stay high
    chaotic = api.step(st, n_steps=5, epsilon=0.9 / api.params.n_colors)
    calm = api.step(st, n_steps=5)
    assert int(chaotic.conflicts) >= int(calm.conflicts)


def test_checkpoint_resume(tmp_path, small_er):
    api = SteppedMCMC(small_er, _params(small_er))
    st = api.init_state(seed=2)
    st = api.step(st, n_steps=2)
    path = str(tmp_path / "ck.npz")
    api.save_checkpoint(st, path)
    st2 = api.load_checkpoint(path)
    assert np.array_equal(np.asarray(st.colors), np.asarray(st2.colors))
    assert int(st2.iteration) == int(st.iteration)
    # resumed stepping is deterministic: same state → same next state
    a = api.step(st, n_steps=1)
    b = api.step(st2, n_steps=1)
    assert np.array_equal(np.asarray(a.colors), np.asarray(b.colors))


def test_checkpoint_graph_mismatch(tmp_path, small_er, medium_er):
    api = SteppedMCMC(small_er, _params(small_er))
    st = api.init_state(seed=2)
    path = str(tmp_path / "ck.npz")
    api.save_checkpoint(st, path)
    other = SteppedMCMC(medium_er, _params(medium_er))
    with pytest.raises(AssertionError):
        other.load_checkpoint(path)


def test_stepped_matches_while_loop_statistically(small_er):
    p = _params(small_er, proposal=ProposalKind.STANDARD)
    r1 = SteppedMCMC(small_er, p).run(seed=6)
    r2 = MCMCColorer(small_er, p).run(seed=6)
    assert r1.extra["final_conflicts"] == 0
    assert r2.extra["final_conflicts"] == 0
