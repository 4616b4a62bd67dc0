"""Sequential tailcut stall escape (reference's intended unlock_stall,
coloringMCMC_CPUutils.cpp:49-67; realized for the device tailcut in
round 4, opt-in for the sequential chain in round 5).

At a tight palette the faithful greedy repair deadlocks when a violating
node's neighborhood covers every color (the matrix's 0.2 stall rate at
p=0.04, ratio=4).  With ``seq_stall_escape`` the no-progress pass
randomly re-colors the conflicting nodes and retries; the faithful
default stalls exactly as before."""

from mcmc_colorer_tpu.config import MCMCParams, ProposalKind
from mcmc_colorer_tpu.graph.generate import erdos_renyi
from mcmc_colorer_tpu.models.base import check_coloring
from mcmc_colorer_tpu.models.mcmc_sequential import SequentialMCMCColorer


def _params(g, escape):
    return MCMCParams(
        n_colors=max(2, g.max_degree // 4),
        proposal=ProposalKind.STANDARD,
        tailcut=True,
        max_iterations=3,  # leave plenty of conflicts for the repair
        seq_stall_escape=escape,
    )


def test_faithful_default_stalls():
    g = erdos_renyi(600, 0.2, seed=777)
    r = SequentialMCMCColorer(g, _params(g, False)).run(seed=0)
    assert r.extra["final_violations"] > 0  # reference behavior
    assert not check_coloring(g, r.colors)


def test_escape_resolves_the_same_config():
    g = erdos_renyi(600, 0.2, seed=777)
    for seed in range(2):
        r = SequentialMCMCColorer(g, _params(g, True)).run(seed=seed)
        assert r.extra["final_violations"] == 0
        assert check_coloring(g, r.colors)


def test_device_chain_free_color_trace(monkeypatch, capsys):
    """Device-chain rendition of the reference's verbose
    getStatsFreeColors lines (coloringMCMC_prints.cu:117-131): under
    TRACE, every host-driven segment reports min/max/avg free colors of
    the current coloring, in the reference's line format."""
    import re

    from mcmc_colorer_tpu.models.mcmc import MCMCColorer

    monkeypatch.setenv("MCMC_COLORER_TRACE", "1")
    g = erdos_renyi(256, 0.05, seed=5)
    p = MCMCParams(
        n_colors=max(2, g.max_degree), proposal=ProposalKind.STANDARD
    )
    r = MCMCColorer(g, p).run(seed=1)
    segs = r.extra["free_color_trace_segments"]
    assert segs, "no free-color segments recorded"
    for mn, mx, avg in segs:
        assert 0 <= mn <= avg <= mx <= p.n_colors
    cap = capsys.readouterr()
    out = cap.out + cap.err
    assert re.search(
        r"Max Free Colors: \d+ - Min Free Colors: \d+ - "
        r"AVG Free Colors: [\d.]+",
        out,
    )
