"""Edge-list file I/O and dataset converters.

Implements the reference's file contract (SURVEY §8): one throwaway header
line, then whitespace- or comma-separated ``src dst [weight]`` lines with
arbitrary string node ids mapped to dense ints in first-seen order
(fileImporter.cpp:20-62).  Each undirected edge is stored once in the file;
the loader adds the reverse edge and drops self-loops (graphCPU.cpp:122-134).
Duplicate edges are NOT removed, matching the reference (README.md:143).

A native C++ fast path (``native/importer.cpp``) handles large files; this
module falls back to pure Python/numpy when the shared library is absent.
"""

from __future__ import annotations

import os

import numpy as np

from mcmc_colorer_tpu.graph.container import Graph
from mcmc_colorer_tpu.graph.generate import random_node_names


def _split_line(line: str) -> list[str]:
    line = line.strip()
    if "," in line:
        return [t for t in line.replace(",", " ").split() if t]
    return line.split()


def load_edge_list(path: str, name: str | None = None) -> Graph:
    """Two-pass streaming import with string→dense-int id mapping
    (counterpart of fileImporter + Graph::setupImporterNew)."""
    from mcmc_colorer_tpu.graph import native

    if native.available():
        return native.load_edge_list(path, name=name)
    return load_edge_list_py(path, name=name)


def load_edge_list_py(path: str, name: str | None = None) -> Graph:
    """Pure-Python importer (fallback / reference for the native path)."""
    id_of: dict[str, int] = {}
    names: list[str] = []
    srcs: list[int] = []
    dsts: list[int] = []
    with open(path) as f:
        f.readline()  # one header line, skipped (fileImporter.cpp:27)
        for line in f:
            toks = _split_line(line)
            if len(toks) < 2:
                continue
            a, b = toks[0], toks[1]
            ia = id_of.get(a)
            if ia is None:
                ia = id_of[a] = len(names)
                names.append(a)
            ib = id_of.get(b)
            if ib is None:
                ib = id_of[b] = len(names)
                names.append(b)
            srcs.append(ia)
            dsts.append(ib)
    n = len(names)
    g = Graph.from_edges(
        n,
        np.asarray(srcs, dtype=np.int64),
        np.asarray(dsts, dtype=np.int64),
        node_names=names,
        name=name or os.path.basename(path).rsplit(".", 1)[0],
    )
    return g


def write_edge_list(
    g: Graph,
    path: str,
    *,
    use_names: bool = True,
    weight: float | None = 0.1,
    rng: np.random.Generator | None = None,
) -> None:
    """Write the native format: header ``nNodes nEdges`` then one line per
    undirected edge (``src dst weight``), as ``datasetGen`` emits
    (datasetGenerator.cpp:147-157)."""
    names = g.node_names if (use_names and g.node_names) else None
    with open(path, "w") as f:
        f.write(f"{g.n}\t{g.n_edges}\n")
        u = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
        v = g.cols.astype(np.int64)
        mask = u < v  # each undirected edge once
        us, vs = u[mask], v[mask]
        if rng is not None:
            w = rng.random(us.shape[0])
        else:
            w = np.full(us.shape[0], 0.1 if weight is None else weight)
        for a, b, ww in zip(us, vs, w):
            sa = names[a] if names else str(int(a))
            sb = names[b] if names else str(int(b))
            f.write(f"{sa}\t{sb}\t{ww:g}\n")


def generate_dataset(
    n: int,
    p: float,
    out_path: str,
    seed: int = 10000,
    named_nodes: bool = True,
) -> Graph:
    """``datasetGen`` equivalent: sample ER(n, p), assign random 12-char
    node names, write the native edge-list format.  Default seed 10000
    mirrors datasetGenerator.cpp:39."""
    from mcmc_colorer_tpu.graph.generate import erdos_renyi

    g = erdos_renyi(n, p, seed=seed)
    if named_nodes:
        g.node_names = random_node_names(n, np.random.default_rng(seed))
    write_edge_list(g, out_path, rng=np.random.default_rng(seed))
    return g


# -- converters (counterparts of pyScripts/convert*.py, testSelfArcs.py) ----


def convert_network_repository(in_path: str, out_path: str) -> None:
    """networkrepository.com format → native format
    (pyScripts/convertDataset.py behavior: skip header, normalise to
    3 columns, append weight 0.1 to unweighted files)."""
    with open(in_path) as fin, open(out_path, "w") as fout:
        fin.readline()  # header
        counts_line = fin.readline()
        nums = [int(t) for t in counts_line.split() if t.lstrip("-").isdigit()]
        n_nodes, n_edges = (min(nums), max(nums)) if nums else (0, 0)
        fout.write(f"{n_nodes} {n_edges}\n")
        for line in fin:
            toks = _split_line(line)
            if len(toks) == 2:
                fout.write(f"{toks[0]} {toks[1]} 0.1\n")
            elif len(toks) >= 3:
                fout.write(" ".join(toks[:3]) + "\n")


def convert_reddit_csv(
    in_path: str, out_path: str, every_other_line: bool = False
) -> None:
    """Reddit CSV edge list → native format (pyScripts/convertReddit.py).

    The reference script skips every other input line
    (convertReddit.py:9-11, a quirk of its source CSV layout); that
    behavior is opt-in here via ``every_other_line``."""
    with open(in_path) as fin, open(out_path, "w") as fout:
        for line in fin:
            toks = line.strip().split(",")
            if len(toks) >= 2:
                fout.write(f"{toks[0]} {toks[1]} 0.1\n")
            if every_other_line:
                fin.readline()


def strip_self_arcs(in_path: str, out_path: str) -> int:
    """Remove self-loop edges (pyScripts/testSelfArcs.py); returns the
    number stripped."""
    cnt = 0
    with open(in_path) as fin, open(out_path, "w") as fout:
        fout.write(fin.readline())  # header preserved
        for line in fin:
            toks = _split_line(line)
            if len(toks) >= 2 and toks[0] == toks[1]:
                cnt += 1
            else:
                fout.write(line)
    return cnt


def write_colors(path: str, colors: np.ndarray) -> None:
    """Write the ``nodeIdx color`` assignment file
    (reference coloringMCMC_prints.cu:200-203, _CPUutils.cpp:106-109)."""
    with open(path, "w") as f:
        for i, c in enumerate(np.asarray(colors)):
            f.write(f"{i} {int(c)}\n")
