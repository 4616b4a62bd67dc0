"""ctypes bindings for the native C++ graph I/O fast path.

The shared library (``native/libmcgraph.so``) is built on demand with g++;
every entry point has a pure-Python fallback in :mod:`graph.io`, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from mcmc_colorer_tpu.graph.container import Graph

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libmcgraph.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(_NATIVE_DIR, "importer.cpp")
        # run make even when the .so exists: the build is mtime-
        # incremental, so a stale library (older than importer.cpp —
        # e.g. missing round-3's mc_mcmc_seq symbols) is rebuilt instead
        # of raising AttributeError at symbol binding below
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["make", "-s", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                if not os.path.exists(_SO_PATH):
                    _build_failed = True
                    return None
        elif not os.path.exists(_SO_PATH):
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.mc_mcmc_seq  # noqa: B018 — probe the newest symbol so a
            # stale library degrades to the Python fallbacks
        except (OSError, AttributeError):
            _build_failed = True
            return None
        lib.mc_import.restype = ctypes.c_void_p
        lib.mc_import.argtypes = [ctypes.c_char_p]
        lib.mc_n.restype = ctypes.c_int64
        lib.mc_n.argtypes = [ctypes.c_void_p]
        lib.mc_nnz.restype = ctypes.c_int64
        lib.mc_nnz.argtypes = [ctypes.c_void_p]
        lib.mc_row_ptr.restype = ctypes.POINTER(ctypes.c_int64)
        lib.mc_row_ptr.argtypes = [ctypes.c_void_p]
        lib.mc_cols.restype = ctypes.POINTER(ctypes.c_int32)
        lib.mc_cols.argtypes = [ctypes.c_void_p]
        lib.mc_name.restype = ctypes.c_char_p
        lib.mc_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.mc_error.restype = ctypes.c_char_p
        lib.mc_error.argtypes = [ctypes.c_void_p]
        lib.mc_free.argtypes = [ctypes.c_void_p]
        lib.mc_generate_dataset.restype = ctypes.c_int64
        lib.mc_generate_dataset.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.mc_generate_er.restype = ctypes.c_void_p
        lib.mc_generate_er.argtypes = [
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_uint64,
        ]
        lib.mc_generate_ba.restype = ctypes.c_void_p
        lib.mc_generate_ba.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_uint64,
        ]
        lib.mc_generate_er_hash.restype = ctypes.c_void_p
        lib.mc_generate_er_hash.argtypes = [
            ctypes.c_int64,
            ctypes.c_uint32,
            ctypes.c_uint32,
        ]
        lib.mc_from_csr.restype = ctypes.c_void_p
        lib.mc_from_csr.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.mc_mcmc_seq.restype = ctypes.c_int64
        lib.mc_mcmc_seq.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_edge_list(
    path: str, name: str | None = None, with_names: bool = True
) -> Graph:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.mc_import(path.encode())
    try:
        n = lib.mc_n(h)
        if n < 0:
            raise IOError(f"{path}: {lib.mc_error(h).decode()}")
        nnz = lib.mc_nnz(h)
        row_ptr = np.ctypeslib.as_array(lib.mc_row_ptr(h), shape=(n + 1,)).copy()
        cols = np.ctypeslib.as_array(lib.mc_cols(h), shape=(max(nnz, 1),))[
            :nnz
        ].copy()
        names = (
            [lib.mc_name(h, i).decode() for i in range(n)] if with_names else None
        )
    finally:
        lib.mc_free(h)
    return Graph(
        n=int(n),
        row_ptr=row_ptr,
        cols=cols,
        node_names=names,
        name=name or os.path.basename(path).rsplit(".", 1)[0],
    )


def generate_er(n: int, p: float, seed: int = 0, name: str | None = None) -> Graph:
    """In-memory native ER(n, p) → CSR (no names); single C++ pass."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.mc_generate_er(n, p, seed)
    try:
        nn = lib.mc_n(h)
        nnz = lib.mc_nnz(h)
        row_ptr = np.ctypeslib.as_array(
            lib.mc_row_ptr(h), shape=(nn + 1,)
        ).copy()
        cols = np.ctypeslib.as_array(lib.mc_cols(h), shape=(max(nnz, 1),))[
            :nnz
        ].copy()
    finally:
        lib.mc_free(h)
    return Graph(
        n=int(nn),
        row_ptr=row_ptr,
        cols=cols,
        name=name or f"er_{n}_{p}",
    )


def generate_er_hash(
    n: int, threshold: int, seed: int, name: str | None = None
) -> Graph:
    """Host CSR of the hash-defined G(n, p) (threaded C++ enumeration;
    see ops/hashgen.py — the device materialises the same graph from the
    same (seed, threshold) with zero transfer)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.mc_generate_er_hash(n, threshold, seed)
    try:
        nn = lib.mc_n(h)
        nnz = lib.mc_nnz(h)
        row_ptr = np.ctypeslib.as_array(
            lib.mc_row_ptr(h), shape=(nn + 1,)
        ).copy()
        cols = np.ctypeslib.as_array(lib.mc_cols(h), shape=(max(nnz, 1),))[
            :nnz
        ].copy()
    finally:
        lib.mc_free(h)
    return Graph(
        n=int(nn),
        row_ptr=row_ptr,
        cols=cols,
        name=name or f"er_hash_{n}",
    )


def generate_ba(
    n: int, m_per_node: int, seed: int = 0, name: str | None = None
) -> Graph:
    """In-memory native Barabási–Albert(n, m) → CSR (no names)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.mc_generate_ba(n, m_per_node, seed)
    try:
        nn = lib.mc_n(h)
        if nn < 0:
            raise ValueError(lib.mc_error(h).decode())
        nnz = lib.mc_nnz(h)
        row_ptr = np.ctypeslib.as_array(
            lib.mc_row_ptr(h), shape=(nn + 1,)
        ).copy()
        cols = np.ctypeslib.as_array(lib.mc_cols(h), shape=(max(nnz, 1),))[
            :nnz
        ].copy()
    finally:
        lib.mc_free(h)
    return Graph(
        n=int(nn),
        row_ptr=row_ptr,
        cols=cols,
        name=name or f"ba_{n}_{m_per_node}",
    )


def generate_dataset(
    path: str, n: int, p: float, seed: int = 10000, named: bool = True
) -> int:
    """Native datasetGen: returns the number of undirected edges written."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    m = lib.mc_generate_dataset(path.encode(), n, p, seed, int(named))
    if m < 0:
        raise IOError(f"cannot write {path}")
    return int(m)


def run_mcmc_seq(
    graph: Graph,
    n_colors: int,
    epsilon: float = 1e-8,
    taboo_iterations: int = 0,
    max_iterations: int = 250,
    z: int = 0,
    seed: int = 0,
):
    """Compiled sequential MCMC chain (native/importer.cpp:mc_mcmc_seq) —
    the reference-CPU-speed baseline for bench.py.  Returns
    (colors[int32 n], iterations)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rp = np.ascontiguousarray(graph.row_ptr, dtype=np.int64)
    cols = np.ascontiguousarray(graph.cols, dtype=np.int32)
    h = lib.mc_from_csr(graph.n, rp, cols)
    try:
        out = np.empty(graph.n, dtype=np.int32)
        iters = lib.mc_mcmc_seq(
            h,
            np.int32(n_colors),
            float(epsilon),
            np.int32(taboo_iterations),
            np.int32(max_iterations),
            np.int64(z),
            np.uint64(seed),
            out,
        )
    finally:
        lib.mc_free(h)
    return out, int(iters)
