"""Host-side graph kernels: DAG check, toposort, Barabási–Albert sampling.

The reference delegates these to igraph's C core
(/root/reference/dibs/graph_utils.py:33-69, /root/reference/dibs/models/graph.py:146).
igraph is not a dependency of this framework; instead we ship a small native
C++ library (``dibs_tpu/native/graphlib.cpp``, built to ``libdibsgraph.so``)
with a pure-numpy fallback so the package works before/without compilation.

These routines are host-side only (data generation and evaluation); they never
sit on the XLA hot path. On-device DAG-ness uses the differentiable constraint
``dibs_tpu.ops.acyclic.acyclic_constr`` instead.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_NAME = "libdibsgraph.so"
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.join(os.path.dirname(__file__), _LIB_NAME)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.dibs_is_dag.restype = ctypes.c_int
        lib.dibs_is_dag.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.dibs_toposort.restype = ctypes.c_int
        lib.dibs_toposort.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dibs_barabasi_albert.restype = ctypes.c_int
        lib.dibs_barabasi_albert.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib
    except OSError:
        return None


def _as_c_int32(mat: np.ndarray):
    arr = np.ascontiguousarray(mat, dtype=np.int32)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def topological_sort(mat) -> Optional[np.ndarray]:
    """Kahn topological order of adjacency matrix ``mat`` (edge i->j means
    ``mat[i, j] != 0``). Returns ``None`` if the graph has a cycle."""
    mat = np.asarray(mat)
    n = mat.shape[0]
    lib = _load_native()
    if lib is not None:
        arr, ptr = _as_c_int32(mat)
        out = np.empty(n, dtype=np.int32)
        ok = lib.dibs_toposort(ptr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out if ok else None
    # numpy fallback: Kahn's algorithm
    adj = mat != 0
    indeg = adj.sum(axis=0).astype(np.int64)
    order = []
    ready = [int(i) for i in np.flatnonzero(indeg == 0)]
    while ready:
        u = ready.pop()
        order.append(u)
        children = np.flatnonzero(adj[u])
        for c in children:
            indeg[c] -= 1
            if indeg[c] == 0:
                ready.append(int(c))
    if len(order) != n:
        return None
    return np.array(order, dtype=np.int32)


def is_dag(mat) -> bool:
    """True iff the adjacency matrix has no directed cycle."""
    mat = np.asarray(mat)
    lib = _load_native()
    if lib is not None:
        arr, ptr = _as_c_int32(mat)
        return bool(lib.dibs_is_dag(ptr, mat.shape[0]))
    return topological_sort(mat) is not None


def barabasi_albert(n: int, m: int, seed: int) -> np.ndarray:
    """Directed Barabási–Albert preferential-attachment DAG sample.

    Vertex ``v`` (added in index order) draws ``min(m, v)`` distinct targets
    among vertices ``0..v-1`` with probability proportional to
    ``in_degree + 1`` and adds edges ``v -> target`` — the same generative
    process igraph's ``Graph.Barabasi(directed=True)`` uses (in-degree
    preferential attachment with zero-appeal 1, no duplicate edges). Edges run
    from later to earlier vertices, so the result is a DAG by construction.

    Returns an ``[n, n]`` int32 adjacency matrix.
    """
    lib = _load_native()
    if lib is not None:
        out = np.zeros(n * n, dtype=np.int32)
        ok = lib.dibs_barabasi_albert(
            n, m, np.uint64(seed), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        if ok:
            return out.reshape(n, n)
    rng = np.random.default_rng(seed)
    adj = np.zeros((n, n), dtype=np.int32)
    indeg = np.zeros(n, dtype=np.float64)
    for v in range(1, n):
        k = min(m, v)
        w = indeg[:v] + 1.0
        targets = rng.choice(v, size=k, replace=False, p=w / w.sum())
        adj[v, targets] = 1
        indeg[targets] += 1.0
    return adj


def permute_vertices(mat: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Relabels vertex ``i`` as ``perm[i]``: ``out[perm[i], perm[j]] = mat[i, j]``."""
    mat = np.asarray(mat)
    n = mat.shape[0]
    out = np.zeros_like(mat)
    perm = np.asarray(perm)
    out[np.ix_(perm, perm)] = mat
    return out
