"""Minimal pure-Python `igraph` stand-in for running the reference DiBS.

The upstream package (mounted read-only at /root/reference) depends on
python-igraph for exactly six operations (see SURVEY.md §2.4):

* ``ig.Graph.Weighted_Adjacency(mat.tolist())``  — graph from adjacency
  (reference graph_utils.py:56,68)
* ``g.get_adjacency().data``                      — adjacency back out (:44)
* ``g.is_dag()``                                  — cycle check (:69)
* ``g.topological_sorting()``                     — ancestral sampling order
  (linearGaussian.py:246, nonlinearGaussian.py:206)
* ``ig.Graph.Barabasi(n, m, directed=True).permute_vertices(perm)``
  — scale-free DAG sampling (models/graph.py:146)
* ``g.incident(j, mode='in')`` / ``g.es[e].source`` / ``len(g.es)`` /
  ``len(g.vs)`` — parent queries (models/graph.py:73,165,
  linearGaussian.py:262-263)

igraph is not installable in this environment, so this module provides those
six behaviors on top of plain Python lists.  Injected via
``sys.modules['igraph']`` by :mod:`parity.refload` **before** the reference
package is imported.

Semantics notes:

* ``Barabasi`` draws from Python's global ``random`` module — matching how
  python-igraph ≥0.8 sources randomness from ``random`` by default, which is
  why the reference seeds it with ``pyrandom.seed(int(key.sum()))``
  (models/graph.py:144).  The attachment algorithm (m distinct targets per
  new vertex, probability ∝ in-degree + 1, edges new→old) matches igraph's
  ``barabasi_game`` with its defaults (power=1, zero_appeal=1, outpref=False,
  method="psumtree" → no duplicate edges).  Sampled graphs are equal in
  distribution, not bitwise, to real igraph output.
* ``topological_sorting`` is Kahn's algorithm with a FIFO queue seeded in
  vertex-id order — a valid topological order (the reference only requires
  validity; it iterates the order to ancestrally sample node values).
"""
from __future__ import annotations

import random as _pyrandom
from collections import deque


class _Edge:
    __slots__ = ("source", "target")

    def __init__(self, source, target):
        self.source = source
        self.target = target


class _Matrix:
    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data


class Graph:
    """Directed graph backed by an edge list + adjacency lists."""

    def __init__(self, n=0, edges=()):
        self.n = int(n)
        self._edges = [(int(s), int(t)) for (s, t) in edges]

    # --- containers the reference touches ---

    @property
    def es(self):
        return [_Edge(s, t) for (s, t) in self._edges]

    @property
    def vs(self):
        return list(range(self.n))

    # --- constructors ---

    @classmethod
    def Weighted_Adjacency(cls, data, mode="directed", attr="weight", loops=True):
        n = len(data)
        edges = [
            (i, j)
            for i, row in enumerate(data)
            for j, w in enumerate(row)
            if w != 0
        ]
        return cls(n, edges)

    @classmethod
    def Barabasi(cls, n, m=1, directed=True):
        """Preferential attachment: vertex i>0 draws min(m, i) distinct
        targets among vertices 0..i-1 with probability ∝ in-degree + 1;
        edges point new→old (igraph directed BA convention)."""
        edges = []
        indeg = [0] * n
        for i in range(1, n):
            k = min(m, i)
            pool = list(range(i))
            chosen = []
            for _ in range(k):
                weights = [indeg[v] + 1 for v in pool]
                total = sum(weights)
                r = _pyrandom.random() * total
                acc = 0.0
                pick_idx = len(pool) - 1
                for idx, w in enumerate(weights):
                    acc += w
                    if r < acc:
                        pick_idx = idx
                        break
                chosen.append(pool.pop(pick_idx))
            for v in chosen:
                edges.append((i, v))
                indeg[v] += 1
        return cls(n, edges)

    # --- queries ---

    def get_adjacency(self):
        data = [[0] * self.n for _ in range(self.n)]
        for s, t in self._edges:
            data[s][t] += 1
        return _Matrix(data)

    def incident(self, j, mode="out"):
        j = int(j)
        if mode in ("in", "IN", 2):
            return [e for e, (s, t) in enumerate(self._edges) if t == j]
        if mode in ("out", "OUT", 1):
            return [e for e, (s, t) in enumerate(self._edges) if s == j]
        return [e for e, (s, t) in enumerate(self._edges) if s == j or t == j]

    def permute_vertices(self, perm):
        """Relabel: vertex i becomes perm[i] (igraph semantics)."""
        perm = [int(p) for p in perm]
        edges = [(perm[s], perm[t]) for (s, t) in self._edges]
        return Graph(self.n, edges)

    def topological_sorting(self, mode="out"):
        indeg = [0] * self.n
        adj = [[] for _ in range(self.n)]
        for s, t in self._edges:
            indeg[t] += 1
            adj[s].append(t)
        queue = deque(v for v in range(self.n) if indeg[v] == 0)
        order = []
        while queue:
            v = queue.popleft()
            order.append(v)
            for w in adj[v]:
                indeg[w] -= 1
                if indeg[w] == 0:
                    queue.append(w)
        if len(order) != self.n:
            raise RuntimeError("graph contains a cycle; no topological order")
        return order

    def is_dag(self):
        try:
            self.topological_sorting()
            return True
        except RuntimeError:
            return False
