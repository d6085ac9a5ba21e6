"""Minimum-degree ordering tests (Applications/Ordering/MD.cpp parity).

Gate 1: the distributed elimination order equals a pure-Python oracle
of the identical algorithm (reachable-set minimum degree, (deg, id)
tie-break) — the test_matching-vs-Kuhn pattern.
Gate 2: fill-reducing quality — symbolic Cholesky fill under the MD
permutation is no worse than the natural ordering on a grid graph
(grids are the classic case where naive ordering fills badly).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from combblas_spark.algos.ordering import md_ordering
from combblas_spark.graph import Graph


def grid_edges(rows: int, cols: int) -> list[tuple[int, int]]:
    """Undirected 2-D grid, both directions listed."""
    out = []
    for r in range(rows):
        for c in range(cols):
            v = r * cols + c
            if c + 1 < cols:
                out += [(v, v + 1), (v + 1, v)]
            if r + 1 < rows:
                out += [(v, v + cols), (v + cols, v)]
    return out


def adj_of(edges, n):
    adj = {v: set() for v in range(n)}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def md_oracle(adj, n):
    """Reachable-set exact minimum degree (MD.cpp getReach /
    getReachesSPMM semantics), pure Python."""
    deg = {v: len(adj[v]) for v in range(n)}
    enode: set[int] = set()
    order = []

    def reach_set(v):
        seen = {v}
        frontier = [v]
        out = set()
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in seen:
                        seen.add(w)
                        if w in enode:
                            nxt.append(w)
                        else:
                            out.add(w)
            frontier = nxt
        return out

    for _ in range(n):
        s = min((v for v in range(n) if v not in enode), key=lambda v: (deg[v], v))
        enode.add(s)
        order.append(s)
        rs = reach_set(s)
        for r in rs:
            deg[r] = len(reach_set(r))
    return order


def symbolic_fill(adj, n, order):
    """Fill edges introduced by symbolic elimination in this order."""
    work = {v: set(ns) for v, ns in adj.items()}
    pos = {v: i for i, v in enumerate(order)}
    fill = 0
    for v in order:
        live = [u for u in work[v] if pos[u] > pos[v]]
        for i, a in enumerate(live):
            for b in live[i + 1 :]:
                if b not in work[a]:
                    work[a].add(b)
                    work[b].add(a)
                    fill += 1
    return fill


def test_md_matches_oracle_and_reduces_fill(spark):
    rows, cols = 4, 4
    n = rows * cols
    edges = grid_edges(rows, cols)
    g = Graph.from_edge_list(
        spark.createDataFrame(edges, "src long, dst long"), n_partitions=4
    )
    perm = md_ordering(spark, g)
    got = [
        int(r["v"]) for r in perm.orderBy("new_id").collect()
    ]
    adj = adj_of(edges, n)
    assert got == md_oracle(adj, n)

    assert sorted(got) == list(range(n))  # a permutation
    fill_md = symbolic_fill(adj, n, got)
    fill_nat = symbolic_fill(adj, n, list(range(n)))
    assert fill_md <= fill_nat


def test_md_truncated_is_deterministic_prefix(spark):
    edges = grid_edges(3, 3)
    g = Graph.from_edge_list(
        spark.createDataFrame(edges, "src long, dst long"), n_partitions=2
    )
    full = [int(r["v"]) for r in md_ordering(spark, g).orderBy("new_id").collect()]
    part = md_ordering(spark, g, max_steps=4)
    got = [int(r["v"]) for r in part.orderBy("new_id").collect()]
    assert got[:4] == full[:4]
    assert sorted(got) == sorted(full)
