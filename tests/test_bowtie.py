"""Bowtie decomposition (algos/bowtie.py) vs pure-Python reachability.

The Spark sweeps are frontier SpMV supersteps (TopDownBFS.cpp:437-444
without the parent payload); the reference here is an independent
set-based BFS, plus the structural invariants the Broder regions must
satisfy on ANY directed graph.
"""

from collections import defaultdict

import pytest

from combblas_spark.algos.bowtie import bowtie_decompose, reachable_set
from combblas_spark.sources.tables import event_link_edges


def _py_reach(edges, root, reverse=False):
    adj = defaultdict(set)
    for s, d in edges:
        if reverse:
            adj[d].add(s)
        else:
            adj[s].add(d)
    seen, fr = {root}, {root}
    while fr:
        fr = {x for f in fr for x in adj[f]} - seen
        seen |= fr
    return seen


def _py_bowtie(edges, root):
    fwd, bwd = _py_reach(edges, root), _py_reach(edges, root, reverse=True)
    verts = {v for e in edges for v in e}
    out = {}
    for v in verts:
        if v in fwd and v in bwd:
            out[v] = "CORE"
        elif v in bwd:
            out[v] = "IN"
        elif v in fwd:
            out[v] = "OUT"
        else:
            out[v] = "OTHER"
    return out


HAND_EDGES = [
    # IN chain -> 3-cycle CORE -> OUT, plus a disconnected pair
    (0, 1), (1, 2),          # IN: 0, 1
    (2, 3), (3, 4), (4, 2),  # CORE: 2, 3, 4
    (4, 5), (5, 6),          # OUT: 5, 6
    (8, 9),                  # OTHER: 8, 9
]


def test_hand_graph_regions(spark):
    e = spark.createDataFrame(HAND_EDGES, schema="src long, dst long")
    got = {
        r["v"]: r["region"]
        for r in bowtie_decompose(spark, e, root=2, n_partitions=4).collect()
    }
    assert got == _py_bowtie(HAND_EDGES, 2)
    assert got[2] == "CORE" and got[0] == "IN" and got[6] == "OUT"
    assert got[8] == "OTHER" and got[9] == "OTHER"


def test_reachable_matches_python_on_event_graph(spark, sf_dir):
    edges = event_link_edges(spark, sf_dir)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    root = min(
        {s for s, _ in pairs},
        key=lambda v: (-sum(1 for s, _ in pairs if s == v), v),
    )
    e = edges.repartition(4, "src").cache()
    e.count()
    got_f = {r["v"] for r in reachable_set(spark, e, root).collect()}
    got_b = {
        r["v"] for r in reachable_set(spark, e, root, reverse=True).collect()
    }
    e.unpersist()
    assert got_f == _py_reach(pairs, root)
    assert got_b == _py_reach(pairs, root, reverse=True)


def test_region_invariants_on_event_graph(spark, sf_dir):
    edges = event_link_edges(spark, sf_dir)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    root = min(
        {s for s, _ in pairs},
        key=lambda v: (-sum(1 for s, _ in pairs if s == v), v),
    )
    got = {
        r["v"]: r["region"]
        for r in bowtie_decompose(spark, edges, root, n_partitions=4).collect()
    }
    assert got == _py_bowtie(pairs, root)
    assert got[root] == "CORE"
    for s, d in pairs:
        # edges out of the core only reach the forward set
        if got[s] == "CORE":
            assert got[d] in ("CORE", "OUT")
        # edges into the core only come from the backward set
        if got[d] == "CORE":
            assert got[s] in ("CORE", "IN")
        # OUT is absorbing: reaching CORE from it would make it CORE
        if got[s] == "OUT":
            assert got[d] == "OUT"


def test_levels_cover_sf001_and_sf01_depths():
    """BOWTIE_LEVELS in __spark_entry__ must dominate the measured
    fixpoint depths (fwd 10 / bwd 15 at sf0.01); monotone unions make
    overshoot idempotent, undershoot wrong."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert m.BOWTIE_LEVELS >= 18
