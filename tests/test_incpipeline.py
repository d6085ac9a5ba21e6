"""End-to-end incremental pipeline driver tests
(Applications/Incremental/{Incremental-Pipeline, Full, LargestCC,
Prep-Data}.cpp parity — the orchestration binaries over mechanics
gated elsewhere)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from combblas_spark.algos.incpipeline import (
    full_pipeline,
    incremental_pipeline,
    largest_cc,
    split_batches,
)
from combblas_spark.graph import Graph
from combblas_spark.sources.clusters import read_mcl_clusters


def clique(vs):
    return [(a, b) for a in vs for b in vs if a != b]


def grouping(df):
    by_c = {}
    for r in df.collect():
        by_c.setdefault(r["cluster"], set()).add(r["v"])
    return {frozenset(s) for s in by_c.values()}


def test_split_batches_partitions_edges_exactly(spark):
    g = Graph.from_edge_list(
        spark.createDataFrame(clique(range(12)), "src long, dst long"),
        n_partitions=4,
    )
    batches = split_batches(g, 3, seed=7)
    assert len(batches) == 3
    # every edge lands in exactly one batch, and the union is the graph
    total = sum(b.count() for b in batches)
    assert total == g.edges.count()
    u = batches[0]
    for b in batches[1:]:
        u = u.unionByName(b)
    assert (
        u.groupBy("src", "dst").count().filter(F.col("count") > 1).count() == 0
    )
    # prefix property (Prep-Data semantics): batch i touches no vertex
    # of a batch > i
    k = 3
    for i, b in enumerate(batches):
        bad = b.filter(
            (F.pmod(F.xxhash64(F.col("src"), F.lit(7)), F.lit(k)) > i)
            | (F.pmod(F.xxhash64(F.col("dst"), F.lit(7)), F.lit(k)) > i)
        )
        assert bad.count() == 0


def test_incremental_pipeline_matches_full_pipeline(spark, tmp_path):
    # three explicit batches: two cliques, then a third clique, then a
    # vertex joining the first — the test_incremental fixture run
    # through the DRIVERS instead of hand-called steps
    b1 = clique(range(4)) + clique(range(4, 8))
    b2 = clique(range(8, 12))
    b3 = [(12, v) for v in range(4)] + [(v, 12) for v in range(4)]
    mk = lambda rows: spark.createDataFrame(rows, "src long, dst long")
    batches = [mk(b1), mk(b2), mk(b3)]

    out_inc = str(tmp_path / "inc")
    state, trace = incremental_pipeline(
        spark, batches, out_dir=out_inc, summary_iter=4, max_iter=20
    )
    assert [t.step for t in trace] == [0, 1, 2]
    assert trace[-1].n_vertices == 13

    full_clusters, full_trace = full_pipeline(spark, batches, max_iter=20)
    assert grouping(state.clusters) == grouping(full_clusters)
    assert grouping(state.clusters) == {
        frozenset(list(range(4)) + [12]),
        frozenset(range(4, 8)),
        frozenset(range(8, 12)),
    }

    # per-step WriteMCLClusters output round-trips
    last = trace[-1].out_path
    assert last is not None and os.path.exists(last)
    rt = read_mcl_clusters(spark, last)
    assert grouping(
        rt.select(
            F.col("name").cast("long").alias("v"),
            F.col("cluster_key").alias("cluster"),
        )
    ) == grouping(state.clusters)


def test_largest_cc_extracts_and_compacts(spark):
    # components: a path of 5 (largest), a triangle, an edge
    edges = (
        [(0, 1), (1, 2), (2, 3), (3, 4)]
        + [(10, 11), (11, 12), (12, 10)]
        + [(20, 21)]
    )
    g = Graph.from_edge_list(
        spark.createDataFrame(edges, "src long, dst long"), n_partitions=4
    )
    sub, comp, size = largest_cc(spark, g)
    assert comp == 0 and size == 5
    rows = sorted(
        (r["src"], r["dst"]) for r in sub.edges.select("src", "dst").collect()
    )
    # relabeled densely 0..4, structure preserved (path)
    assert rows == [(0, 1), (1, 2), (2, 3), (3, 4)]
