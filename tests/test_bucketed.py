"""Bucketed edge-table layout tests (sources/bucketed.py): the
persisted hash layout must make joins on the bucket key exchange-free
and sort-free on the edge side, and be semantically invisible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from combblas_spark.sources import fixtures as FX
from combblas_spark.sources.bucketed import (
    read_bucketed_edges,
    write_bucketed_edges,
)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    g = FX.graph(spark, FX.SEVEN, n_partitions=4)
    path = str(tmp_path_factory.mktemp("bucketed") / "edges_by_dst")
    spark.sql("DROP TABLE IF EXISTS edges_by_dst")
    write_bucketed_edges(g, "edges_by_dst", bucket_key="dst", path=path)
    yield read_bucketed_edges(spark, "edges_by_dst", n_partitions=4)
    spark.sql("DROP TABLE IF EXISTS edges_by_dst")


def test_bucketed_roundtrip_preserves_edges(spark, bucketed):
    want = sorted((s, d) for s, d, _ in FX.SEVEN)
    got = sorted((r["src"], r["dst"]) for r in bucketed.edges.collect())
    assert got == want
    assert bucketed.n_partitions == 4


def test_bucketed_join_skips_edge_exchange(spark, bucketed):
    """With broadcast suppressed (at web scale the vector side is NOT
    broadcastable), a join on the bucket key plans exactly ONE shuffle
    exchange (the vector side) and no Sort on the edge side; the plain
    parquet layout pays an exchange per side."""
    thresholds = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    for k, v in thresholds.items():
        spark.conf.set(k, v)
    try:
        vec = spark.createDataFrame(
            [(v, 1.0) for v in range(7)], "v long, x double"
        )
        joined = bucketed.edges.join(vec, bucketed.edges["dst"] == vec["v"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Bucketed: true" in plan, plan

        plain = bucketed.edges.localCheckpoint()  # strips the bucket spec
        joined2 = plain.join(vec, plain["dst"] == vec["v"])
        plan2 = joined2._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Exchange hashpartitioning") == 2, plan2
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_aggregate_skips_exchange(spark, bucketed):
    """groupBy on the bucket key needs no exchange at all."""
    agg = bucketed.edges.groupBy("dst").agg(F.sum("w").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan


def test_pagerank_identical_on_bucketed_layout(spark, bucketed):
    from combblas_spark.algos.pagerank import pagerank_fixed

    base = FX.graph(spark, FX.SEVEN, n_partitions=4)
    a = {
        r["v"]: r["rank"]
        for r in pagerank_fixed(spark, base, n_iter=5, alpha=0.85).collect()
    }
    b = {
        r["v"]: r["rank"]
        for r in pagerank_fixed(spark, bucketed, n_iter=5, alpha=0.85).collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_adjacency_blocks_roundtrip(spark, tmp_path_factory):
    """CSR-blocked write -> flat edge read round trip, degrees exposed,
    neighbor arrays sorted."""
    from combblas_spark.sources.bucketed import (
        read_adjacency_blocks,
        write_adjacency_blocks,
    )

    g = FX.graph(spark, FX.SEVEN, n_partitions=4)
    path = str(tmp_path_factory.mktemp("adj") / "adj_by_src")
    spark.sql("DROP TABLE IF EXISTS adj_by_src")
    write_adjacency_blocks(g, "adj_by_src", path=path)
    try:
        back = read_adjacency_blocks(spark, "adj_by_src", n_partitions=4)
        want = sorted((s, d) for s, d, _ in FX.SEVEN)
        got = sorted((r["src"], r["dst"]) for r in back.edges.collect())
        assert got == want
        rows = spark.table("adj_by_src").collect()
        for r in rows:
            assert r["degree"] == len(r["dsts"]) == len(r["ws"])
            assert r["dsts"] == sorted(r["dsts"])
        # the edge view needs no exchange and no sort: one bucketed scan
        plan = back.edges._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Sort" not in plan, plan
        # degree access is a column read, not an aggregation
        deg = {r["src"]: r["degree"] for r in rows}
        true_deg: dict[int, int] = {}
        for s, _, _ in FX.SEVEN:
            true_deg[s] = true_deg.get(s, 0) + 1
        assert deg == true_deg
    finally:
        spark.sql("DROP TABLE IF EXISTS adj_by_src")
