"""MCL clustering + streaming-ingest tests."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from combblas_spark.algos.mcl import mcl
from combblas_spark.sources import fixtures as FX
from combblas_spark.streaming.ingest import (
    append_to_edge_table,
    incremental_out_degrees,
    stream_edges,
)


def test_mcl_two_cliques(spark):
    # 2×K5 (+1 isolate via self-loop) must resolve to the two cliques
    g = FX.graph(spark, FX.TWO_CLIQUES, n_partitions=4)
    res = mcl(spark, g, inflation=2.0, max_iter=20)
    assert res.chaos <= 1e-4
    got = {r["v"]: r["cluster"] for r in res.clusters.collect()}
    c1 = {got[v] for v in range(5)}
    c2 = {got[v] for v in range(5, 10)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    assert got[10] not in (c1 | c2)  # isolate stays its own cluster


def test_mcl_prune_recovery_restores_weak_columns(spark):
    """A column whose values ALL fall below the hard threshold would be
    pruned empty without recovery (its vertex then detaches spuriously);
    MCLPruneRecoverySelect brings entries back down to the recover_pct
    quantile (ParFriends.h:200-368)."""
    from combblas_spark.graph import Graph
    from combblas_spark.operators.reduce import mcl_prune_recovery_select

    edges = spark.createDataFrame(
        [
            (0, 0, 0.5), (1, 0, 0.5),                     # healthy column
            (0, 1, 0.004), (1, 1, 0.003), (2, 1, 0.003),  # all-below-threshold
        ],
        "src long, dst long, w double",
    )
    g = Graph(edges=edges, n_partitions=2)
    out = mcl_prune_recovery_select(
        g, hard_threshold=0.01, select_k=5, recover_num=2, recover_pct=0.9
    )
    by_col = {}
    for r in out.edges.collect():
        by_col.setdefault(r["dst"], set()).add(r["src"])
    assert by_col[0] == {0, 1}          # healthy column untouched
    assert 1 in by_col and by_col[1]    # weak column recovered, not emptied


def test_mcl_recovery_keeps_clique_clusters(spark):
    """Wiring recovery into mcl() must not change converged clusters on
    the clique fixture (recovery only touches weak columns)."""
    g = FX.graph(spark, FX.TWO_CLIQUES, n_partitions=4)
    res = mcl(spark, g, inflation=2.0, max_iter=20, recover_num=3)
    got = {r["v"]: r["cluster"] for r in res.clusters.collect()}
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v] for v in range(5, 10)}) == 1
    assert got[0] != got[5]


def test_mcl_seven_graph_converges(spark):
    g = FX.graph(spark, FX.SEVEN, n_partitions=4).symmetrize()
    res = mcl(spark, g, inflation=2.0, max_iter=30)
    assert res.chaos <= 1e-4
    # every vertex assigned exactly one cluster
    assert res.clusters.count() == 7
    assert res.clusters.select("v").distinct().count() == 7


def test_streaming_ingest_and_degrees(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    tbl_dir = str(tmp_path / "edge_table")
    ck1 = str(tmp_path / "ck_append")
    ck2 = str(tmp_path / "ck_degs")
    os.makedirs(src_dir, exist_ok=True)

    batch1 = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)], "src long, dst long, w double"
    )
    batch1.write.mode("append").parquet(src_dir)

    q = append_to_edge_table(stream_edges(spark, src_dir), tbl_dir, ck1)
    q.awaitTermination(60)
    assert spark.read.parquet(tbl_dir).count() == 3

    # second micro-batch arrives; append picks up only the new file
    batch2 = spark.createDataFrame(
        [(0, 3, 1.0), (2, 3, 1.0)], "src long, dst long, w double"
    )
    batch2.write.mode("append").parquet(src_dir)
    q = append_to_edge_table(stream_edges(spark, src_dir), tbl_dir, ck1)
    q.awaitTermination(60)
    assert spark.read.parquet(tbl_dir).count() == 5

    # stateful degree aggregation over everything ingested so far
    q = incremental_out_degrees(stream_edges(spark, src_dir), ck2, "t_degs")
    q.awaitTermination(60)
    degs = {r["v"]: r["deg"] for r in spark.sql("SELECT * FROM t_degs").collect()}
    assert degs == {0: 3, 1: 1, 2: 1}


def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    from datetime import datetime

    from combblas_spark.streaming.ingest import windowed_event_counts

    src_dir = str(tmp_path / "events_in")
    ck = str(tmp_path / "ck_win")
    os.makedirs(src_dir, exist_ok=True)
    rows = [
        (datetime(2026, 1, 1, 10, 5), "click"),
        (datetime(2026, 1, 1, 10, 40), "click"),
        (datetime(2026, 1, 1, 11, 10), "view"),
        (datetime(2026, 1, 1, 11, 20), "click"),
    ]
    spark.createDataFrame(rows, "ts timestamp, event_type string").write.mode(
        "append"
    ).parquet(src_dir)

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_win")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["window"].start.hour, r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM t_win").collect()
    }
    assert got == {(10, "click"): 2, (11, "view"): 1, (11, "click"): 1}


def test_write_read_mcl_clusters_roundtrip(spark, tmp_path):
    """WriteMCLClusters analogue (Applications/WriteMCLClusters.h):
    cluster file round-trips to the identical assignment partition,
    sharded and gathered, ids and label-decoded."""
    from combblas_spark.sources.clusters import (
        read_mcl_clusters,
        write_mcl_clusters,
    )

    g = FX.graph(spark, FX.TWO_CLIQUES, n_partitions=4)
    res = mcl(spark, g, inflation=2.0, max_iter=20)
    want = {}
    for r in res.clusters.collect():
        want.setdefault(r["cluster"], set()).add(str(r["v"]))
    want_parts = {frozenset(v) for v in want.values()}

    for gathered in (False, True):
        path = str(tmp_path / f"clusters_{gathered}")
        write_mcl_clusters(res.clusters, path, gathered=gathered)
        back = read_mcl_clusters(spark, path)
        got = {}
        for r in back.collect():
            got.setdefault(r["cluster_key"], set()).add(r["name"])
        assert {frozenset(v) for v in got.values()} == want_parts

    # label-decoded variant: dictionary maps v -> "u<v>"
    dictionary = spark.range(11).select(
        F.concat(F.lit("u"), F.col("id")).alias("label"), F.col("id").alias("id")
    )
    path = str(tmp_path / "clusters_labeled")
    write_mcl_clusters(res.clusters, path, dictionary=dictionary, gathered=True)
    back = read_mcl_clusters(spark, path)
    got = {}
    for r in back.collect():
        got.setdefault(r["cluster_key"], set()).add(r["name"])
    want_labeled = {frozenset("u" + m for m in p) for p in want_parts}
    assert {frozenset(v) for v in got.values()} == want_labeled

    # base-offset variant writes ids + base (WriteMCLClusters.h:148)
    path = str(tmp_path / "clusters_base1")
    write_mcl_clusters(res.clusters, path, base=1, gathered=True)
    back = read_mcl_clusters(spark, path)
    names = {r["name"] for r in back.collect()}
    assert names == {str(v + 1) for v in range(11)}


def test_stateful_sessionize_across_restarts(spark, tmp_path):
    """applyInPandasWithState session assembly: the open session lives
    in the streaming checkpoint, so a session spanning two separate
    availableNow runs (a query restart) closes correctly when the
    gap-exceeding event arrives in the second run."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from combblas_spark.streaming.ingest import (
        EVENT_SCHEMA,
        stateful_sessionize,
    )

    src = tmp_path / "events_in"
    ck = str(tmp_path / "ck")
    src.mkdir()

    def write_batch(name, rows):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, str(src / name))

    out_dir = str(tmp_path / "sessions_out")

    def drain():
        # file sink: the one in-tree sink that supports checkpoint
        # recovery (memory sink cannot restart from a checkpoint)
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
        q = (
            stateful_sessionize(stream, gap_s=300)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            tuple(r) for r in spark.read.parquet(out_dir).collect()
        )

    # run 1: user 1 has an open 2-event session, user 2 closes one
    # in-batch (gap 400 > 300) and leaves a second open
    write_batch("a.parquet", [(1, 0), (1, 100), (2, 50), (2, 450)])
    out1 = drain()
    assert out1 == [(2, 50, 50, 1)]

    # run 2 (fresh query, same checkpoint): user 1's late event closes
    # the session opened in run 1 — state crossed the restart
    write_batch("b.parquet", [(1, 1000), (2, 500)])
    out2 = drain()  # cumulative file-sink contents
    assert out2 == [(1, 0, 100, 2), (2, 50, 50, 1)]
