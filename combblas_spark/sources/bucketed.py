"""Bucketed edge-table storage — the layout lever for exchange-free
iterative joins at 100 TB.

Every iterative kernel in this engine (PageRank, CC, label prop, SSSP,
BFS beyond broadcast reach) joins the edge table against a vertex
table on the same key every superstep.  When the edge table lives in
plain parquet, the first join of every SESSION pays an O(m) exchange
to lay edges out by hash(key) — amortized within one run (the kernels
cache the shuffled layout), but paid again by every new job over the
same corpus.  Writing the edge table BUCKETED on the join key (Spark's
``bucketBy``, the persisted form of hash partitioning — the on-disk
analogue of the reference's 2D block distribution, CommGrid.h:44-166)
moves that exchange into the one-time write: any later session reading
the bucketed table joins it against a co-bucketed or shuffled vector
with NO exchange and NO sort on the edge side, verified by the plan
assertions in tests/test_bucketed.py.

Spark's bucketed-table API is metastore-backed (``saveAsTable``); the
bucket count plays the role of ``n_partitions`` and must match the
vector side's shuffle partitioning for the zero-exchange join, exactly
like the stable ``n_blocks`` contract in session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def write_bucketed_edges(
    g: Graph,
    table: str,
    bucket_key: str = DST,
    n_buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``g``'s edges bucketed (and sorted within buckets) on
    ``bucket_key``.

    ``bucket_key=dst`` matches the PageRank/SpMV superstep layout
    (votes aggregate by dst); use ``src`` for pull-style kernels.  The
    one-time write pays the exchange the per-session joins then skip.
    """
    n = n_buckets or g.n_partitions
    (
        g.edges.write.mode(mode)
        .bucketBy(n, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_edges(
    spark: SparkSession, table: str, n_partitions: int | None = None
) -> Graph:
    """Load a bucketed edge table as a :class:`Graph`.

    The returned DataFrame carries the bucket spec, so Catalyst plans
    joins on the bucket key without exchanging or sorting the edge
    side (``spark.sql.sources.bucketing.enabled`` is on by default).
    """
    df = spark.table(table)
    w = "w" if "w" in df.columns else None
    cols = [SRC, DST] + ([w] if w else [])
    edges = df.select(*cols)
    if w is None:
        edges = edges.withColumn("w", F.lit(1.0))
    nb = n_partitions
    if nb is None:
        # recover the bucket count from the catalog so downstream
        # vector tables can match it
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        for r in desc:
            if r["col_name"] == "Num Buckets":
                nb = int(r["data_type"])
                break
    return Graph(edges=edges, n_partitions=nb or edges.rdd.getNumPartitions())
