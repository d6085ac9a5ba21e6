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
    path: str | None = None,
) -> None:
    """Persist ``g``'s edges bucketed (and sorted within buckets) on
    ``bucket_key``.

    ``bucket_key=dst`` matches the PageRank/SpMV superstep layout
    (votes aggregate by dst); use ``src`` for pull-style kernels.  The
    one-time write pays the exchange the per-session joins then skip.
    ``path`` makes the table external (object-store locations).
    """
    n = n_buckets or g.n_partitions
    w = g.edges.write.mode(mode).bucketBy(n, bucket_key).sortBy(bucket_key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_adjacency_blocks(
    g: Graph,
    table: str,
    n_buckets: int | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``g`` as a CSR-blocked adjacency structure: one row per
    source vertex, out-neighbors (and weights) as position-aligned
    sorted arrays, rows bucketed on ``src``.

    This is the DataFrame rendering of the reference's per-process CSC
    blocks (SpDCCols, include/CombBLAS/SpDCCols.h — values grouped by
    major dimension with an index array): the bucket is the block, the
    row is the compressed column, and ``dsts`` is the index array.
    Compared to the flat edge table it removes the per-row src
    repetition (parquet RLE already compresses it, but the grouped form
    also gives O(1) degree access and row-at-a-time adjacency scans for
    samplers/walkers).  The group-by pays one exchange at write time;
    readers get back the flat (src, dst, w) stream via one explode —
    no shuffle, no sort.
    """
    n = n_buckets or g.n_partitions
    adj = (
        g.edges.groupBy(SRC)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(DST), F.col("w")))
            ).alias("_nbrs")
        )
        .select(
            SRC,
            F.transform("_nbrs", lambda x: x[DST]).alias("dsts"),
            F.transform("_nbrs", lambda x: x["w"]).alias("ws"),
            F.size("_nbrs").alias("degree"),
        )
    )
    w = adj.write.mode(mode).bucketBy(n, SRC).sortBy(SRC)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_adjacency_blocks(
    spark: SparkSession, table: str, n_partitions: int | None = None
) -> Graph:
    """CSR-blocked adjacency table → :class:`Graph` (flat edge view).

    The explode is narrow (no exchange); the bucket spec on ``src``
    still serves pull-style joins planned directly on the grouped
    table (``spark.table(table)``) when the caller wants degree or
    whole-adjacency rows instead of the edge stream.
    """
    adj = spark.table(table)
    edges = adj.select(
        SRC,
        F.explode(F.arrays_zip("dsts", "ws")).alias("_e"),
    ).select(
        SRC,
        F.col("_e.dsts").alias(DST),
        F.col("_e.ws").alias("w"),
    )
    nb = n_partitions
    if nb is None:
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        for r in desc:
            if r["col_name"] == "Num Buckets":
                nb = int(r["data_type"])
                break
    return Graph(edges=edges, n_partitions=nb or edges.rdd.getNumPartitions())


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
