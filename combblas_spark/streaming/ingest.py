"""Structured Streaming edge ingest — an engine extension.

The reference has NO streaming surface (SURVEY.md §2.8): its
"incremental" mode is batch-incremental restart (Applications/
Incremental/).  This module is the Spark-native extension a continuous
crawl needs: new edge files land in a directory (or Kafka topic on a
real deployment), a stream appends them to the durable edge table and
maintains incremental per-vertex degree aggregates; iterative kernels
then run on the latest snapshot via plans/checkpoint resumability.

Kept deliberately thin: file-source → normalize → append sink, plus an
update-mode degree aggregation.  ``trigger(availableNow=True)`` drains
everything pending and stops — the pattern for both tests and cron-
style micro-batch ingestion at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("w", DoubleType(), True),
    ]
)


def stream_edges(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source edge stream: every parquet file dropped into
    ``source_dir`` becomes a micro-batch of (src, dst, w) rows."""
    raw = spark.readStream.schema(EDGE_SCHEMA).parquet(source_dir)
    return raw.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.coalesce(F.col("w"), F.lit(1.0)).alias("w"),
    )


def append_to_edge_table(
    stream: DataFrame, table_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Append micro-batches to the durable edge table (exactly-once via
    the streaming checkpoint).  Returns the started query."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Watermarked tumbling-window counts — the late-data pattern for a
    continuous crawl feed: events later than ``watermark`` behind the
    max seen event time are dropped and their window state is evicted
    (bounded state at 100 TB/day rates; without the watermark the
    window map grows forever).

    Returns the streaming DataFrame (window struct, key, n) — attach
    any sink; in append mode a window only emits once finalized by the
    watermark, which is the exactly-once-per-window contract downstream
    jobs want."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count("*").alias("n"))
    )


def incremental_out_degrees(
    stream: DataFrame, checkpoint_dir: str, sink_table: str = "stream_degrees",
    available_now: bool = True, complete_mode: bool = True,
):
    """Maintain (v, deg) as a stateful streaming aggregation.

    ``complete_mode=True`` (default, used by the in-memory test sink,
    which cannot upsert): every micro-batch rewrites the full aggregate
    — fine for inspection, NOT incremental at scale.  The scale path is
    ``complete_mode=False``: ``update`` output mode emits only changed
    (v, deg) rows per micro-batch; pair it with an upsert-capable sink
    (foreachBatch MERGE into Iceberg/Delta) so state writes stay
    O(changed vertices), not O(all vertices)."""
    degs = stream.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    writer = (
        degs.writeStream.outputMode("complete" if complete_mode else "update")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
