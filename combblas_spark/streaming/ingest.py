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


EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("ts", LongType(), False),
    ]
)


def stateful_sessionize(
    events: DataFrame, gap_s: int = 300
) -> DataFrame:
    """Custom stateful streaming operator: per-user session assembly
    via ``applyInPandasWithState`` — the Arrow-batched stateful path
    for semantics no built-in streaming aggregate expresses (a session
    has no fixed window; its end depends on the NEXT event's gap).

    Per key the state is the open session ``(start, last, n)``; a
    micro-batch's events extend it or close it (gap exceeded → the
    closed session row is emitted and a new one opens).  State lives in
    the streaming checkpoint, so sessions survive query restarts — the
    test drives two separate ``availableNow`` runs over one checkpoint
    and the session spanning them closes correctly.  The batch analogue
    is the oracle-gated ``sessionize`` window query; at corpus scale
    the stream holds O(active users) state rows, each O(1) wide, and
    each micro-batch shuffles only its own events once (groupBy key).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key, pdfs, state: GroupState):
        (uid,) = key
        ts_sorted = sorted(
            int(t) for pdf in pdfs for t in pdf["ts"].tolist()
        )
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for t in ts_sorted:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        assemble,
        outputStructType=(
            "user_id long, session_start long, session_end long, n_events int"
        ),
        stateStructType="start long, last long, n int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
