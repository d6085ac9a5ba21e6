"""MCL cluster output writer/reader (Applications/WriteMCLClusters.h).

The reference's ``WriteMCLClusters`` ends every HipMCL run by writing
one line per cluster — the cluster's member vertices space-separated,
either as string labels (``vtxLabels`` variant, :44-146) or as integer
ids plus a base offset (:148-210).  Spark form: decode ids through the
url→id dictionary (sources/dictionary) when given, group members per
cluster with a sorted collect, and write a text file — a sharded part
directory by default (the cloud-native ParallelWrite layout), or one
gathered file (``SaveGathered`` analogue) with ``gathered=True``.

Members are written in ascending vertex-id order within a line (the
reference walks vertices in index order), so each line's FIRST token
identifies the cluster deterministically (its min member) — which is
what the reader uses to reconstruct assignments without depending on
file/line ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_mcl_clusters(
    clusters: DataFrame,
    path: str,
    dictionary: DataFrame | None = None,
    base: int = 0,
    gathered: bool = False,
) -> None:
    """Write (v, cluster) assignments as one space-separated member
    line per cluster.  ``dictionary`` (label, id) decodes vertex ids to
    labels (WriteMCLClusters.h:44 variant); otherwise ids are written
    as integers offset by ``base`` (:148 variant)."""
    c = clusters.select("v", "cluster")
    if dictionary is not None:
        d = dictionary.select(F.col("id").alias("v"), "label")
        c = c.join(d, "v").select("v", "cluster", F.col("label").alias("name"))
    else:
        c = c.select(
            "v", "cluster", (F.col("v") + base).cast("string").alias("name")
        )
    lines = (
        c.groupBy("cluster")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("v", "name"))),
                    lambda s: s["name"],
                ),
                " ",
            ).alias("value"),
            F.min("v").alias("_first"),
        )
        .orderBy("_first")
        .select("value")
    )
    if gathered:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def read_mcl_clusters(spark: SparkSession, path: str) -> DataFrame:
    """Re-read a cluster file: (name, cluster_key) — ``cluster_key`` is
    the line's first member (the cluster's min vertex), so assignments
    reconstruct identically regardless of part-file or line order."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("value"))
        .filter(F.col("value") != "")
        .select(F.split("value", " ", -1).alias("toks"))
    )
    return lines.select(
        F.explode("toks").alias("name"),
        F.element_at("toks", 1).alias("cluster_key"),
    )
