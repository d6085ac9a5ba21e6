"""String-label → dense integer vertex-id dictionary.

The reference's ``ReadGeneralizedTuples`` (SpParMat.cpp:3886-3983)
builds a distributed label→id map (``FullyDistVec<IT,
std::array<char,64>>``) in a first pass, then relabels the tuples.
Spark-first equivalent: distinct labels, sorted, densely numbered with
a distributed zipWithIndex (deterministic because the input order is a
total sort — NO single-partition window, which would serialize at
100 TB), persisted so every later job relabels with a plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..graph import SRC, DST, W

_DICT_SCHEMA = StructType(
    [StructField("label", StringType(), False), StructField("id", LongType(), False)]
)


def build_dictionary(labels: DataFrame, col: str = "label") -> DataFrame:
    """(label) → (label, id) with ids dense 0..n-1 in label sort order.

    JVM-side throughout: the distributed range-partitioned sort plus a
    per-partition-offset rank (operators.indexing._dense_rank_by) — no
    single-partition window, no Python RDD pickling every label.
    Deterministic for a fixed label set at any parallelism.
    """
    from ..operators.indexing import _dense_rank_by

    distinct = labels.select(F.col(col).alias("label")).distinct()
    return _dense_rank_by(distinct, ["label"], "id", keep_cols=["label"]).select(
        "label", "id"
    )


def relabel_edges(
    links: DataFrame,
    dictionary: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """(src_label, dst_label) → (src, dst, w=1.0) integer edges.

    Inner joins drop dangling links pointing outside the crawl (the
    reference errors on unknown labels; dropping is the web-graph
    convention).  The dictionary is small relative to the edge list —
    broadcast if it fits, otherwise it's a co-partitioned shuffle join.
    """
    d_src = dictionary.select(F.col("label").alias(src_col), F.col("id").alias(SRC))
    d_dst = dictionary.select(F.col("label").alias(dst_col), F.col("id").alias(DST))
    return (
        links.join(d_src, src_col)
        .join(d_dst, dst_col)
        .select(SRC, DST, F.lit(1.0).alias(W))
    )
