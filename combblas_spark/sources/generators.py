"""Deterministic distributed graph generators.

``rmat_edges``: Graph500 R-MAT/Kronecker generator — initiator
probabilities {a=.57, b=.19, c=.19, d=.05} per the spec used by the
reference (DistEdgeList::GenGraph500Data, DistEdgeList.cpp:218-287;
RefGen21.h; TopDownBFS.cpp:270-300).  Re-expressed Spark-first:
``spark.range(nedges)`` + one Arrow-vectorized pandas UDF doing the
per-edge bit recursion with a counter-based hash RNG, so generation is
embarrassingly parallel, seed-reproducible, and identical at any
partitioning/parallelism (no stateful RNG streams).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..graph import Graph

A, B, C = 0.57, 0.19, 0.19  # d = 0.05


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a counter-based RNG: hash(seed, edge_id,
    level) → uniform 64-bit, so every (edge, level) draw is independent
    of partitioning."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    seed: int = 42,
    n_partitions: int = 32,
) -> DataFrame:
    """(src, dst) R-MAT edges: 2^scale vertices, edge_factor·2^scale edges."""
    n_edges = edge_factor * (1 << scale)

    @F.pandas_udf(LongType())
    def rmat_src(eid: pd.Series) -> pd.Series:
        return pd.Series(_rmat_coord(eid.to_numpy(np.uint64), scale, seed, 0))

    @F.pandas_udf(LongType())
    def rmat_dst(eid: pd.Series) -> pd.Series:
        return pd.Series(_rmat_coord(eid.to_numpy(np.uint64), scale, seed, 1))

    return (
        spark.range(0, n_edges, 1, n_partitions)
        .select(
            rmat_src(F.col("id")).alias("src"),
            rmat_dst(F.col("id")).alias("dst"),
        )
        .withColumn("w", F.lit(1.0))
    )


def _rmat_coord(eids: np.ndarray, scale: int, seed: int, which: int) -> np.ndarray:
    """Vectorized R-MAT bit recursion for one coordinate.

    Per level ℓ: draw u ~ U[0,1) from hash(seed, eid, ℓ); pick the
    quadrant by the {a,b,c,d} initiator; set bit ℓ of src/dst.
    """
    n = eids.shape[0]
    src = np.zeros(n, dtype=np.uint64)
    dst = np.zeros(n, dtype=np.uint64)
    base = np.uint64(seed) * np.uint64(0x100000001B3)
    for level in range(scale):
        h = _mix64(eids ^ (base + np.uint64(level) * np.uint64(0x9E3779B1)))
        u = h.astype(np.float64) / 2**64
        src_bit = (u >= A + B).astype(np.uint64)  # quadrants c,d set the src bit
        dst_bit = ((u >= A) & (u < A + B) | (u >= A + B + C)).astype(np.uint64)
        src |= src_bit << np.uint64(level)
        dst |= dst_bit << np.uint64(level)
    out = src if which == 0 else dst
    return out.astype(np.int64)


def rmat_graph(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    seed: int = 42,
    n_partitions: int = 32,
) -> Graph:
    """R-MAT graph with reference prep: sum duplicates, drop loops
    (TopDownBFS.cpp:306-322)."""
    e = rmat_edges(spark, scale, edge_factor, seed, n_partitions)
    return Graph.from_edge_list(
        e, sum_duplicates=True, remove_loops=True, n_partitions=n_partitions
    )


def perm_edges(edges: DataFrame, seed: int = 42, n_partitions: int = 32) -> DataFrame:
    """PermEdges (DistEdgeList.cpp:290-360): random load-balance
    permutation.  Spark's hash repartition already randomizes placement;
    an explicit seeded shuffle is kept for adversarial orderings."""
    return edges.repartition(n_partitions, F.hash("src", "dst", F.lit(seed)))
