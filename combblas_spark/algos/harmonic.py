"""Harmonic centrality from a source batch (multi-source BFS).

Harmonic centrality H(v) = Σ_{s≠v} 1/d(s, v) is the closeness variant
that stays well-defined on disconnected web graphs (unreached pairs
contribute 0 instead of poisoning the mean).  Like the betweenness
gate (algos/betweenness.py, BetwCent.cpp:126-220) the estimator runs a
FIXED source batch to a FIXED depth, which is both the standard
sampled estimator at web scale and what lets the DuckDB oracle unroll
the recursion exactly.

The kernel is one level-synchronous multi-source BFS: the frontier
(s, v) carries the source id, each level is a frontier⋈edges join plus
an anti-join against the visited set — CombBLAS's SpMSpV frontier
advance with the BoolOr semiring over a batch of right-hand sides
(the same batching trick as MS-BFS in algos/matching.py).  The edge
table is cached once; per level the only wide exchanges are the
distinct and the anti-join, both hash-partitioned on v.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def harmonic_centrality(
    spark: SparkSession,
    g: Graph,
    sources: list[int],
    max_depth: int,
    symmetrize: bool = True,
) -> DataFrame:
    """(v, harmonic) where harmonic = Σ over the source batch of
    1/d(s, v), over vertices reached within ``max_depth`` (v = s
    itself, distance 0, is excluded)."""
    e = g.edges.select(SRC, DST)
    if symmetrize:
        e = e.unionByName(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
    edges = e.distinct().repartition(g.n_partitions, SRC).cache()
    edges.count()

    from ..operators.spmv import broadcast_nnz_cutoff

    # the checkpointed frontier/visited slices hide size stats from
    # Catalyst (LogicalRDD reports defaultSizeInBytes), which silently
    # turns both per-level joins into sort-merge over the cached edge
    # table — broadcast them explicitly while the running (s, v) pair
    # count stays under the SpMSpV bytes cutoff (the BFS/MIS switch)
    cutoff = broadcast_nnz_cutoff(spark)
    n_pairs = len(sources)

    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n_pairs < cutoff else df

    frontier = spark.createDataFrame(
        [(s, s) for s in sources], schema="s long, v long"
    )
    visited = frontier.withColumn("depth", F.lit(0))
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(_maybe_b(frontier), edges[SRC] == frontier["v"], "inner")
            .select("s", F.col(DST).alias("v"))
            .distinct()
            .join(_maybe_b(visited.select("s", "v")), ["s", "v"], "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint(eager=True)
        )
        n_pairs += nxt.count()
        visited = visited.unionByName(nxt)
        frontier = nxt.select("s", "v")
    return (
        visited.filter(F.col("depth") > 0)
        .groupBy("v")
        .agg(F.round(F.sum(1.0 / F.col("depth")), 6).alias("harmonic"))
    )
