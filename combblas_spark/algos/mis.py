"""Maximal independent set (Luby) and filtered BFS.

MIS reference: Applications/FilteredMIS.cpp — random priorities +
neighborhood-min semiring per round: a vertex joins the MIS when its
priority beats every still-active neighbor's; neighbors of new MIS
vertices deactivate.  Self-verifying like the reference's tests:
independence (no edge inside the set) + maximality (every vertex in
or adjacent to the set).

Filtered BFS reference: Applications/FilteredBFS.cpp:371-424 — the
semiring applies a per-edge predicate at traversal time (TwitterEdge
time-window filters).  In Spark the predicate is just a ``where``
clause on the edge table inside the frontier join — filters are free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def maximal_independent_set(
    spark: SparkSession,
    g: Graph,
    seed: int = 42,
    max_iter: int = 256,
) -> DataFrame:
    """(v) rows forming a maximal independent set of the symmetrized
    pattern.  Deterministic for a fixed seed: priorities come from a
    seeded hash of the vertex id (counter-based, partitioning-stable),
    ties broken by id.

    Batched superstep: exactly TWO materializing jobs per round — (1)
    the (v, pri, won) status vector (winner = beats every still-active
    neighbor's (pri, id)), (2) the next active set (non-winners minus
    winner neighborhoods); the per-round count rides on the checkpointed
    result.  Winner slices accumulate lazily (each is a filter over a
    checkpointed status row set, so the final union has flat lineage).

    ``max_iter`` is a safety bound only; Luby terminates in O(log n)
    rounds w.h.p.  If it is ever exhausted with vertices still active
    the function RAISES rather than silently returning a non-maximal
    set (the docstring's maximality claim is load-bearing for callers).
    """
    e = g.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))).distinct()
    edges = e.repartition(g.n_partitions, SRC).cache()
    edges.count()

    from ..operators.spmv import broadcast_nnz_cutoff

    active = (
        edges.select(F.col(SRC).alias("v")).distinct()
        # seed cast to LONG so the chain is two 8-byte XXH64 rounds —
        # reproducible by functions/xxh.spark_xxhash64_longs and pinned
        # in the driver's mis_priorities oracle fixture
        .withColumn("pri", F.xxhash64(F.col("v"), F.lit(seed).cast("long")))
        .localCheckpoint(eager=True)
    )
    n_active = active.count()
    cutoff = broadcast_nnz_cutoff(spark)
    winner_slices: list[DataFrame] = []

    rounds = 0
    while n_active > 0 and rounds < max_iter:
        rounds += 1
        # a localCheckpoint hides size stats from Catalyst (LogicalRDD
        # reports defaultSizeInBytes), so the active-set joins would
        # silently fall back to sort-merge, re-sorting the cached edge
        # table every round — broadcast the small side explicitly,
        # driven by the count we already have (the SpMSpV switch again)
        def _maybe_b(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if n_active < cutoff else df

        # neighborhood-min over still-active edges (Select2ndMin on
        # priority), fused with the winner decision into one status job
        act_src = active.select(F.col("v").alias(SRC), F.col("pri").alias("_spri"))
        act_edges = edges.join(_maybe_b(act_src), SRC, "inner").join(
            _maybe_b(active.select(F.col("v").alias(DST))), DST, "left_semi"
        )
        nbr_best = (
            act_edges.groupBy(F.col(DST).alias("v"))
            .agg(F.min(F.struct(F.col("_spri").alias("pri"), F.col(SRC).alias("nv"))).alias("m"))
        )
        status = (
            active.join(_maybe_b(nbr_best), "v", "left")
            .select(
                "v",
                "pri",
                (
                    F.col("m").isNull()
                    | (F.struct("pri", "v") < F.col("m"))
                ).alias("won"),
            )
            .localCheckpoint(eager=True)
        )
        winners = status.filter(F.col("won")).select("v")
        winner_slices.append(winners)
        # deactivate winners and their neighbors in one job
        nbrs = (
            edges.join(_maybe_b(winners.withColumnRenamed("v", SRC)), SRC, "left_semi")
            .select(F.col(DST).alias("v"))
        )
        active = (
            status.filter(~F.col("won"))
            .select("v", "pri")
            .join(nbrs, "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_active = active.count()

    if n_active > 0:
        raise RuntimeError(
            f"MIS did not converge within max_iter={max_iter} rounds "
            f"({n_active} vertices still active); the partial set would "
            "not be maximal"
        )
    mis = spark.createDataFrame([], "v long")
    for w in winner_slices:
        mis = mis.unionByName(w)
    return mis


def filtered_bfs(
    spark: SparkSession,
    g: Graph,
    source: int,
    edge_predicate: Column,
    symmetrize: bool = True,
    max_iter: int = 10_000,
) -> DataFrame:
    """BFS where traversal only uses edges satisfying ``edge_predicate``
    (evaluated against the full edge row — the run-time filtered
    semiring of FilteredBFS.cpp, free as a where-clause here)."""
    from .bfs import bfs
    from dataclasses import replace

    filtered = replace(g, edges=g.edges.filter(edge_predicate))
    return bfs(spark, filtered, source, symmetrize=symmetrize, max_iter=max_iter)
