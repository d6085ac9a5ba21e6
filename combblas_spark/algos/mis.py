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
    max_iter: int = 64,
) -> DataFrame:
    """(v) rows forming a maximal independent set of the symmetrized
    pattern.  Deterministic for a fixed seed: priorities come from a
    seeded hash of the vertex id (counter-based, partitioning-stable),
    ties broken by id.
    """
    e = g.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))).distinct()
    edges = e.repartition(g.n_partitions, SRC).cache()
    edges.count()

    active = (
        edges.select(F.col(SRC).alias("v")).distinct()
        .withColumn("pri", F.xxhash64(F.col("v"), F.lit(seed)))
        .localCheckpoint(eager=True)
    )
    mis = spark.createDataFrame([], "v long")

    for _ in range(max_iter):
        if active.isEmpty():
            break
        # neighborhood-min over still-active edges (Select2ndMin on
        # priority): winner = vertex beating every active neighbor
        act_edges = (
            edges.join(active.select(F.col("v").alias(SRC)), SRC, "left_semi")
            .join(active.select(F.col("v").alias(DST)), DST, "left_semi")
        )
        nbr_best = (
            act_edges.join(active.select(F.col("v").alias(SRC), "pri"), SRC)
            .groupBy(F.col(DST).alias("v"))
            .agg(F.min(F.struct("pri", F.col(SRC).alias("nv"))).alias("m"))
            .select("v", F.col("m.pri").alias("npri"), F.col("m.nv").alias("nv"))
        )
        winners = (
            active.join(nbr_best, "v", "left")
            .filter(
                F.col("npri").isNull()
                | (F.struct("pri", "v") < F.struct(F.col("npri"), F.col("nv")))
            )
            .select("v")
            .localCheckpoint(eager=True)
        )
        mis = mis.unionByName(winners).localCheckpoint(eager=True)
        # deactivate winners and their neighbors
        nbrs = (
            edges.join(winners.withColumnRenamed("v", SRC), SRC, "left_semi")
            .select(F.col(DST).alias("v"))
            .distinct()
        )
        active = (
            active.join(winners, "v", "left_anti")
            .join(nbrs, "v", "left_anti")
            .localCheckpoint(eager=True)
        )
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
