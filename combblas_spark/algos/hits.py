"""HITS (hubs & authorities) as alternating semiring SpMV.

Kleinberg's link-analysis pair to PageRank: per iteration
``auth'(v) = Σ_{u→v} hub(u)`` then ``hub'(u) = Σ_{u→v} auth'(v)``,
each L1-normalized.  Structurally this is two PlusTimes SpMVs per
iteration — one with the matrix, one with its transpose — i.e. the
same kernel as algos/pagerank.py (SpParMat::SpMV, SpImpl.h) applied in
both orientations, so the scale shape is identical: the edge table is
cached and never shuffles (the vertex vector broadcasts, or falls back
to the bytes-aware co-partitioned join), and the only wide exchange per
half-step is the groupBy partial+final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def hits_fixed(
    spark: SparkSession,
    g: Graph,
    n_iter: int,
) -> DataFrame:
    """(v, hub, auth) after exactly ``n_iter`` alternating updates,
    each half-step L1-normalized; init hub = 1 per vertex.  Fixed
    iteration count so the DuckDB oracle can unroll the recursion."""
    from ..operators.spmv import broadcast_nnz_cutoff, vec_join_side

    edges = (
        g.edges.select(SRC, DST).distinct().repartition(g.n_partitions, SRC).cache()
    )
    edges.count()
    verts = (
        edges.select(F.col(SRC).alias("v"))
        .unionByName(edges.select(F.col(DST).alias("v")))
        .distinct()
        .repartition(g.n_partitions, "v")
        .cache()
    )
    n = verts.count()
    _cut = broadcast_nnz_cutoff(spark)

    def _vec(df: DataFrame) -> DataFrame:
        return vec_join_side(df, n, cutoff=_cut)

    hub = verts.select("v", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(n_iter):
        araw = (
            edges.join(_vec(hub), edges[SRC] == hub["v"], "inner")
            .groupBy(F.col(DST).alias("v"))
            .agg(F.sum("hub").alias("a"))
        )
        asum = araw.agg(F.sum("a")).collect()[0][0]
        auth = (
            verts.join(araw, "v", "left")
            .select("v", (F.coalesce(F.col("a"), F.lit(0.0)) / asum).alias("auth"))
            .localCheckpoint(eager=True)
        )
        hraw = (
            edges.join(_vec(auth), edges[DST] == auth["v"], "inner")
            .groupBy(F.col(SRC).alias("v"))
            .agg(F.sum("auth").alias("h"))
        )
        hsum = hraw.agg(F.sum("h")).collect()[0][0]
        hub = (
            verts.join(hraw, "v", "left")
            .select("v", (F.coalesce(F.col("h"), F.lit(0.0)) / hsum).alias("hub"))
            .localCheckpoint(eager=True)
        )
    return hub.join(auth, "v").select(
        "v", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


def salsa_fixed(
    spark: SparkSession,
    g: Graph,
    n_iter: int,
) -> DataFrame:
    """SALSA (Lempel & Moran's Stochastic Approach for Link-Structure
    Analysis): HITS with the random-surfer normalization — every vertex
    splits its vote equally among its links instead of broadcasting it
    whole, which is what stops the mutual-reinforcement hub blowup on
    tightly-knit spam farms:

        auth'(v) = Σ_{u→v} hub(u)  / outdeg(u)
        hub'(u)  = Σ_{u→v} auth'(v) / indeg(v)

    each half-step L1-normalized; init hub = 1 per vertex; exactly
    ``n_iter`` alternating updates so the DuckDB oracle unrolls the
    recursion.  Same two-SpMV-per-iteration scale shape as hits_fixed —
    the degree reciprocals are folded into the cached edge table ONCE
    (one extra pair of O(n)-build joins before the loop), so the loop
    body is bit-for-bit the HITS superstep.
    """
    from ..operators.spmv import broadcast_nnz_cutoff, vec_join_side

    dedges = g.edges.select(SRC, DST).distinct()
    odeg = dedges.groupBy(F.col(SRC).alias("v")).agg(F.count("*").alias("od"))
    ideg = dedges.groupBy(F.col(DST).alias("v")).agg(F.count("*").alias("id_"))
    edges = (
        dedges.join(
            odeg.withColumnRenamed("v", SRC).hint("shuffle_hash"), SRC
        )
        .join(ideg.withColumnRenamed("v", DST).hint("shuffle_hash"), DST)
        .select(SRC, DST, "od", "id_")
        .repartition(g.n_partitions, SRC)
        .cache()
    )
    edges.count()
    verts = (
        edges.select(F.col(SRC).alias("v"))
        .unionByName(edges.select(F.col(DST).alias("v")))
        .distinct()
        .repartition(g.n_partitions, "v")
        .cache()
    )
    n = verts.count()
    _cut = broadcast_nnz_cutoff(spark)

    def _vec(df: DataFrame) -> DataFrame:
        return vec_join_side(df, n, cutoff=_cut)

    hub = verts.select("v", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(n_iter):
        araw = (
            edges.join(_vec(hub), edges[SRC] == hub["v"], "inner")
            .groupBy(F.col(DST).alias("v"))
            .agg(F.sum(F.col("hub") / F.col("od")).alias("a"))
        )
        asum = araw.agg(F.sum("a")).collect()[0][0]
        auth = (
            verts.join(araw, "v", "left")
            .select("v", (F.coalesce(F.col("a"), F.lit(0.0)) / asum).alias("auth"))
            .localCheckpoint(eager=True)
        )
        hraw = (
            edges.join(_vec(auth), edges[DST] == auth["v"], "inner")
            .groupBy(F.col(SRC).alias("v"))
            .agg(F.sum(F.col("auth") / F.col("id_")).alias("h"))
        )
        hsum = hraw.agg(F.sum("h")).collect()[0][0]
        hub = (
            verts.join(hraw, "v", "left")
            .select("v", (F.coalesce(F.col("h"), F.lit(0.0)) / hsum).alias("hub"))
            .localCheckpoint(eager=True)
        )
    return hub.join(auth, "v").select(
        "v", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )
