"""Personalized PageRank (topic-sensitive teleport set).

Same PlusTimes SpMV recursion as algos/pagerank.py (pagerank.cpp:160-201
semantics) with the uniform teleport replaced by a seed-set indicator:

    pr'(v) = (1-α)·t(v) + α·(Σ_{u→v} pr(u)/outdeg(u) + dangling·t(v))

where t(v) = 1/|S| for seeds S, else 0 — the standard seed-restart
random walk used for crawl-frontier prioritization and related-page
retrieval.  The superstep shape is pagerank.py's: cached edges never
shuffle, the rank vector rides the bytes-aware broadcast/co-partitioned
join, one groupBy(dst) exchange per iteration; the teleport column is a
broadcast O(|S|) join, so personalization adds no wide exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def ppr_fixed(
    spark: SparkSession,
    g: Graph,
    seeds: list[int],
    n_iter: int,
    alpha: float = 0.85,
) -> DataFrame:
    """(v, rank) after exactly ``n_iter`` seed-teleport iterations,
    init rank = t.  Fixed count so the DuckDB oracle can unroll."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    from ..operators.spmv import broadcast_nnz_cutoff, vec_join_side

    edges = g.edges.select(SRC, DST).repartition(g.n_partitions, SRC).cache()
    edges.count()
    deg = edges.groupBy(F.col(SRC).alias("v")).agg(F.count("*").alias("deg"))
    verts = (
        edges.select(F.col(SRC).alias("v"))
        .unionByName(edges.select(F.col(DST).alias("v")))
        .distinct()
    )
    t = 1.0 / len(seeds)
    seed_col = F.when(F.col("v").isin([int(s) for s in seeds]), F.lit(t)).otherwise(
        F.lit(0.0)
    )
    vd = (
        verts.join(deg, "v", "left")
        .select(
            "v",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            seed_col.alias("t"),
        )
        .repartition(g.n_partitions, "v")
        .cache()
    )
    n = vd.count()
    _cut = broadcast_nnz_cutoff(spark)

    def _vec(df: DataFrame) -> DataFrame:
        return vec_join_side(df, n, cutoff=_cut)

    ranks = vd.select("v", "deg", "t", F.col("t").alias("rank"))
    for _ in range(n_iter):
        contrib = ranks.filter(F.col("deg") > 0).select(
            "v", (F.col("rank") / F.col("deg")).alias("val")
        )
        dangling = (
            ranks.filter(F.col("deg") == 0).agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        sums = (
            edges.join(_vec(contrib), edges[SRC] == contrib["v"], "inner")
            .groupBy(F.col(DST).alias("v"))
            .agg(F.sum("val").alias("s"))
        )
        ranks = (
            vd.join(sums, "v", "left")
            .select(
                "v",
                "deg",
                "t",
                (
                    (1.0 - alpha) * F.col("t")
                    + alpha * (F.coalesce(F.col("s"), F.lit(0.0)) + dangling * F.col("t"))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("v", F.round("rank", 6).alias("rank"))
