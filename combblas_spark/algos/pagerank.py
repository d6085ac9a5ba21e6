"""PageRank as iterative semiring SpMV (PlusTimes).

Reference: Applications/CC_ipdps18/HPCGraph/0.1/pagerank.cpp —
damping 0.85 (:59), init 1/n scaled by 1/outdeg (:88-101), per
iteration ``pr' = α·(Σ incoming contrib + dangling_mass/n) + (1-α)/n``
with dangling (no-out-edge) mass allreduced each iteration (:160-201),
convergence ``max|pr'-pr| < tol``.

Spark formulation: contrib(v) = rank(v)/outdeg(v) (DimApply analogue),
one co-partitioned join edges⋈contrib + groupBy(dst).sum per iteration
(the PlusTimes SpMV), dangling mass as a scalar agg, lineage cut every
iteration via localCheckpoint (or durable checkpoints through
plans.checkpoint for resumability).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import SRC, DST, Graph


@dataclass
class PageRankResult:
    ranks: DataFrame          # (v: long, rank: double)
    iterations: int
    delta: float              # final max|pr'-pr|
    edges_processed: int      # num_edges * iterations (throughput numerator)


def pagerank(
    spark: SparkSession,
    g: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpointer=None,
    check_every: int = 1,
) -> PageRankResult:
    """Run PageRank to ``tol`` convergence (or ``max_iter``).

    ``checkpointer``: optional plans.checkpoint.Checkpointer — when set,
    each iteration's ranks are snapshotted durably and the run is
    resumable (north-rule).  Without it, localCheckpoint cuts lineage.
    """
    # vertex universe + out-degrees, computed once and cached
    verts = g.vertices().repartition(g.n_partitions, "v").cache()
    n = verts.count()
    outdeg = g.out_degrees()
    # vd: (v, deg) with deg=0 for dangling vertices
    vd = (
        verts.join(outdeg, "v", "left")
        .select("v", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
        .repartition(g.n_partitions, "v")
        .cache()
    )
    vd.count()

    m = g.num_edges()
    edges = g.edges.repartition(g.n_partitions, SRC).cache()
    edges.count()

    start_iter = 0
    if checkpointer is not None and checkpointer.latest_iteration() is not None:
        start_iter = checkpointer.latest_iteration() + 1
        ranks = checkpointer.load_latest(spark)
    else:
        ranks = vd.select("v", F.lit(1.0 / n).alias("rank"))

    delta = float("inf")
    it = start_iter
    while it < max_iter and delta > tol:
        # contrib = rank/outdeg on non-dangling; dangling mass is a scalar
        rd = ranks.join(vd, "v")
        dangling = (
            rd.filter(F.col("deg") == 0).agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        contrib = rd.filter(F.col("deg") > 0).select(
            "v", (F.col("rank") / F.col("deg")).alias("val")
        )
        # PlusTimes SpMV: edges ⋈ contrib → groupBy(dst).sum
        sums = (
            edges.join(contrib, edges[SRC] == contrib["v"], "inner")
            .groupBy(F.col(DST).alias("v"))
            .agg(F.sum("val").alias("s"))
        )
        base = (1.0 - alpha) / n + alpha * dangling / n
        new_ranks = (
            verts.join(sums, "v", "left")
            .select(
                "v",
                (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .repartition(g.n_partitions, "v")
        )
        if checkpointer is not None:
            new_ranks = checkpointer.snapshot(new_ranks, it, metrics={"n": n, "m": m})
        else:
            new_ranks = new_ranks.localCheckpoint(eager=True)

        if (it - start_iter) % check_every == 0 or it == max_iter - 1:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("rank", "old"), "v")
                .agg(F.max(F.abs(F.col("rank") - F.col("old"))).alias("d"))
                .collect()[0][0]
            )
        ranks = new_ranks
        it += 1

    return PageRankResult(
        ranks=ranks, iterations=it, delta=delta, edges_processed=m * it
    )


def pagerank_fixed(
    spark: SparkSession,
    g: Graph,
    n_iter: int,
    alpha: float = 0.85,
) -> DataFrame:
    """Exactly ``n_iter`` PageRank iterations (no convergence check).

    Used by the DuckDB-oracle correctness gate, where the oracle SQL
    unrolls the same number of iterations as chained CTEs.
    """
    res = pagerank(spark, g, alpha=alpha, tol=-1.0, max_iter=n_iter)
    return res.ranks
