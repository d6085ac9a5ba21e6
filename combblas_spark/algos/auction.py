"""Auction-algorithm weighted bipartite matching.

Reference: Applications/BipartiteMatchings/auction.cpp — CombBLAS's
experimental auction kernel.  The reference file implements ONE auction
round as a semiring SpMV (SubMaxSR at :60-103 computes each bidder's
best and second-best profit ``c_ij − price_j``; bids are placed via
``Invert`` with a max-bid combiner at :394-398; winning objects adopt
their bidder and previous owners are revoked at :405-438) but stops
there: there is no outer loop, prices are never carried between rounds,
and the revoked-bidder write-back is commented out (:441) — it is an
explicitly experimental sketch of Bertsekas' auction algorithm.

This module implements the COMPLETE algorithm the sketch points at
(Bertsekas 1988, the published auction method the reference cites by
construction): repeat rounds of

    1. every unmatched bidder row i finds its best object
       j* = argmax_j (w_ij − p_j) with value v1 and second-best v2,
    2. bids p_{j*} + (v1 − v2) + ε on it,
    3. each object accepts its highest bid (price rises to the bid),
       adopting the bidder and releasing the previous owner,

until no unmatched bidder remains.  With ε < 1/n (n = #objects) and
integer-valued weights the final matching is a MAXIMUM-WEIGHT
assignment exactly (ε-complementary-slackness); pytest gates this
against brute-force optima.

Spark formulation: prices and mates are DataFrames; a round is one
edges ⋈ prices join, a per-row top-2 window (v1/v2), a per-object
max-bid window, and two anti-join rebuilds — all set-at-a-time, the
direct analogue of the reference's SpMV + Invert round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph


def auction_matching(
    spark: SparkSession,
    g: Graph,
    eps: float | None = None,
    max_rounds: int = 10_000,
) -> DataFrame:
    """Maximum-weight bipartite matching of the row side onto the
    column side by the auction algorithm.  Returns (src, dst).

    ``eps`` defaults to 1/(n_objects + 1) — optimal for integer-valued
    weights.  Rows without any edge never bid (they are unmatchable).
    The row side must be matchable (≤ one column each; a row side
    larger than the column side would bid forever — the loop raises
    after ``max_rounds`` instead of spinning).
    """
    edges = (
        g.edges.select(SRC, DST, W)
        .groupBy(SRC, DST)
        .agg(F.max(W).alias(W))
        .repartition(g.n_partitions, SRC)
        .cache()
    )
    edges.count()
    n_obj = edges.select(DST).distinct().count()
    if eps is None:
        eps = 1.0 / (n_obj + 1)

    prices = edges.select(DST).distinct().withColumn("_p", F.lit(0.0))
    prices = prices.localCheckpoint(eager=True)
    mate = spark.createDataFrame([], f"{SRC} long, {DST} long")
    bidders = edges.select(SRC).distinct().localCheckpoint(eager=True)

    for _ in range(max_rounds):
        unmatched = bidders.join(mate.select(SRC), SRC, "left_anti")
        if unmatched.isEmpty():
            return mate
        # best / second-best profit per unmatched bidder (SubMaxSR)
        prof = (
            edges.join(unmatched, SRC, "left_semi")
            .join(prices, DST)
            .withColumn("_profit", F.col(W) - F.col("_p"))
        )
        wtop = Window.partitionBy(SRC).orderBy(
            F.col("_profit").desc(), F.col(DST).asc()
        )
        ranked = prof.withColumn("_rn", F.row_number().over(wtop)).filter(
            F.col("_rn") <= 2
        )
        best = ranked.filter(F.col("_rn") == 1).select(
            SRC, DST, F.col("_profit").alias("_v1"), F.col("_p").alias("_pj")
        )
        second = ranked.filter(F.col("_rn") == 2).select(
            SRC, F.col("_profit").alias("_v2")
        )
        bids = (
            best.join(second, SRC, "left")
            # single-object bidders bid as if the runner-up were one
            # unit worse — a finite stand-in for Bertsekas' −∞ (smaller
            # increments only slow convergence, never break ε-CS)
            .withColumn("_v2", F.coalesce(F.col("_v2"), F.col("_v1") - 1.0))
            .withColumn(
                "_bid", F.col("_pj") + F.col("_v1") - F.col("_v2") + F.lit(eps)
            )
            .select(SRC, DST, "_bid")
        )
        wobj = Window.partitionBy(DST).orderBy(F.col("_bid").desc(), F.col(SRC).asc())
        wins = (
            bids.withColumn("_rn", F.row_number().over(wobj))
            .filter(F.col("_rn") == 1)
            .select(SRC, DST, "_bid")
            .localCheckpoint(eager=True)
        )
        if wins.isEmpty():
            return mate  # nobody can bid (no edges on unmatched rows)
        prices = (
            prices.join(wins.select(DST), DST, "left_anti")
            .unionByName(wins.select(DST, F.col("_bid").alias("_p")))
            .localCheckpoint(eager=True)
        )
        mate = (
            mate.join(wins.select(DST), DST, "left_anti")  # revoke owners
            .unionByName(wins.select(SRC, DST))
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"auction did not terminate within {max_rounds} rounds — the "
        "bidder side is likely larger than the matchable object side"
    )
