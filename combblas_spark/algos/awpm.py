"""Approximate-weight perfect matching (AWPM / HWPM).

Reference: Applications/BipartiteMatchings/ApproxWeightPerfectMatching.h
— the headline CombBLAS 2.0 heavy-weight perfect matching used for
sparse-direct pivoting (README.md:177-195, TPDS'21): transform the
weights (TransformWeight, :1122-1141), bootstrap a perfect matching
(WeightedGreedy, BPMaximalMatching.h:241-360, completed by maximum-
cardinality matching when imperfect), then ``TwoThirdApprox``
(:791-1120) — repeated rounds of *weight-increasing alternating
4-cycles*: for a non-matching edge (i, j) with mates mi = mate(i),
mj = mate(j), swapping to {(i, j), (mj, mi)} changes the weight by

    gain = w(i,j) + w(mj,mi) − w(i,mi) − w(mj,j)

Per round the reference finds all positive-gain cycles (Phase1 emits
w(i,j) − w(i,mi) − w(mj,j) per candidate, Phase2 keeps candidates
whose back edge (mj, mi) exists in A, :600-614), picks one winner per
column-j (Phase3 max-gain, :938-962) then per column-mi among cycles
whose mi column has no Phase3 winner (Phase4, :996-1014 — this makes
winners pairwise vertex-disjoint, so all swaps apply simultaneously),
applies the flips, and repeats while the total weight increases
(max 10 rounds, :917).

Deviation, documented: the reference's Phase2 locates the back edge
but adds ``RepMateWR2C[mj]`` (= w(mj, j), already subtracted in
Phase1) instead of the located entry's weight — the ``find`` result is
never dereferenced (the ``// TODO: Add a function that returns the
edge weight directly`` at :772 marks it), collapsing the gain to
w(i,j) − w(i,mi).  This implementation uses the published gain above
(the algorithm's 2/3-approximation analysis depends on it); pytest
gates the 2/3 bound against brute-force optima.

Spark formulation: the mate vector is a (src, dst, w) DataFrame; one
round is edges ⋈ mate(src) ⋈ mate(dst) for the open wedge, a self-join
against edges for the back edge, two per-column window top-1 picks
(Phase3/Phase4), and a rebuild of the mate table — all set-at-a-time,
no per-vertex driver loop.  Ties on equal gain break deterministically
by (gain desc, i, mi)/(gain desc, i, j) where the reference is
arrival-order dependent.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph


def transform_weight(g: Graph, apply_log: bool = True) -> Graph:
    """TransformWeight (ApproxWeightPerfectMatching.h:1122-1141):
    |w| → scale rows to max 1 → scale the *scaled* columns to max 1 →
    optionally log (optimizeProd mode: maximizing Σ log w maximizes
    the product of matched weights, the sparse-direct objective)."""
    e = g.edges.withColumn(W, F.abs(F.col(W)))
    rmax = e.groupBy(SRC).agg(F.max(W).alias("_rm"))
    e = e.join(rmax, SRC).withColumn(W, F.col(W) / F.col("_rm")).drop("_rm")
    cmax = e.groupBy(DST).agg(F.max(W).alias("_cm"))
    e = e.join(cmax, DST).withColumn(W, F.col(W) / F.col("_cm")).drop("_cm")
    if apply_log:
        e = e.withColumn(W, F.log(F.col(W)))
    return replace(g, edges=e.select(SRC, DST, W))


def weighted_greedy_matching(
    spark: SparkSession, g: Graph, max_iter: int = 256
) -> DataFrame:
    """Weight-aware greedy maximal matching (WeightedGreedy,
    BPMaximalMatching.h:241-360): per round every unmatched row adopts
    its max-weight unmatched neighbor column (WeightMaxMLSR SpMV), a
    column picked by several rows keeps one (the Invert dedup), matched
    endpoints leave.  Deterministic tie-breaks: max weight then min
    column; min row per column.  Returns (src, dst) pairs."""
    edges = (
        g.edges.select(SRC, DST, W)
        .distinct()
        .repartition(g.n_partitions, SRC)
        .cache()
    )
    edges.count()
    remaining = edges.localCheckpoint(eager=True)
    slices: list[DataFrame] = []
    for _ in range(max_iter):
        if remaining.isEmpty():
            break
        rwin = Window.partitionBy(SRC).orderBy(F.col(W).desc(), F.col(DST).asc())
        prop = (
            remaining.withColumn("_rn", F.row_number().over(rwin))
            .filter(F.col("_rn") == 1)
            .select(SRC, DST)
        )
        new = prop.groupBy(DST).agg(F.min(SRC).alias(SRC)).select(SRC, DST)
        new = new.localCheckpoint(eager=True)
        slices.append(new)
        remaining = (
            remaining.join(new.select(SRC), SRC, "left_anti")
            .join(new.select(DST), DST, "left_anti")
            .select(SRC, DST, W)
            .localCheckpoint(eager=True)
        )
    out = spark.createDataFrame([], "src long, dst long")
    for s in slices:
        out = out.unionByName(s)
    return out


def two_third_approx(
    spark: SparkSession,
    g: Graph,
    mate: DataFrame,
    max_iter: int = 10,
    fixed_iters: int | None = None,
) -> DataFrame:
    """TwoThirdApprox (ApproxWeightPerfectMatching.h:791-1120): improve
    the weight of ``mate`` (src, dst — need not be perfect; unmatched
    vertices simply never join a cycle) by simultaneous vertex-disjoint
    weight-increasing alternating 4-cycles until the total weight stops
    increasing (≤ ``max_iter`` rounds, reference cap 10).

    ``fixed_iters`` runs exactly that many rounds with the convergence
    test disabled — the deterministic oracle-gate mode (rounds with no
    positive-gain cycle are no-ops, so the unroll is convergence-safe).
    Returns the improved (src, dst) matching.
    """
    edges = (
        g.edges.select(SRC, DST, W)
        .groupBy(SRC, DST)
        .agg(F.max(W).alias(W))
        .repartition(g.n_partitions, SRC)
        .cache()
    )
    edges.count()
    # mate rows carry their edge weight (matched pairs are graph edges)
    mate_w = (
        mate.select(SRC, DST).join(edges, [SRC, DST], "inner").localCheckpoint(eager=True)
    )

    def total_weight(m: DataFrame) -> float:
        row = m.agg(F.sum(W).alias("s")).collect()[0]
        return float(row["s"] or 0.0)

    n_rounds = fixed_iters if fixed_iters is not None else max_iter
    weight_prev = None
    for _ in range(n_rounds):
        if fixed_iters is None:
            w_cur = total_weight(mate_w)
            if weight_prev is not None and w_cur <= weight_prev:
                break
            weight_prev = w_cur
        mate_r = mate_w.select(
            F.col(SRC).alias("i"), F.col(DST).alias("mi"), F.col(W).alias("wi")
        )
        mate_c = mate_w.select(
            F.col(DST).alias("j"), F.col(SRC).alias("mj"), F.col(W).alias("wj")
        )
        e = edges.select(
            F.col(SRC).alias("i"), F.col(DST).alias("j"), F.col(W).alias("w")
        )
        back = edges.select(
            F.col(SRC).alias("mj"), F.col(DST).alias("mi"), F.col(W).alias("wback")
        )
        cand = (
            e.join(mate_r, "i")
            .join(mate_c, "j")
            # i > mj: each 4-cycle enumerated from exactly one of its two
            # non-matching edges (Phase1's symmetry break, :493)
            .filter(F.col("i") > F.col("mj"))
            .join(back, ["mj", "mi"])  # back edge must exist (Phase2)
            .withColumn(
                "gain",
                F.col("w") + F.col("wback") - F.col("wi") - F.col("wj"),
            )
            .filter(F.col("gain") > 0)
        )
        w3 = Window.partitionBy("j").orderBy(
            F.col("gain").desc(), F.col("i").asc(), F.col("mi").asc()
        )
        win3 = (
            cand.withColumn("_rn", F.row_number().over(w3))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        # Phase4: per-mi best among Phase3 winners whose mi column has no
        # Phase3 winner of its own — winners become vertex-disjoint
        blocked = win3.select(F.col("j").alias("mi"))
        w4 = Window.partitionBy("mi").orderBy(
            F.col("gain").desc(), F.col("i").asc(), F.col("j").asc()
        )
        win = (
            win3.join(blocked, "mi", "left_anti")
            .withColumn("_rn", F.row_number().over(w4))
            .filter(F.col("_rn") == 1)
            .localCheckpoint(eager=True)
        )
        if win.isEmpty():
            if fixed_iters is None:
                break
            continue
        rm = win.select(F.col("i").alias(SRC)).unionByName(
            win.select(F.col("mj").alias(SRC))
        )
        new_pairs = win.select(
            F.col("i").alias(SRC), F.col("j").alias(DST), F.col("w").alias(W)
        ).unionByName(
            win.select(
                F.col("mj").alias(SRC),
                F.col("mi").alias(DST),
                F.col("wback").alias(W),
            )
        )
        mate_w = (
            mate_w.join(rm, SRC, "left_anti")
            .unionByName(new_pairs)
            .localCheckpoint(eager=True)
        )
    return mate_w.select(SRC, DST)


def awpm(
    spark: SparkSession,
    g: Graph,
    optimize_prod: bool = True,
    max_iter: int = 10,
) -> DataFrame:
    """AWPM driver (ApproxWeightPerfectMatching.h:1143-1219): transform
    weights, bootstrap with weighted greedy, complete cardinality with
    maximum matching if the greedy one is not maximum, then improve the
    weight with TwoThirdApprox.  Returns (src, dst).

    Out of scope (documented): the reference's natural-ordering
    fallback compares against the DIAGONAL of a square matrix (its
    sparse-direct pivoting context); a general bipartite edge table has
    no diagonal, so no fallback is attempted.
    """
    a = transform_weight(g, apply_log=optimize_prod)
    a = replace(a, edges=a.edges.localCheckpoint(eager=True))
    mate = weighted_greedy_matching(spark, a)
    n_rows = a.edges.select(SRC).distinct().count()
    n_cols = a.edges.select(DST).distinct().count()
    if mate.count() < min(n_rows, n_cols):
        from .matching import maximum_bipartite_matching

        mate = maximum_bipartite_matching(spark, a)
    return two_third_approx(spark, a, mate, max_iter=max_iter)
