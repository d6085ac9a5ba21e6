"""Bipartite maximal matching and RCM ordering.

Maximal matching reference: Applications/BipartiteMatchings/
BPMaximalMatching.h:24-130 (``MaximalMatching``, GREEDY init) — the
round structure is two Select2ndMin SpMVs per iteration:

  1. every unmatched column "proposes" along its edges; each row keeps
     the min proposing column (``SpMV<Select2ndMinSR>(A, unmatchedCol,
     fringeRow)``, :104);
  2. proposals are de-duplicated row-side and committed; newly matched
     rows/columns leave the unmatched sets; repeat while anything new
     matched (:84).

Spark formulation: the Select2ndMin SpMV is a join + groupBy(min); a
round is two aggregations over the still-unmatched edge subset.  The
result is a valid maximal matching (no shared endpoints; no remaining
edge with both endpoints unmatched) — the same guarantee the
reference's ``isMaximalmatching`` checker asserts (Utility.h).

RCM reference: Applications/Ordering/RCM.cpp — reverse Cuthill-McKee:
BFS from a pseudo-peripheral vertex, order vertices by (level, degree,
id), reverse.  Here it composes the engine's own primitives: bfs() +
distributed sort + zipWithIndex (operators/indexing), returning the
permutation like RandPerm/sort() do; quality is asserted as reduced
matrix bandwidth in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def maximal_bipartite_matching(
    spark: SparkSession,
    g: Graph,
    max_iter: int = 256,
) -> DataFrame:
    """Greedy maximal matching of the bipartite pattern (rows = src
    side, columns = dst side).  Returns (src, dst) pairs — each src and
    each dst appears at most once, and no edge has both endpoints
    unmatched (maximality).

    Deterministic: min-id proposal/acceptance on both sides (the
    reference's Select2ndMin semiring with index payloads).
    """
    edges = g.edges.select(SRC, DST).distinct().repartition(g.n_partitions, SRC).cache()
    edges.count()

    # remaining = edges whose BOTH endpoints are still unmatched
    remaining = edges.localCheckpoint(eager=True)
    matched_slices: list[DataFrame] = []

    for _ in range(max_iter):
        if remaining.isEmpty():
            break
        # column proposes to min row; row accepts min proposing column —
        # two Select2ndMin reductions (BPMaximalMatching.h:104-118)
        prop = remaining.groupBy(DST).agg(F.min(SRC).alias(SRC))
        new_matches = prop.groupBy(SRC).agg(F.min(DST).alias(DST)).select(SRC, DST)
        new_matches = new_matches.localCheckpoint(eager=True)
        matched_slices.append(new_matches)
        remaining = (
            remaining.join(new_matches.select(SRC), SRC, "left_anti")
            .join(new_matches.select(DST), DST, "left_anti")
            .select(SRC, DST)
            .localCheckpoint(eager=True)
        )

    out = spark.createDataFrame([], "src long, dst long")
    for m in matched_slices:
        out = out.unionByName(m)
    return out


def rcm_ordering(spark: SparkSession, g: Graph, source: int | None = None) -> DataFrame:
    """Reverse Cuthill-McKee permutation (Applications/Ordering/RCM.cpp):
    (v, new_id) with new_id the RCM position.

    BFS levels from a pseudo-peripheral source (default: a minimum-
    degree vertex, the standard starting heuristic), vertices ordered
    by (level, degree, id), order reversed.  Unreached vertices keep
    positions after the reached ones (arbitrary but deterministic).
    Apply with ``operators.indexing.subsref`` to get the reordered
    matrix; tests assert the bandwidth drops.
    """
    from ..algos.bfs import bfs
    from ..operators.indexing import _dense_rank_by

    und = g.symmetrize()
    deg = und.out_degrees().cache()
    if source is None:
        row = deg.orderBy(F.col("deg").asc(), F.col("v").asc()).limit(1).collect()[0]
        source = int(row["v"])
    levels = bfs(spark, g, source=source).select("v", "level")
    keyed = (
        deg.join(levels, "v", "left")
        .select(
            "v",
            F.coalesce(F.col("level"), F.lit(1 << 30)).alias("_lvl"),
            "deg",
        )
    )
    cm = _dense_rank_by(keyed, ["_lvl", "deg", "v"], "cm")
    n = deg.count()
    return cm.select("v", (F.lit(n - 1) - F.col("cm")).alias("new_id"))
