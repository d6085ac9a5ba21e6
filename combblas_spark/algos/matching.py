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
    allow_partial: bool = False,
) -> DataFrame:
    """Greedy maximal matching of the bipartite pattern (rows = src
    side, columns = dst side).  Returns (src, dst) pairs — each src and
    each dst appears at most once, and no edge has both endpoints
    unmatched (maximality).

    Deterministic: min-id proposal/acceptance on both sides (the
    reference's Select2ndMin semiring with index payloads).

    The maximality guarantee is load-bearing (maximum matching seeds
    from it): if ``max_iter`` rounds exhaust with unmatched edges left,
    this RAISES rather than silently returning a partial matching —
    unless ``allow_partial=True``, the explicit fixed-round mode used
    by the driver's deliberately-truncated ``matching3`` gate.
    """
    edges = g.edges.select(SRC, DST).distinct().repartition(g.n_partitions, SRC).cache()
    edges.count()

    # remaining = edges whose BOTH endpoints are still unmatched
    remaining = edges.localCheckpoint(eager=True)
    matched_slices: list[DataFrame] = []
    exhausted = True

    for _ in range(max_iter):
        if remaining.isEmpty():
            exhausted = False
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

    if exhausted and not allow_partial and not remaining.isEmpty():
        raise RuntimeError(
            f"maximal_bipartite_matching: {max_iter} rounds exhausted with "
            "unmatched edges remaining — result would not be maximal "
            "(pass allow_partial=True for the fixed-round mode)"
        )
    out = spark.createDataFrame([], "src long, dst long")
    for m in matched_slices:
        out = out.unionByName(m)
    return out


def maximum_bipartite_matching(
    spark: SparkSession,
    g: Graph,
    max_phases: int = 10_000,
) -> DataFrame:
    """Maximum-cardinality bipartite matching (src side vs dst side).

    Reference: Applications/BipartiteMatchings/BPMaximumMatching.h:231-420
    (``maximumMatching`` — the MS-BFS algorithm of Azad & Buluç): start
    from a greedy maximal matching, then repeat *phases*; each phase
    runs one multi-source BFS from ALL unmatched columns at once
    through alternating (non-matching, matching) edges, records one
    unmatched-row *leaf* per BFS root (an augmenting path endpoint),
    and augments every discovered path simultaneously — the BFS forest
    is vertex-disjoint (each row acquires one parent per phase,
    BPMaximumMatching.h:322-331), so the level-synchronous pointer
    flipping of ``AugmentLevel`` (:129-158) is safe.  Phases stop when
    a BFS finds no augmenting path, which by Berge's theorem certifies
    maximum cardinality.

    DataFrame mapping: the SpMV with Select2ndMin ↦ edges ⋈ fringe →
    groupBy(row).min((col, root)); parent/leaf vectors ↦ accumulated
    (row, parent_col, root) / (root, leaf_row) tables; augmentation ↦
    per-level joins against the phase's parent table and the pre-phase
    mate table, applied as one rebuild (drop old pairs touching any
    flipped row/col, union the flips).
    """
    edges = g.edges.select(SRC, DST).distinct().repartition(g.n_partitions, SRC).cache()
    edges.count()
    all_cols = edges.select(DST).distinct().cache()

    # greedy init (the reference's default init path)
    mate = maximal_bipartite_matching(spark, g).localCheckpoint(eager=True)

    for _phase in range(max_phases):
        unmatched_c = all_cols.join(mate.select(DST), DST, "left_anti")
        fringe_c = unmatched_c.select(F.col(DST).alias("c"), F.col(DST).alias("root"))
        parents = spark.createDataFrame([], "r long, pc long, root long")
        leaves = spark.createDataFrame([], "root long, leaf long")

        while not fringe_c.isEmpty():
            # Select2ndMin SpMV: row r adopts the min (c, root) fringe col
            cand = (
                edges.join(
                    fringe_c, edges[DST] == fringe_c["c"], "inner"
                )
                .groupBy(F.col(SRC).alias("r"))
                .agg(F.min(F.struct(F.col("c").alias("pc"), F.col("root"))).alias("m"))
                .select("r", F.col("m.pc").alias("pc"), F.col("m.root").alias("root"))
            )
            new_rows = cand.join(parents.select("r"), "r", "left_anti").localCheckpoint(
                eager=True
            )
            if new_rows.isEmpty():
                break
            parents = parents.unionByName(new_rows).localCheckpoint(eager=True)
            # unmatched rows reached ⇒ augmenting-path leaves (min row per root)
            um = new_rows.join(
                mate.select(F.col(SRC).alias("r")), "r", "left_anti"
            )
            new_leaves = (
                um.groupBy("root")
                .agg(F.min("r").alias("leaf"))
                .join(leaves.select("root"), "root", "left_anti")
            )
            leaves = leaves.unionByName(new_leaves).localCheckpoint(eager=True)
            # matched rows continue the alternating BFS through their mates;
            # prune trees whose root already found a leaf (reference's
            # FilterByVal prune, BPMaximumMatching.h:374-377)
            cont = (
                new_rows.join(leaves.select("root"), "root", "left_anti")
                .join(mate.select(F.col(SRC).alias("r"), DST), "r", "inner")
            )
            fringe_c = (
                cont.groupBy(F.col(DST).alias("c"))
                .agg(F.min("root").alias("root"))
                .localCheckpoint(eager=True)
            )

        if leaves.isEmpty():
            break

        # AugmentLevel: walk each path leaf→root flipping mate pointers
        flips = spark.createDataFrame([], f"{SRC} long, {DST} long")
        cur = leaves.select("root", F.col("leaf").alias("r"))
        while not cur.isEmpty():
            step = cur.join(parents, "r", "inner").select(
                "r", "pc", cur["root"].alias("root")
            )
            flips = flips.unionByName(
                step.select(F.col("r").alias(SRC), F.col("pc").alias(DST))
            )
            # continue from the column's PRE-PHASE mate (paths are
            # vertex-disjoint, so reading the old table is exact)
            cur = (
                step.join(mate, step["pc"] == mate[DST], "inner")
                .select(step["root"].alias("root"), mate[SRC].alias("r"))
                .localCheckpoint(eager=True)
            )
        flips = flips.localCheckpoint(eager=True)
        mate = (
            mate.join(flips.select(SRC), SRC, "left_anti")
            .join(flips.select(DST), DST, "left_anti")
            .select(SRC, DST)
            .unionByName(flips)
            .localCheckpoint(eager=True)
        )

    return mate


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
