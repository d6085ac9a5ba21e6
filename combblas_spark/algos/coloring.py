"""Distance-1 greedy graph coloring (speculative, rank-offset).

The coloring companion of Luby MIS (algos/mis.py, FilteredMIS.cpp
semantics): the same seeded random priorities drive a
speculate-then-resolve loop (Gebremedhin–Manne style) instead of the
Jones–Plassmann DAG order — JP's round count is the longest
decreasing-priority path, which on dense neighborhoods degenerates to
O(Δ) sequential supersteps (measured 140 s / dozens of rounds on the
sf0.01 link graph); the speculative loop runs in a handful.

Per round, every still-uncolored vertex v picks the (r+1)-th smallest
color absent from its already-colored neighborhood, where
r = |{uncolored neighbors with higher (pri, id)}| — the rank offset.
Inside a clique of uncolored vertices the ranks are distinct, so the
candidates are distinct and the whole clique colors in ONE round (the
failure mode that serializes JP).  Adjacent vertices with EQUAL
candidates conflict; the higher-(pri, id) endpoint keeps the color,
the loser retries next round.  The max-priority uncolored vertex wins
every conflict it is in, so each round makes progress; in practice the
loop converges in 3–6 rounds.  Palette bound: candidate ≤ r + |used| ≤
deg(v), so at most Δ+1 colors, same as sequential greedy.

Everything is deterministic for a fixed seed (priorities are the same
two-round XXH64 chain as the MIS gate, pinned in the driver's
mis_priorities fixture), which is what lets the DuckDB oracle unroll
the identical round sequence.

Scale shape per round: two edge-stream joins against broadcast-or-
co-partitioned vertex state (the SpMSpV bytes switch), one
O(deg)-bounded candidate explode, one conflict self-check on the
active edge set — no collect, no UDF, no per-vertex iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def greedy_coloring(
    spark: SparkSession,
    g: Graph,
    seed: int = 42,
    max_iter: int = 64,
    offset_cap: int | None = None,
) -> DataFrame:
    """(v, color) distance-1 coloring of the symmetrized pattern;
    colors are 0-based, adjacent vertices always differ, palette ≤
    max-degree + 1.  RAISES if ``max_iter`` rounds leave vertices
    uncolored rather than returning a partial coloring (the
    adjacent-differ invariant is load-bearing for downstream users).

    ``offset_cap`` caps the rank offset: the candidate is the
    (min(r, cap)+1)-th free color.  cap=0 is pure mex speculation —
    the tightest palette, at the cost of one retry round per layer of
    same-candidate adjacency (a d-clique serializes into d rounds);
    cap=None keeps the full rank, coloring any clique in one round at
    the cost of palette width on hub-heavy graphs.  Triangle-free
    graphs (like the bipartite link graph) want cap=0; clique-heavy
    ones want a positive cap."""
    e = g.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))).distinct()
    edges = e.repartition(g.n_partitions, SRC).cache()
    edges.count()

    from ..operators.spmv import broadcast_nnz_cutoff

    active = (
        edges.select(F.col(SRC).alias("v")).distinct()
        # same two-round XXH64 chain as the MIS gate — pinned in the
        # driver's mis_priorities oracle fixture
        .withColumn("pri", F.xxhash64(F.col("v"), F.lit(seed).cast("long")))
        .localCheckpoint(eager=True)
    )
    n_act = active.count()
    cutoff = broadcast_nnz_cutoff(spark)
    colored = spark.createDataFrame([], "v long, color int").localCheckpoint(
        eager=True
    )

    rounds = 0
    while n_act > 0 and rounds < max_iter:
        rounds += 1

        def _maybe_b(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if n_act < cutoff else df

        # rank r(v) = # active neighbors with higher (pri, id)
        # (skipped entirely for cap=0 — pure mex needs no rank join)
        act_src = active.select(F.col("v").alias(SRC), F.col("pri").alias("_spri"))
        act_dst = active.select(F.col("v").alias(DST), F.col("pri").alias("_dpri"))
        if offset_cap == 0:
            rnk = active.select("v", F.lit(0).alias("r"))
        else:
            rnk = (
                edges.join(_maybe_b(act_src), SRC, "inner")
                .join(_maybe_b(act_dst), DST, "inner")
                .filter(
                    (F.col("_spri") > F.col("_dpri"))
                    | ((F.col("_spri") == F.col("_dpri")) & (F.col(SRC) > F.col(DST)))
                )
                .groupBy(F.col(DST).alias("v"))
                .agg(F.count("*").alias("r"))
            )
        # colors already used in v's neighborhood
        used = (
            edges.join(_maybe_b(colored.withColumnRenamed("v", SRC)), SRC, "inner")
            .join(_maybe_b(active.select(F.col("v").alias(DST))), DST, "left_semi")
            .select(F.col(DST).alias("v"), "color")
            .distinct()
        )
        ucnt = used.groupBy("v").agg(F.count("*").alias("u"))
        # candidate(v) = (r+1)-th smallest color not in used(v); the
        # search space 0..r+u is tight (u used values can displace at
        # most u candidates), so the explode is O(deg) per vertex
        r_raw = F.coalesce("r", F.lit(0))
        r_eff = r_raw if offset_cap is None else F.least(r_raw, F.lit(offset_cap))
        base = (
            active.select("v", "pri")
            .join(rnk, "v", "left")
            .join(ucnt, "v", "left")
            .select(
                "v",
                "pri",
                r_eff.alias("r"),
                F.coalesce("u", F.lit(0)).alias("u"),
            )
        )
        gen = base.select(
            "v",
            "pri",
            "r",
            F.explode(F.sequence(F.lit(0), (F.col("r") + F.col("u")).cast("int"))).alias("c"),
        )
        cand = (
            gen.join(used.select("v", F.col("color").alias("c")), ["v", "c"], "left_anti")
            .withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy("v").orderBy("c")),
            )
            .filter(F.col("_rn") == F.col("r") + 1)
            .select("v", "pri", F.col("c").alias("cand"))
            .localCheckpoint(eager=True)
        )
        # conflict: adjacent actives with equal candidate; the lower
        # (pri, id) endpoint loses and retries next round
        c_src = cand.select(
            F.col("v").alias(SRC), F.col("pri").alias("_spri"), F.col("cand").alias("_scand")
        )
        c_dst = cand.select(
            F.col("v").alias(DST), F.col("pri").alias("_dpri"), F.col("cand").alias("_dcand")
        )
        losers = (
            edges.join(_maybe_b(c_src), SRC, "inner")
            .join(_maybe_b(c_dst), DST, "inner")
            .filter(
                (F.col("_scand") == F.col("_dcand"))
                & (
                    (F.col("_spri") > F.col("_dpri"))
                    | ((F.col("_spri") == F.col("_dpri")) & (F.col(SRC) > F.col(DST)))
                )
            )
            .select(F.col(DST).alias("v"))
            .distinct()
        )
        winners = cand.join(losers, "v", "left_anti").select(
            "v", F.col("cand").cast("int").alias("color")
        )
        colored = colored.unionByName(winners).localCheckpoint(eager=True)
        active = active.join(winners.select("v"), "v", "left_anti").localCheckpoint(
            eager=True
        )
        n_act = active.count()

    if n_act > 0:
        raise RuntimeError(
            f"coloring did not converge within max_iter={max_iter} rounds "
            f"({n_act} vertices still uncolored)"
        )
    return colored
