"""Minimum spanning forest via Borůvka rounds.

The classic semiring formulation (min-plus Select2nd over the
component-contracted graph) and the natural companion of the FastSV
CC kernel (algos/components.py): per round every component selects its
minimum outgoing edge under the total order (w, u, v) — the full
tie-break makes weights effectively distinct, so the selected edge set
is cycle-free except for mutual (2-cycle) selections, which the hook
step breaks by rooting the smaller component id.  Components then
contract by pointer jumping the hook forest to its roots, exactly the
shortcut step of Awerbuch–Shiloach.  Rounds at least halve the
component count, so a connected n-vertex graph finishes in ⌈log₂ n⌉
rounds; a round past convergence selects nothing and changes nothing
(the unroll is convergence-safe, like the kcore/ktruss gates).

Scale shape per round: two label attaches on the edge stream (the
component map is the O(n) build side — broadcast under the SpMSpV
bytes cutoff, co-partitioned beyond), one min-reduce per component
(map-side combined), and O(log depth) pointer-jump joins over the
O(#components) parent table — the edge stream is never sorted and
never grows; cross edges only shrink as components merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def boruvka_mst(
    spark: SparkSession,
    g: Graph,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """(u, v, w) edges of the minimum spanning forest of the
    symmetrized weighted pattern (canonical u < v; parallel edges keep
    the minimum weight).  Runs Borůvka rounds until no component has an
    outgoing edge (true forest on exit); ``max_rounds`` is a safety
    valve — ⌈log₂ n⌉ suffices.  ``stats`` (optional dict) receives
    {"rounds": int, "jumps": [per-round pointer-jump counts]} — the
    numbers that size the oracle unroll depth."""
    e = (
        g.edges.filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias("u"),
            F.greatest(SRC, DST).alias("v"),
            F.col("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .repartition(g.n_partitions, "u")
        .cache()
    )
    e.count()

    from ..operators.spmv import broadcast_nnz_cutoff

    comp = (
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .distinct()
        .select(F.col("x").alias("vtx"), F.col("x").alias("c"))
        .localCheckpoint(eager=True)
    )
    n = comp.count()
    cutoff = broadcast_nnz_cutoff(spark)

    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n < cutoff else df

    if stats is not None:
        stats["rounds"] = 0
        stats["jumps"] = []
    slices: list[DataFrame] = []
    for _ in range(max_rounds):
        cu = comp.select(F.col("vtx").alias("u"), F.col("c").alias("cu"))
        cv = comp.select(F.col("vtx").alias("v"), F.col("c").alias("cv"))
        cross = (
            e.join(_maybe_b(cu), "u")
            .join(_maybe_b(cv), "v")
            .filter(F.col("cu") != F.col("cv"))
        )
        # min outgoing edge per component under the total order (w,u,v)
        cand = cross.select(
            F.col("cu").alias("c"), F.col("cv").alias("oc"), "w", "u", "v"
        ).unionByName(
            cross.select(
                F.col("cv").alias("c"), F.col("cu").alias("oc"), "w", "u", "v"
            )
        )
        sel = (
            cand.groupBy("c")
            .agg(F.min(F.struct("w", "u", "v", "oc")).alias("m"))
            .select(
                "c",
                F.col("m.oc").alias("oc"),
                F.col("m.w").alias("w"),
                F.col("m.u").alias("u"),
                F.col("m.v").alias("v"),
            )
            .localCheckpoint(eager=True)
        )
        if sel.limit(1).count() == 0:
            break
        if stats is not None:
            stats["rounds"] += 1
            stats["jumps"].append(0)
        slices.append(sel.select("u", "v", "w").distinct())

        # hook: parent(c) = oc, breaking mutual pairs at the smaller id
        q = sel.select(F.col("c").alias("oc"), F.col("oc").alias("qoc"))
        par = (
            sel.join(_maybe_b(q), "oc", "left")
            .select(
                "c",
                F.when(
                    (F.col("qoc") == F.col("c")) & (F.col("c") < F.col("oc")),
                    F.col("c"),
                )
                .otherwise(F.col("oc"))
                .alias("p"),
            )
        )
        parent = (
            comp.select(F.col("c").alias("c")).distinct()
            .join(_maybe_b(par), "c", "left")
            .select("c", F.coalesce("p", F.col("c")).alias("p"))
            .localCheckpoint(eager=True)
        )
        # pointer jump the hook forest to its roots
        while True:
            nxt = (
                parent.alias("x")
                .join(
                    _maybe_b(parent.alias("y")),
                    F.col("x.p") == F.col("y.c"),
                    "inner",
                )
                .select(F.col("x.c").alias("c"), F.col("y.p").alias("p"))
                .localCheckpoint(eager=True)
            )
            changed = (
                nxt.alias("a")
                .join(parent.alias("b"), F.col("a.c") == F.col("b.c"))
                .filter(F.col("a.p") != F.col("b.p"))
                .limit(1)
                .count()
            )
            parent = nxt
            if stats is not None:
                stats["jumps"][-1] += 1
            if changed == 0:
                break
        comp = (
            comp.join(
                _maybe_b(parent.withColumnRenamed("c", "_c")),
                comp["c"] == F.col("_c"),
                "inner",
            )
            .select("vtx", F.col("p").alias("c"))
            .localCheckpoint(eager=True)
        )

    out = spark.createDataFrame([], "u long, v long, w double")
    for s in slices:
        out = out.unionByName(s)
    return out.distinct()
