"""Reductions (SURVEY.md §2.4): per-dimension reduce, masked reduce,
k-select, MCL prune/select/recover, metrics probes.

Reference: SpParMat::Reduce (SpParMat.cpp:888-1119), MaskedReduce
(:1849-2027), Kselect (:309-1412), MCLPruneRecoverySelect
(ParFriends.h:200-368), Bandwidth/Profile (SpParMat.h:139-140),
LoadImbalance (SpParMat.h:99), HistCC (CC.h:1576-1617).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph


def reduce_dim(g: Graph, dim: str = "src", agg: Column | None = None) -> DataFrame:
    """Reduce(Row|Column, binop): (v, val).  dim='src' reduces each row
    (out-direction), dim='dst' each column (in-direction).  ``agg``
    defaults to sum of weights."""
    key = SRC if dim == "src" else DST
    if agg is None:
        agg = F.sum(W)
    return g.edges.groupBy(F.col(key).alias("v")).agg(agg.alias("val"))


def masked_reduce(
    g: Graph, mask: DataFrame, dim: str = "dst", agg: Column | None = None,
    exclude: bool = False,
) -> DataFrame:
    """MaskedReduce (SpParMat.cpp:1849-2027): reduce along ``dim`` with
    the mask restricting which entries FEED the reduction — the mask
    indexes the *non-reduced* dimension (the reference masks row indices
    while reducing columns).  ``exclude=True`` flips to the complement
    (the reference's useExtendedBinOp exclusion path)."""
    key = DST if dim == "dst" else SRC
    other = SRC if dim == "dst" else DST
    how = "left_anti" if exclude else "left_semi"
    masked = g.edges.join(mask.select(F.col("v").alias(other)), other, how)
    return reduce_dim(replace(g, edges=masked), dim=dim, agg=agg)


def kselect(g: Graph, k: int, dim: str = "dst") -> DataFrame:
    """Per-column (or row) k-th largest value: (v, kth).

    Kselect (SpParMat.cpp:309-1412) — window top-k, the MCL pruning
    primitive.  Ties broken deterministically by the other index.
    """
    key, other = (DST, SRC) if dim == "dst" else (SRC, DST)
    win = Window.partitionBy(key).orderBy(F.col(W).desc(), F.col(other).asc())
    return (
        g.edges.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == k)
        .select(F.col(key).alias("v"), F.col(W).alias("kth"))
    )


def topk_per_column(g: Graph, k: int, dim: str = "dst") -> Graph:
    """Keep only each column's top-k entries (MCL select step)."""
    key, other = (DST, SRC) if dim == "dst" else (SRC, DST)
    win = Window.partitionBy(key).orderBy(F.col(W).desc(), F.col(other).asc())
    kept = (
        g.edges.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return replace(g, edges=kept)


def mcl_prune_recovery_select(
    g: Graph,
    hard_threshold: float,
    select_k: int,
    recover_num: int,
    recover_pct: float,
) -> Graph:
    """MCLPruneRecoverySelect (ParFriends.h:200-368): hard-threshold
    prune + per-column top-k select, then 'recovery': columns left with
    fewer than ``recover_num`` entries get entries back down to their
    ``recover_pct`` quantile.

    ``recover_num <= 0`` disables recovery explicitly (the deterministic
    oracle-gate mode, mcl_fixed): the weak-column percentile subplan is
    skipped entirely rather than running a vacuous aggregation every
    iteration."""
    win = Window.partitionBy(DST).orderBy(F.col(W).desc(), F.col(SRC).asc())
    ranked = g.edges.withColumn("_rn", F.row_number().over(win))
    kept = ranked.filter((F.col(W) >= hard_threshold) & (F.col("_rn") <= select_k))
    if recover_num <= 0:
        return replace(g, edges=kept.select(SRC, DST, W))
    # columns that fell below recover_num after pruning — including
    # columns pruned to EMPTY (they have no kept rows at all, so the
    # weak set must come from the ORIGINAL column set minus the strong
    # ones, not from a groupBy of the kept rows)
    strong = (
        kept.groupBy(DST).agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= recover_num)
        .select(DST)
    )
    weak = g.edges.select(DST).distinct().join(strong, DST, "left_anti")
    # per-column recover_pct quantile of the ORIGINAL values
    thresh = (
        g.edges.join(weak, DST, "left_semi")
        .groupBy(DST)
        .agg(F.expr(f"percentile(w, {1.0 - recover_pct})").alias("_q"))
    )
    recovered = (
        ranked.join(thresh, DST, "inner")
        .filter((F.col(W) >= F.col("_q")) & (F.col("_rn") <= recover_num))
        .select(SRC, DST, W)
    )
    out = (
        kept.select(SRC, DST, W)
        .join(weak, DST, "left_anti")
        .unionByName(recovered)
    )
    return replace(g, edges=out)


def vec_reduce(vec: DataFrame, agg: Column | None = None, val_col: str = "val"):
    """Global fold of a vector → scalar (FullyDistVec.h:266-270)."""
    if agg is None:
        agg = F.sum(val_col)
    return vec.agg(agg.alias("_r")).collect()[0]["_r"]


def min_element(vec: DataFrame, val_col: str = "val"):
    """Global argmin (FullyDistVec.h:263): returns Row(v, val)."""
    return vec.orderBy(F.col(val_col).asc(), F.col("v").asc()).limit(1).collect()[0]


def vec_uniq(vec: DataFrame, val_col: str = "val") -> DataFrame:
    """Uniq: deduplicate values keeping min index
    (FullyDistSpVec.h:196-202)."""
    return (
        vec.groupBy(val_col)
        .agg(F.min("v").alias("v"))
        .select("v", val_col)
    )


def bandwidth(g: Graph) -> int:
    """Matrix bandwidth: max |i - j| over nonzeros (SpParMat.h:139)."""
    row = g.edges.agg(F.max(F.abs(F.col(SRC) - F.col(DST))).alias("b")).collect()[0]
    return int(row["b"] or 0)


def profile(g: Graph, n_cols: int | None = None) -> int:
    """Matrix profile (SpParMat::Profile, SpParMat.cpp:1786-1860):
    Σ over columns j of (j − first upper-diagonal row in column j);
    columns with no upper-diagonal entry count 1 (the reference's
    empty-column convention).  One aggregate job."""
    if n_cols is None:
        mx = g.edges.agg(
            F.greatest(F.max(SRC), F.max(DST)).alias("m")
        ).collect()[0]["m"]
        n_cols = int(mx or -1) + 1
    row = (
        g.edges.filter(F.col(SRC) <= F.col(DST))
        .groupBy(DST)
        .agg(F.min(SRC).alias("_first"))
        .agg(
            F.coalesce(F.sum(F.col(DST) - F.col("_first")), F.lit(0)).alias("s"),
            F.count("*").alias("c"),
        )
        .collect()[0]
    )
    return int(row["s"]) + (n_cols - int(row["c"]))


def bandwidth_profile(g: Graph) -> tuple[int, int]:
    """Bandwidth + Profile fused into ONE aggregate job (one
    groupBy(dst) pass + one scalar collect) — the metrics probe
    shouldn't cost three sequential driver actions."""
    per_col = g.edges.groupBy(DST).agg(
        F.min(F.when(F.col(SRC) <= F.col(DST), F.col(SRC))).alias("_first"),
        F.max(F.abs(F.col(SRC) - F.col(DST))).alias("_bw"),
        F.max(F.greatest(F.col(SRC), F.col(DST))).alias("_mx"),
    )
    row = per_col.agg(
        F.coalesce(F.max("_bw"), F.lit(0)).alias("bw"),
        F.coalesce(
            F.sum(F.col(DST) - F.col("_first")), F.lit(0)
        ).alias("s"),
        F.count("_first").alias("c"),  # columns WITH an upper-diag entry
        F.max(F.greatest("_mx", F.col(DST))).alias("mx"),
    ).collect()[0]
    n_cols = int(row["mx"] or -1) + 1
    return int(row["bw"]), int(row["s"]) + (n_cols - int(row["c"]))


def load_imbalance(g: Graph) -> float:
    """max/avg partition nnz ratio (SpParMat.h:99) — a metrics probe for
    the partitioning strategy.  The average is over ALL partitions of
    the layout (empty partitions count — they are idle executors), not
    just the non-empty ones a groupBy(partition_id) would see."""
    n_parts = g.edges.rdd.getNumPartitions()
    counts = (
        g.edges.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
        .collect()[0]
    )
    if not counts["tot"] or n_parts == 0:
        return 1.0
    return float(counts["mx"]) / (float(counts["tot"]) / n_parts)


def histogram(labels: DataFrame, key: str = "comp") -> DataFrame:
    """Value-count histogram (HistCC): (size, n)."""
    return (
        labels.groupBy(key)
        .count()
        .groupBy(F.col("count").alias("size"))
        .agg(F.count("*").alias("n"))
        .orderBy("size")
    )


def reciprocity_assortativity(edges: DataFrame) -> DataFrame:
    """One-row (reciprocity, assortativity) shape metrics of a digraph.

    Reciprocity = fraction of distinct directed edges whose reverse is
    also present; degree assortativity = Pearson correlation between
    outdeg(src) and indeg(dst) sampled per edge (Newman's directed
    out-in variant).  Companions to bandwidth/profile in the metrics
    probe family — a web link graph's reciprocity (~0.3 for the real
    web) and disassortativity are the standard sanity checks after
    crawl ingest.

    One wide pass: two O(n)-build degree attaches (shuffled-hash, the
    edge stream is never sorted), one self-join on the edge key for the
    reverse marker, then a single fused scalar aggregate.  Pearson is
    spelled out as the moment formula (avg(xy)−avg(x)avg(y)) / σxσy
    with a zero-variance NULL guard — Spark's corr() raises
    DIVIDE_BY_ZERO under ANSI mode on degenerate inputs, and the
    explicit form is the same algebra the DuckDB oracle runs, so the
    two sides agree bit-for-bit at the 6-decimal gate.
    """
    e = edges.select(SRC, DST).distinct().cache()
    od = e.groupBy(F.col(SRC).alias("v")).agg(F.count("*").alias("od"))
    idg = e.groupBy(F.col(DST).alias("v")).agg(F.count("*").alias("idg"))
    rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)).withColumn(
        "_rev", F.lit(1)
    )
    x = F.col("od").cast("double")
    y = F.col("idg").cast("double")
    stats = (
        e.join(od.withColumnRenamed("v", SRC).hint("shuffle_hash"), SRC)
        .join(idg.withColumnRenamed("v", DST).hint("shuffle_hash"), DST)
        .join(rev, [SRC, DST], "left")
        .agg(
            F.avg(F.coalesce(F.col("_rev"), F.lit(0)).cast("double")).alias("_r"),
            F.avg(x).alias("_mx"),
            F.avg(y).alias("_my"),
            F.avg(x * y).alias("_mxy"),
            F.avg(x * x).alias("_mxx"),
            F.avg(y * y).alias("_myy"),
        )
    )
    vx = F.col("_mxx") - F.col("_mx") * F.col("_mx")
    vy = F.col("_myy") - F.col("_my") * F.col("_my")
    cov = F.col("_mxy") - F.col("_mx") * F.col("_my")
    return stats.select(
        F.round("_r", 6).alias("reciprocity"),
        F.round(
            F.when((vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy))),
            6,
        ).alias("assortativity"),
    )
