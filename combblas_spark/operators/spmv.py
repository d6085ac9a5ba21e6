"""Semiring matrix-vector and matrix-matrix products (§2.2).

``y = Aᵀ ⊗ x`` over a semiring is the engine's core join:

    edges(src,dst,w) ⋈ x(v,val) ON src==v
      → contribution = SR.mult(w, val)           (per edge)
      → groupBy(dst).agg(SR.add(contribution))   (per destination)

The reference implements this as SUMMA/allgather-alltoall pipelines
(SpMV dense: ParFriends.h:2966-3045; SpMSpV 4-phase:
ParFriends.h:2429-2922).  In Spark the physical strategy is chosen by
size: a small frontier is broadcast (the SpMSpV path — reference
switches sparse/dense at ``nnz*50 < n``, CC.h:1256); a dense vector
rides a co-partitioned shuffle join.  Map-side partial aggregation is
Spark's built-in equivalent of MergeContributions
(ParFriends.h:2598-2670).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.semiring import Semiring, PLUS_TIMES
from ..graph import SRC, DST, W, Graph

#: estimated serialized bytes per (long, double) vector row inside a
#: broadcast hash relation (key + value + open-hash overhead)
VECTOR_ROW_BYTES = 24

#: default broadcast budget for the SpMSpV vector side.  256 MB is the
#: conservative cluster-grade choice: well inside a typical executor
#: heap AND inside Spark's own 8 GB broadcast-table hard cap, with room
#: for the per-iteration rebuild in iterative kernels.  Override with
#: ``spark.combblas.broadcast.maxBytes`` per deployment.
DEFAULT_BROADCAST_MAX_BYTES = 256 << 20


def broadcast_nnz_cutoff(spark=None) -> int:
    """Bytes-estimated broadcast cutoff (in vector entries).

    The reference's SpMSpV/dense switch is a row-count heuristic
    (CC.h:1256); a fixed row cutoff is memory-blind — the same count
    can be 100 MB or 10 GB depending on value width — so the cutoff
    here derives from a byte budget: ``maxBytes / VECTOR_ROW_BYTES``.
    Config-driven (``spark.combblas.broadcast.maxBytes``) so operators
    on real clusters tune it to executor memory, not to this sandbox.
    Below the cutoff the zero-shuffle superstep applies (edges
    partitioned by dst, broadcast vector, exchange-free groupBy —
    measured 3-4x per-iteration speedup); above it the co-partitioned
    shuffle join moves only the vector side (measured at the boundary
    by scripts/bench_scaling.py --shuffle-path).
    """
    max_bytes = DEFAULT_BROADCAST_MAX_BYTES
    if spark is not None:
        try:
            max_bytes = int(
                spark.conf.get(
                    "spark.combblas.broadcast.maxBytes",
                    str(DEFAULT_BROADCAST_MAX_BYTES),
                )
            )
        except Exception:
            pass
    return max_bytes // VECTOR_ROW_BYTES


#: module-level default (≈11M entries ≈ 256 MB) for call sites without
#: a session handle
BROADCAST_NNZ_CUTOFF = DEFAULT_BROADCAST_MAX_BYTES // VECTOR_ROW_BYTES


def vec_join_side(
    df: DataFrame, n: int, spark=None, cutoff: int | None = None
) -> DataFrame:
    """The O(n) vector side of an iterative superstep join, strategy
    pinned: broadcast while it fits the byte budget, else shuffled-hash
    with the vector as the O(n/P) build — otherwise Catalyst silently
    degrades the superstep to sort-merge and SORTS the O(m) edge stream
    every iteration.  The single policy point for every iterative
    kernel (components, labelprop, …); pass a precomputed ``cutoff``
    inside loops to skip the per-call conf read.
    """
    if cutoff is None:
        cutoff = broadcast_nnz_cutoff(spark)
    return F.broadcast(df) if n < cutoff else df.hint("shuffle_hash")


def spmv(
    g: Graph,
    vec: DataFrame,
    semiring: Semiring = PLUS_TIMES,
    val_col: str = "val",
    broadcast_vector: bool | None = None,
    vec_nnz: int | None = None,
    auto_salt: bool = False,
    skew_stats: tuple[int, int] | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """y(v, val) = Aᵀ ⊗ x : propagate values from src along edges to dst.

    ``vec`` is (v, val).  Result contains only destinations reached by at
    least one edge from a vector entry (sparse output, like SpMSpV).

    broadcast_vector: force the SpMSpV broadcast path; default auto
    (broadcast when ``vec_nnz`` is known-small).

    auto_salt: route through :func:`spmv_salted` when the in-degree
    stats say the reduce is hub-skewed (see :func:`should_salt`) AND
    the semiring's add cannot partially aggregate.  Both conditions
    are load-bearing: for partial-capable adds (sum/min/max — every
    shipped semiring) map-side combine already collapses a hot key to
    ~one row per map partition, and the measured salted path is a pure
    regression there (BENCH_SKEW.json: 0.48-1.06x across runs, never a
    win); only gather-style adds (``Semiring.partial_agg=False``) ship
    per-edge rows to the reduce side and need the salt.  Pass
    precomputed ``skew_stats=(max_in_degree, m)`` for iterative kernels
    (degrees are static — compute once via :func:`in_degree_skew`);
    without it the stats cost one extra aggregate pass here.
    """
    if auto_salt and _route_salted(
        semiring, skew_stats if skew_stats is not None else in_degree_skew(g),
        n_partitions or g.n_partitions,
    ):
        return spmv_salted(g, vec, semiring=semiring, val_col=val_col)
    if broadcast_vector is None:
        broadcast_vector = vec_nnz is not None and vec_nnz < BROADCAST_NNZ_CUTOFF
    # beyond broadcast reach: shuffled-hash join of the vector side
    # (no per-iteration sort of the big edge table, no AQE broadcast
    # conversion re-adding the driver-side build)
    x = F.broadcast(vec) if broadcast_vector else vec.hint("shuffle_hash")
    contrib = semiring.contribution(F.col(W), F.col(val_col))
    return (
        g.edges.join(x, g.edges[SRC] == x["v"], "inner")
        .groupBy(F.col(DST).alias("v"))
        .agg(semiring.aggregate(contrib).alias(val_col))
    )


def _route_salted(
    semiring: Semiring, skew_stats: tuple[int, int], n_partitions: int
) -> bool:
    """The auto_salt routing decision, factored pure for testability:
    salt only a hub-skewed reduce whose add CANNOT partially aggregate
    (partial-capable adds are skew-immune — measured, BENCH_SKEW.json)."""
    return not semiring.partial_agg and should_salt(
        skew_stats[0], skew_stats[1], n_partitions
    )


def in_degree_skew(g: Graph) -> tuple[int, int]:
    """(max_in_degree, num_edges) — one aggregate pass over the edges.

    The SpMV reduce key is ``dst``, so the heaviest reduce key holds
    ``max_in_degree`` of the ``m`` contribution rows.  Compute once per
    graph (degrees are static across iterative kernels) and feed
    :func:`should_salt` / ``spmv(auto_salt=True, skew_stats=...)``.
    """
    row = (
        g.edges.groupBy(DST)
        .agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("mx"), F.sum("d").alias("m"))
        .collect()[0]
    )
    return int(row["mx"]), int(row["m"])


def should_salt(
    max_in_degree: int,
    num_edges: int,
    n_partitions: int,
    factor: float = 4.0,
) -> bool:
    """Salt when the hottest reduce key exceeds ``factor`` × the mean
    per-partition share (``m / n_partitions``).

    Rationale: groupBy(dst) hash-partitions reduce keys, so one dst's
    rows land in ONE partition; a hub holding ≫ m/P rows makes that
    partition the straggler no matter how many executors exist (the
    situation the reference's adaptive ReduceAssign, CC.h:579-737,
    detects via per-process recv counts).  Below the threshold the
    extra salted aggregation level only adds a second shuffle.
    """
    if n_partitions <= 1 or num_edges == 0:
        return False
    return max_in_degree > factor * (num_edges / n_partitions)


def spmv_salted(
    g: Graph,
    vec: DataFrame,
    semiring: Semiring = PLUS_TIMES,
    val_col: str = "val",
    n_salts: int = 8,
) -> DataFrame:
    """Skew-hardened SpMV: two-level aggregation with salted keys.

    Power-law hubs make groupBy(dst) skewed.  Salting splits each hot
    destination into ``n_salts`` shards aggregated independently, then
    re-aggregates — the reference's adaptive-reduce ReduceAssign
    (CC.h:579-737) in declarative form.  Requires ``semiring.add`` to be
    associative (all shipped ones are).

    Measured nuance (BENCH_SKEW.json, hub share 24% at local[32]):
    for the shipped ALGEBRAIC semirings Spark's map-side partial
    aggregation already combines a hot dst's rows within each map
    partition — only ~n_partitions rows per hot key ever shuffle — so
    this operator's extra exchange made it 0.76x the plain path there.
    It earns its keep when the add cannot partially aggregate (e.g.
    collect_list-style gather semirings) — for the algebraic ones,
    prefer the plain path; the real skew hazard is the JOIN side, see
    :func:`spmv_salted_join`.
    """
    contrib = semiring.contribution(F.col(W), F.col(val_col))
    salted = (
        g.edges.join(vec, g.edges[SRC] == vec["v"], "inner")
        .withColumn("_salt", F.pmod(F.hash(SRC), F.lit(n_salts)))
        .groupBy(F.col(DST).alias("v"), F.col("_salt"))
        .agg(semiring.aggregate(contrib).alias(val_col))
    )
    return salted.groupBy("v").agg(
        semiring.aggregate(F.col(val_col)).alias(val_col)
    )


def spmv_salted_join(
    g: Graph,
    vec: DataFrame,
    semiring: Semiring = PLUS_TIMES,
    val_col: str = "val",
    n_salts: int = 8,
) -> DataFrame:
    """Skew-hardened SpMV for a hub SOURCE beyond broadcast reach.

    The vulnerable regime (measured, BENCH_SKEW.json): the vector is
    too big to broadcast, so the superstep is a co-partitioned join on
    ``hash(src)`` — and a hub src puts its entire edge block in ONE
    partition, a straggler no repartitioning can split because the hash
    key is the skewed value itself.  (The broadcast path is immune —
    edges stay partitioned by dst; and agg-side skew is neutralized by
    map-side combine, see :func:`spmv_salted`.)

    Fix = the classic salted join, kept co-partitionable: edges gain a
    deterministic salt from ``xxhash64(dst)`` so a hub src's rows spread
    over ``n_salts`` join shards, and the vector side is replicated
    ``n_salts`` ways (vector ≪ edges, so the duplication is the cheap
    side — same asymmetry the broadcast path exploits).  Join on
    ``(src, salt)``, then the usual groupBy(dst) aggregate.

    On an iterative kernel DO NOT pay the edge re-exchange per call:
    pre-salt once with :func:`salt_edges` (partition by (src, _salt),
    cache) and pass the salted graph here — a ``_salt`` column already
    present is reused as-is.  BENCH_SKEW.json records the point: the
    salted layout bounds the largest cached partition near m/P even
    with a hub src (the plain hash(src) layout concentrates the hub's
    entire block — at corpus scale, a whole-executor-memory partition).
    """
    e = g.edges
    if "_salt" in e.columns:
        # Pre-salted layout: the vector MUST be replicated with the salt
        # count the edges were written with, not this call's default — a
        # mismatch means edge rows with _salt >= n_salts find no vector
        # partner and are silently dropped.  salt_edges records it.
        if g.salt_count is not None:
            n_salts = g.salt_count
        else:
            raise ValueError(
                "graph has a pre-salted _salt column but no salt_count; "
                "build it with salt_edges() so the replication factor is "
                "recorded (a mismatched n_salts silently drops edges)"
            )
    else:
        e = e.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(DST)), F.lit(n_salts)).cast("int")
        )
    x = vec.select(
        "v",
        F.col(val_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt"),
    ).hint("shuffle_hash")
    contrib = semiring.contribution(F.col(W), x[val_col])
    return (
        e.join(x, (e[SRC] == x["v"]) & (e["_salt"] == x["_salt"]), "inner")
        .groupBy(F.col(DST).alias("v"))
        .agg(semiring.aggregate(contrib).alias(val_col))
    )


def salt_edges(g: Graph, n_salts: int = 8) -> Graph:
    """One-time salted edge layout for :func:`spmv_salted_join`.

    Adds ``_salt = xxhash64(dst) % n_salts`` and partitions by
    ``(src, _salt)`` — a hub src's block spreads over ``n_salts``
    partitions instead of one.  Cache the result; every superstep then
    joins co-partitioned with the replicated vector, no edge exchange.
    """
    from dataclasses import replace

    salted = g.edges.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(DST)), F.lit(n_salts)).cast("int")
    ).repartition(g.n_partitions, SRC, "_salt")
    return replace(g, edges=salted, salt_count=n_salts)


def dim_apply(
    g: Graph,
    vec: DataFrame,
    dim: str = "src",
    op=None,
    val_col: str = "scale",
) -> Graph:
    """Scale every edge by a per-row (dim='src') or per-column
    (dim='dst') vector element — DimApply (SpParMat.cpp:801-887), the
    stochastic normalization of MCL (MCL.cpp:391-393) and the
    1/outdegree scaling of PageRank."""
    from dataclasses import replace

    if op is None:
        op = lambda w, s: w * s
    key = SRC if dim == "src" else DST
    scaled = (
        g.edges.join(vec, g.edges[key] == vec["v"], "inner")
        .select(SRC, DST, op(F.col(W), F.col(val_col)).alias(W))
    )
    return replace(g, edges=scaled)
