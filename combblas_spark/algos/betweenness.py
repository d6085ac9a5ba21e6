"""Batched Brandes betweenness centrality (unweighted).

Reference: Applications/BetwCent.cpp:126-220 — k source columns at
once; forward phase: ``fringe = PSpGEMM(AT, fringe)`` accumulating
shortest-path counts with ``EWiseMult(fringe, nsp, exclude=true)`` as
the not-yet-visited mask (:179-188); backward phase: dependency
accumulation via SpGEMM + EWiseMult (:195-215).

Spark formulation: the batch dimension is a ``s`` (source) column, so
one DataFrame holds all per-source BFS states — the analogue of the
reference's multi-column fringe matrix.  Forward: level-synchronous
join → groupBy(s, dst) → sum(sigma), anti-join visited.  Backward:
walk levels deepest-first joining (v→w) edges against the next level's
(sigma, delta).  bc(v) = Σ_s δ_s(v).

All-sources mode batches the source set DISTRIBUTEDLY — the vertex ids
are never collected to the driver (the reference bounds driver/memory
cost the same way, via ``SubsRefCol`` source-column batching,
BetwCent.cpp:126-155): a dense rank over the vertex table buckets the
sources into batches of ``batch_size``, each batch seeds its frontier
with a filter on the rank column, and the per-batch partial dependency
sums are summed at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def _brandes_batch(
    edges: DataFrame,
    frontier0: DataFrame,
    max_depth: int | None,
) -> DataFrame:
    """One Brandes source batch: forward sigma levels then backward
    delta accumulation.  ``frontier0`` is (s, v, depth=0, sigma=1.0);
    returns the per-(s, v) dependency table (s, v, depth, sigma, delta).
    """
    sp = frontier0.localCheckpoint(eager=True)
    frontier = sp
    depth = 0
    deepest = 0
    while max_depth is None or depth < max_depth:
        depth += 1
        nxt = (
            frontier.join(edges, frontier["v"] == edges[SRC], "inner")
            .groupBy("s", F.col(DST).alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(sp.select("s", "v"), ["s", "v"], "left_anti")
            .withColumn("depth", F.lit(depth))
            .select("s", "v", "depth", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        sp = sp.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        deepest = depth
    max_depth = deepest

    # backward: delta accumulates deepest-first
    deltas = sp.filter(F.col("depth") == max_depth).withColumn("delta", F.lit(0.0))
    acc = deltas
    for d in range(max_depth - 1, -1, -1):
        lvl = sp.filter(F.col("depth") == d)
        succ = acc.filter(F.col("depth") == d + 1).select(
            "s",
            F.col("v").alias("w"),
            F.col("sigma").alias("wsig"),
            F.col("delta").alias("wdelta"),
        )
        contrib = (
            lvl.join(edges, lvl["v"] == edges[SRC], "inner")
            .join(
                succ,
                (F.col(DST) == succ["w"]) & (lvl["s"] == succ["s"]),
                "inner",
            )
            .groupBy(lvl["s"].alias("s"), lvl["v"].alias("v"))
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("wsig")) * (F.lit(1.0) + F.col("wdelta"))
                ).alias("dsum")
            )
        )
        lvl_delta = (
            lvl.join(contrib, ["s", "v"], "left")
            .select(
                "s", "v", "depth", "sigma",
                F.coalesce(F.col("dsum"), F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        acc = acc.unionByName(lvl_delta).localCheckpoint(eager=True)
    return acc


def betweenness_centrality(
    spark: SparkSession,
    g: Graph,
    sources: list[int] | None = None,
    symmetrize: bool = True,
    normalize: bool = False,
    rescale_sampled: bool = False,
    max_depth: int | None = None,
    batch_size: int = 128,
) -> DataFrame:
    """(v, bc) betweenness from the given source batch (all-sources
    exact BC when ``sources`` is None; approximate-by-sampling when a
    subset is passed, the standard batched-Brandes trade).

    Convention: with a source subset the default output is the raw
    partial dependency sum over that batch (what the reference's
    batched BetwCent accumulates); ``rescale_sampled=True`` multiplies
    by n_vertices/len(sources) to estimate the full-source value.
    ``normalize`` always uses the VERTEX count n (undirected factor
    2/((n-1)(n-2)), directed 1/((n-1)(n-2))), never the sample size.

    ``max_depth`` caps the forward BFS at that many levels (k-hop
    betweenness) — the deterministic fixed-round mode the driver's SQL
    oracle unrolls; ``None`` (default) runs to frontier exhaustion.

    All-sources mode (``sources=None``) iterates source batches of
    ``batch_size`` derived from a distributed dense rank over the
    vertex table — no vertex-id collect on the driver (exact
    all-sources BC is O(nm) compute regardless; this bounds the
    *driver* at O(1) rows per batch boundary, BetwCent.cpp:126-155).
    """
    e = g.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if symmetrize:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    edges = e.distinct().repartition(g.n_partitions, SRC).cache()
    edges.count()

    all_vertices = edges.select(F.col(SRC).alias("v")).distinct()
    n_vertices = all_vertices.count()

    def _acc_bc(dep: DataFrame) -> DataFrame:
        return dep.filter(F.col("depth") > 0).select("v", "delta")

    if sources is not None:
        frontier0 = (
            spark.createDataFrame(
                [(int(s), int(s), 0, 1.0) for s in sources],
                "s long, v long, depth int, sigma double",
            ).repartition(g.n_partitions, "v")
        )
        partials = [_acc_bc(_brandes_batch(edges, frontier0, max_depth))]
        n_sources = len(sources)
    else:
        from ..operators.indexing import _dense_rank_by

        ranked = _dense_rank_by(
            all_vertices, ["v"], "_rank", keep_cols=["v"]
        ).localCheckpoint(eager=True)
        partials = []
        lo = 0
        while lo < n_vertices:
            batch = (
                ranked.filter(
                    (F.col("_rank") >= lo) & (F.col("_rank") < lo + batch_size)
                )
                .select(
                    F.col("v").alias("s"),
                    "v",
                    F.lit(0).alias("depth"),
                    F.lit(1.0).alias("sigma"),
                )
                .repartition(g.n_partitions, "v")
            )
            dep = _brandes_batch(edges, batch, max_depth)
            # fold the batch's partials down to one (v, delta-sum) slice so
            # the cross-batch union stays O(n) rows per batch
            partials.append(
                _acc_bc(dep)
                .groupBy("v")
                .agg(F.sum("delta").alias("delta"))
                .localCheckpoint(eager=True)
            )
            lo += batch_size
        n_sources = n_vertices

    acc = partials[0]
    for p in partials[1:]:
        acc = acc.unionByName(p)
    bc = acc.groupBy("v").agg(F.sum("delta").alias("bc"))
    if symmetrize:
        # undirected convention: each path counted twice (there and back)
        bc = bc.select("v", (F.col("bc") / 2.0).alias("bc"))
    if rescale_sampled and n_sources < n_vertices:
        # sampled-source estimate: rescale to the full-source expectation
        bc = bc.select("v", (F.col("bc") * (n_vertices / n_sources)).alias("bc"))
    if normalize and n_vertices > 2:
        # normalization is over the VERTEX count, not the sample size;
        # undirected (already-halved) values use the standard factor
        # 2/((n-1)(n-2)), directed 1/((n-1)(n-2))
        n = n_vertices
        factor = (2.0 if symmetrize else 1.0) / ((n - 1) * (n - 2))
        bc = bc.select("v", (F.col("bc") * factor).alias("bc"))
    return bc
