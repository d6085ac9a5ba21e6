"""Web-graph bowtie decomposition (Broder et al., "Graph structure in
the web", WWW 2000): classify every vertex of a DIRECTED link graph by
its reachability relation to a root inside the giant strongly connected
component —

  CORE  reachable from the root AND co-reachable to it (the SCC),
  IN    co-reachable only (upstream: pages that link into the core),
  OUT   reachable only (downstream: pages the core links to),
  OTHER neither (tendrils + disconnected mass).

CombBLAS expresses both sweeps as BooleanSpMV frontier expansion over A
and Aᵀ (the same kernel as TopDownBFS.cpp:437-444 without the parent
payload); the bowtie is the canonical first analysis a web-crawl link
graph gets, so it belongs next to PageRank/CC in the engine surface.

Spark shape: each sweep is the bfs.py superstep minus the parent
aggregate — frontier ⋈ edges (hash-partitioned on src), anti-join the
visited set, localCheckpoint to cut lineage; the transpose sweep reuses
the SAME cached edge table with the join key flipped, so the graph is
scanned once.  Frontiers broadcast under the SpMSpV bytes cutoff
(ParFriends.h:2429-2922) exactly like BFS/MIS.  At 10^12 documents both
sweeps are O(diameter) supersteps over an O(m/P)-per-partition join —
no step materializes anything bigger than the reachable set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC


def reachable_set(
    spark: SparkSession,
    edges: DataFrame,
    root: int,
    reverse: bool = False,
    max_iter: int = 10_000,
) -> DataFrame:
    """(v) reachable from ``root`` along edge direction (or against it
    when ``reverse``).  ``edges`` must already be cached/partitioned by
    the caller — both bowtie sweeps share one cached table."""
    from ..operators.spmv import broadcast_nnz_cutoff

    src, dst = (DST, SRC) if reverse else (SRC, DST)
    cutoff = broadcast_nnz_cutoff(spark)

    visited = spark.createDataFrame([(root,)], schema="v long")
    frontier = visited
    frontier_size = 1
    it = 0
    while frontier_size > 0 and it < max_iter:
        it += 1
        fr = F.broadcast(frontier) if frontier_size < cutoff else frontier
        new = (
            edges.join(fr, edges[src] == fr["v"], "inner")
            .select(F.col(dst).alias("v"))
            .distinct()
            .join(visited, "v", "left_anti")
        )
        new = new.localCheckpoint(eager=True)
        frontier_size = new.count()
        if frontier_size == 0:
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return visited


def bowtie_decompose(
    spark: SparkSession,
    edges: DataFrame,
    root: int,
    n_partitions: int = 32,
    max_iter: int = 10_000,
) -> DataFrame:
    """(v, region) over every endpoint of ``edges``, region in
    CORE / IN / OUT / OTHER relative to ``root`` (see module doc).

    The root must sit in the component of interest (callers pick the
    max-out-degree vertex — a giant-SCC member with overwhelming
    probability on a crawl graph, and deterministic).

    Both sweeps run FUSED in one loop — the frontier carries a
    direction tag, each superstep advances forward and backward rows
    in a single union job, so the loop runs max(fwd_depth, bwd_depth)
    driver actions instead of their sum.  Per-iteration driver cost is
    the scaling bottleneck this engine measures (BASELINE.md, north
    rule), so halving the round count matters more than the per-round
    work it adds."""
    from ..operators.spmv import broadcast_nnz_cutoff

    e = (
        edges.select(SRC, DST)
        .distinct()
        .repartition(n_partitions, SRC)
        .cache()
    )
    e.count()
    cutoff = broadcast_nnz_cutoff(spark)

    # d = 0: forward sweep (root →), d = 1: backward sweep (→ root)
    visited = spark.createDataFrame(
        [(root, 0), (root, 1)], schema="v long, d int"
    )
    frontier, frontier_size, it = visited, 2, 0
    while frontier_size > 0 and it < max_iter:
        it += 1
        def _side(d: int) -> DataFrame:
            s = frontier.filter(F.col("d") == d).select("v")
            return F.broadcast(s) if frontier_size < cutoff else s

        ff, bf = _side(0), _side(1)
        fnew = e.join(ff, e[SRC] == ff["v"], "inner").select(
            F.col(DST).alias("v"), F.lit(0).alias("d")
        )
        bnew = e.join(bf, e[DST] == bf["v"], "inner").select(
            F.col(SRC).alias("v"), F.lit(1).alias("d")
        )
        new = (
            fnew.unionByName(bnew)
            .distinct()
            .join(visited, ["v", "d"], "left_anti")
            .localCheckpoint(eager=True)
        )
        frontier_size = new.count()
        if frontier_size == 0:
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new

    fwd = visited.filter(F.col("d") == 0).select("v")
    bwd = visited.filter(F.col("d") == 1).select("v")

    verts = (
        e.select(F.col(SRC).alias("v"))
        .unionByName(e.select(F.col(DST).alias("v")))
        .distinct()
    )
    out = (
        verts.join(fwd.withColumn("f", F.lit(True)), "v", "left")
        .join(bwd.withColumn("b", F.lit(True)), "v", "left")
        .select(
            "v",
            F.when(F.col("f") & F.col("b"), "CORE")
            .when(F.col("b"), "IN")
            .when(F.col("f"), "OUT")
            .otherwise("OTHER")
            .alias("region"),
        )
    )
    e.unpersist()
    return out
