"""BFS (top-down) as frontier SpMV over the SelectMax semiring.

Reference: Applications/TopDownBFS.cpp:437-444 —
  fringe = SpMV(A, fringe)  (SelectMaxSRing parent selection, :136)
  fringe = EWiseMult(fringe, parents, exclude=true)   # drop visited
  parents.Set(fringe)

Spark per level: frontier ⋈ edges → groupBy(dst).max(parent-candidate)
→ anti-join visited → union into parents.  The frontier is small most
levels → broadcast join (the SpMSpV path, ParFriends.h:2429-2922); the
direction-optimizing switch (DirOptBFS.cpp:364-365) maps to letting the
optimizer flip to a shuffle join when the frontier is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph
from ..operators.spmv import BROADCAST_NNZ_CUTOFF


def bfs(
    spark: SparkSession,
    g: Graph,
    source: int,
    symmetrize: bool = True,
    max_iter: int = 10_000,
) -> DataFrame:
    """(v, parent, level) for vertices reachable from ``source``.

    parent of the source is itself (Graph500 convention); parent choice
    is the max eligible predecessor (SelectMaxSRing) so results are
    deterministic.
    """
    e = g.edges.select(SRC, DST)
    if symmetrize:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        e = e.distinct()
    edges = e.repartition(g.n_partitions, SRC).cache()
    edges.count()

    parents = spark.createDataFrame(
        [(source, source, 0)], schema="v long, parent long, level int"
    )
    frontier = parents.select("v")
    frontier_size = 1

    level = 0
    while frontier_size > 0 and level < max_iter:
        level += 1
        fr = F.broadcast(frontier) if frontier_size < BROADCAST_NNZ_CUTOFF else frontier
        # SelectMax SpMV: candidate parent = max frontier vertex per dst
        cand = (
            edges.join(fr, edges[SRC] == fr["v"], "inner")
            .groupBy(F.col(DST).alias("v"))
            .agg(F.max(SRC).alias("parent"))
        )
        # EWiseMult(..., exclude=true): drop already-visited
        new = cand.join(parents.select("v"), "v", "left_anti").withColumn(
            "level", F.lit(level)
        )
        new = new.localCheckpoint(eager=True)
        frontier_size = new.count()
        if frontier_size == 0:
            break
        parents = parents.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("v")
    return parents
