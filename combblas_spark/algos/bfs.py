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


def bfs_dir_opt(
    spark: SparkSession,
    g: Graph,
    source: int,
    symmetrize: bool = True,
    max_iter: int = 10_000,
) -> DataFrame:
    """Direction-optimizing BFS (DirOptBFS.cpp:364-440).

    Same (v, parent, level) result as ``bfs`` (parent = max eligible
    predecessor, so the two paths are cross-checkable — the reference's
    own consistency methodology, MultTest.cpp:146-200), but the
    physical per-level plan switches direction:

    * **top-down** — probe FROM the frontier: broadcast the (small)
      frontier into the edge scan; cost ∝ frontier out-edges.
    * **bottom-up** — probe INTO the unvisited side: edges are pruned
      by dst-not-yet-visited (anti-join) BEFORE meeting the frontier,
      and the (huge) frontier rides a shuffle join instead of a
      broadcast; cost ∝ unvisited in-edges.  On hub-heavy web graphs
      this is the difference between touching the frontier's entire
      fan-out and touching each undiscovered vertex once.

    Switch rule = the reference's cutoffs (DirOptBFS.cpp:363-365,
    388, 409): go bottom-up while scout_count (frontier out-edge sum)
    > m/20 and the frontier is growing; return top-down when
    fringe_size < n²/(12m) and shrinking.
    """
    e = g.edges.select(SRC, DST)
    if symmetrize:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        e = e.distinct()
    edges = e.repartition(g.n_partitions, SRC).cache()
    m = edges.count()
    deg = (
        edges.groupBy(F.col(SRC).alias("v"))
        .agg(F.count("*").alias("deg"))
        .repartition(g.n_partitions, "v")
        .cache()
    )
    n = deg.count()
    up_cutoff = m / 20.0
    down_cutoff = (float(n) * float(n)) / (float(m) * 12.0)

    parents = spark.createDataFrame(
        [(source, source, 0)], schema="v long, parent long, level int"
    )
    frontier = parents.select("v")
    frontier_size, last_size = 1, 0
    bottom_up = False

    level = 0
    while frontier_size > 0 and level < max_iter:
        level += 1
        if not bottom_up:
            scout = (
                frontier.join(deg, "v", "inner")
                .agg(F.coalesce(F.sum("deg"), F.lit(0)).alias("s"))
                .collect()[0]["s"]
            )
            if scout > up_cutoff and last_size < frontier_size:
                bottom_up = True
        elif frontier_size < down_cutoff and last_size > frontier_size:
            bottom_up = False

        if bottom_up:
            # prune edges to unvisited destinations FIRST, then a
            # shuffle join against the (large) frontier — no broadcast
            unvisited_edges = edges.join(
                parents.select(F.col("v").alias(DST)), DST, "left_anti"
            )
            fr = frontier.select(F.col("v").alias(SRC))
            new = (
                unvisited_edges.join(fr, SRC, "left_semi")
                .groupBy(F.col(DST).alias("v"))
                .agg(F.max(SRC).alias("parent"))
                .withColumn("level", F.lit(level))
            )
        else:
            fr = (
                F.broadcast(frontier)
                if frontier_size < BROADCAST_NNZ_CUTOFF
                else frontier
            )
            cand = (
                edges.join(fr, edges[SRC] == fr["v"], "inner")
                .groupBy(F.col(DST).alias("v"))
                .agg(F.max(SRC).alias("parent"))
            )
            new = cand.join(parents.select("v"), "v", "left_anti").withColumn(
                "level", F.lit(level)
            )
        new = new.localCheckpoint(eager=True)
        last_size = frontier_size
        frontier_size = new.count()
        if frontier_size == 0:
            break
        parents = parents.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("v")
    return parents


def random_parent_bfs(
    spark: SparkSession,
    g: Graph,
    source: int,
    seed: int = 42,
    symmetrize: bool = True,
    max_iter: int = 10_000,
) -> DataFrame:
    """BFS with RANDOM parent selection (Applications/RandomParentBFS.
    cpp:92-117, SelectRandSRing): every eligible (frontier, child) edge
    draws a priority and the child adopts the minimum-priority parent —
    versus ``bfs``'s deterministic max-id choice.

    The reference draws ``GlobalMT.rand()`` per multiply; here the
    priority is ``xxhash64(parent, child, level, seed)`` — the same
    "uniform random eligible parent" distribution but reproducible
    under a fixed seed (the reference's own DETERMINISTIC-build
    MTRand(1) trick, TopDownBFS.cpp:29).  Level sets are identical to
    ``bfs`` (parent choice never changes reachability), which is the
    cross-path consistency check the tests pin."""
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
        # SelectRandSRing: min random priority among eligible parents
        pri = F.xxhash64(
            F.col(SRC), F.col(DST), F.lit(level).cast("long"),
            F.lit(seed).cast("long"),
        )
        cand = (
            edges.join(fr, edges[SRC] == fr["v"], "inner")
            .withColumn("_pri", pri)
            .groupBy(F.col(DST).alias("v"))
            .agg(F.min_by(SRC, "_pri").alias("parent"))
        )
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


def single_child_bfs(
    spark: SparkSession,
    g: Graph,
    source: int,
    symmetrize: bool = True,
    max_iter: int = 10_000,
) -> DataFrame:
    """BFS that also tracks the SINGLE-CHILD frontier (Applications/
    SingleChildBFS.cpp:280-281): after each level's parent assignment,
    ``fringe.Uniq(RandReduce)`` keeps ONE representative child per
    parent — the thinned frontier a sampling traversal would expand.

    Parent selection matches ``bfs`` (max eligible predecessor); the
    representative per (parent, level) is the min child id (a
    deterministic stand-in for the reference's random reduce — same
    cardinality, reproducible).  Returns (v, parent, level,
    single_child) where exactly one row per (parent, level ≥ 1) has
    ``single_child`` true."""
    e = g.edges.select(SRC, DST)
    if symmetrize:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        e = e.distinct()
    edges = e.repartition(g.n_partitions, SRC).cache()
    edges.count()

    parents = spark.createDataFrame(
        [(source, source, 0, True)],
        schema="v long, parent long, level int, single_child boolean",
    )
    frontier = parents.select("v")
    frontier_size = 1

    level = 0
    while frontier_size > 0 and level < max_iter:
        level += 1
        fr = F.broadcast(frontier) if frontier_size < BROADCAST_NNZ_CUTOFF else frontier
        cand = (
            edges.join(fr, edges[SRC] == fr["v"], "inner")
            .groupBy(F.col(DST).alias("v"))
            .agg(F.max(SRC).alias("parent"))
        )
        new = cand.join(parents.select("v"), "v", "left_anti").withColumn(
            "level", F.lit(level)
        )
        # fringe.Uniq: one representative child per parent this level
        rep = new.groupBy("parent").agg(F.min("v").alias("_rep"))
        new = (
            new.join(rep, "parent")
            .withColumn("single_child", F.col("v") == F.col("_rep"))
            .select("v", "parent", "level", "single_child")
            .localCheckpoint(eager=True)
        )
        frontier_size = new.count()
        if frontier_size == 0:
            break
        parents = parents.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("v")
    return parents


def validate_bfs_tree(
    spark: SparkSession,
    g: Graph,
    tree: DataFrame,
    symmetrize: bool = True,
) -> DataFrame:
    """Graph500-style BFS tree validation as a 1-row summary.

    The reference validates every BFS run before counting it
    (Applications/TopDownBFS.cpp — spec checks: one self-parented root
    at level 0, every tree edge exists in the graph, every non-root's
    level is its parent's level + 1, no vertex appears twice).  Here
    each check is one distributed join/aggregate over the (v, parent,
    level) table; only the four counters reach the driver.

    Returns (n_roots, n_dup, bad_edges, bad_levels) — a valid tree is
    (1, 0, 0, 0).
    """
    e = g.edges.select(SRC, DST)
    if symmetrize:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    tree = tree.cache()
    n_roots = tree.filter(
        (F.col("v") == F.col("parent")) & (F.col("level") == 0)
    ).count()
    n_dup = tree.count() - tree.select("v").distinct().count()
    nonroot = tree.filter(F.col("v") != F.col("parent"))
    bad_edges = nonroot.join(
        e.select(F.col(SRC).alias("parent"), F.col(DST).alias("v")).hint(
            "shuffle_hash"
        ),
        ["parent", "v"],
        "left_anti",
    ).count()
    plevels = tree.select(
        F.col("v").alias("parent"), F.col("level").alias("_plevel")
    )
    bad_levels = (
        nonroot.join(plevels, "parent", "left")
        .filter(
            F.col("_plevel").isNull()
            | (F.col("level") != F.col("_plevel") + 1)
        )
        .count()
    )
    return spark.createDataFrame(
        [(n_roots, n_dup, bad_edges, bad_levels)],
        "n_roots long, n_dup long, bad_edges long, bad_levels long",
    )
