"""Minimum-degree fill-reducing ordering (Applications/Ordering/MD.cpp).

Exact (non-approximate) minimum degree in the George/Liu reachable-set
formulation, matching the reference semantics step for step:

* the *current* degree of an uneliminated vertex v is the number of
  uneliminated vertices reachable from v along paths whose internal
  vertices are all already eliminated (MD.cpp:148-169 ``getReach``);
* each step eliminates the minimum-degree vertex (ties: lowest id,
  MD.cpp:311 ``MinElement``), then recomputes degrees for exactly the
  vertices in the eliminated vertex's reach set via one *batched*
  multi-source BFS (MD.cpp:185-253 ``getReachesSPMM`` — the reference's
  SpGEMM fringe is our (root, v) pair-frontier DataFrame);
* eliminated vertices get degree n (MD.cpp:329 "set degree to
  infinite") so they are never selected again.

The outer elimination loop is serial *by the algorithm's nature* — the
reference runs the identical ``for i < nrow`` driver loop
(MD.cpp:308-344); each iteration here is a handful of distributed
joins with localCheckpoint lineage cuts, so the per-step state (degree
vector, enode flags, pair frontiers) stays partitioned across the
cluster and only the selected vertex id is ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def _reach(
    edges: DataFrame, source: int, enodes: DataFrame, spark: SparkSession
) -> DataFrame:
    """Vertices reachable from ``source`` via eliminated-vertex paths,
    excluding eliminated vertices and the source itself (getReach,
    MD.cpp:148-169).  Returns a (v) DataFrame."""
    frontier = spark.createDataFrame([(int(source),)], "v long")
    visited = frontier
    while True:
        nxt = (
            edges.join(frontier.withColumnRenamed("v", SRC), SRC)
            .select(F.col(DST).alias("v"))
            .distinct()
            .join(visited, "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.join(enodes, "v")  # traversal continues through enodes only
        if frontier.isEmpty():
            break
    return (
        visited.join(enodes, "v", "left_anti")
        .filter(F.col("v") != source)
    )


def _reach_degrees(
    edges: DataFrame, roots: DataFrame, enodes: DataFrame
) -> DataFrame:
    """Batched reach-set sizes for every vertex in ``roots`` — ONE
    multi-source BFS with a (root, v) pair frontier (getReachesSPMM,
    MD.cpp:185-253; the n×k SpGEMM fringe becomes the pair DataFrame).
    Returns (v, new_deg)."""
    frontier = roots.select(F.col("v").alias("root"), "v").localCheckpoint(eager=True)
    visited = frontier
    while True:
        nxt = (
            edges.join(frontier.withColumnRenamed("v", SRC), SRC)
            .select("root", F.col(DST).alias("v"))
            .distinct()
            .join(visited, ["root", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.join(enodes, "v")
        if frontier.isEmpty():
            break
    return (
        visited.join(enodes, "v", "left_anti")  # count visited non-enodes
        .groupBy("root")
        .agg((F.count("*") - 1).alias("new_deg"))  # -1: the root itself
        .select(F.col("root").alias("v"), "new_deg")
    )


def md_ordering(
    spark: SparkSession, g: Graph, max_steps: int | None = None
) -> DataFrame:
    """Minimum-degree permutation: (v, new_id) with ``new_id`` the
    elimination position (0-based) — the Spark form of MD.cpp's
    ``mdOrder``.  ``max_steps`` truncates the elimination for tests;
    remaining vertices then keep their selection order by (deg, v) at
    the point of truncation (deterministic).

    Apply with ``operators.indexing.subsref`` to reorder the matrix;
    tests gate fill quality against a pure-Python oracle of the same
    algorithm and against the natural ordering.
    """
    und = g.symmetrize().remove_loops()
    edges = und.edges.select(SRC, DST).distinct().localCheckpoint(eager=True)
    vert = (
        und.out_degrees()
        .select("v", F.col("deg").cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = vert.count()
    steps = n if max_steps is None else min(max_steps, n)

    enodes = spark.createDataFrame([], "v long")  # eliminated vertex ids
    order: list[tuple[int, int]] = []
    for i in range(steps):
        s = int(
            vert.orderBy(F.col("deg").asc(), F.col("v").asc()).limit(1).collect()[0]["v"]
        )
        order.append((s, i))
        enodes = enodes.unionByName(
            spark.createDataFrame([(s,)], "v long")
        ).localCheckpoint(eager=True)

        reach = _reach(edges, s, enodes, spark).localCheckpoint(eager=True)
        upd = _reach_degrees(edges, reach, enodes)
        vert = (
            vert.filter(F.col("v") != s)  # eliminated: degree "infinite"
            .join(upd, "v", "left")
            .select("v", F.coalesce("new_deg", "deg").alias("deg"))
            .localCheckpoint(eager=True)
        )

    perm = spark.createDataFrame(order, "v long, new_id long")
    if steps < n:
        rest = (
            vert.orderBy(F.col("deg").asc(), F.col("v").asc())
            .select("v")
            .limit(n - steps)
            .collect()
        )
        perm = perm.unionByName(
            spark.createDataFrame(
                [(int(r["v"]), steps + j) for j, r in enumerate(rest)],
                "v long, new_id long",
            )
        )
    return perm
