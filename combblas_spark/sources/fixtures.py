"""Deterministic in-repo graph fixtures (FIXTURES.md §2).

``SEVEN``: transcription of the reference's 7-vertex weighted digraph
test input (/root/reference/ReleaseTests/sevenvertexgraph.txt — string
labels vertex_1..vertex_7, tab-separated; exercises the label→id
dictionary path of ReadGeneralizedTuples, SpParMat.cpp:3886).

``NINE``: transcription of /root/reference/ReleaseTests/small_nonsym.mtx
(9×9 pattern matrix, 19 nonzeros, 1-indexed Matrix Market).

Both are data transcriptions of tiny public test inputs, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..graph import Graph

# (src_label, dst_label, weight) — labels resolved via the string→id path
SEVEN_LABELED = [
    ("vertex_1", "vertex_2", 0.34),
    ("vertex_1", "vertex_4", 1.50),
    ("vertex_2", "vertex_5", 0.67),
    ("vertex_2", "vertex_7", 1.41),
    ("vertex_3", "vertex_6", 2.15),
    ("vertex_4", "vertex_1", 0.55),
    ("vertex_4", "vertex_3", 0.87),
    ("vertex_5", "vertex_6", 1.75),
    ("vertex_6", "vertex_3", 1.40),
    ("vertex_7", "vertex_3", 0.75),
    ("vertex_7", "vertex_4", 0.25),
    ("vertex_7", "vertex_5", 1.00),
]

# 0-indexed integer form (vertex_k -> k-1)
SEVEN = [
    (int(s.split("_")[1]) - 1, int(d.split("_")[1]) - 1, w)
    for s, d, w in SEVEN_LABELED
]

# small_nonsym.mtx is 1-indexed; store 0-indexed pattern edges
NINE = [
    (i - 1, j - 1, 1.0)
    for i, j in [
        (1, 2), (2, 1), (2, 3), (3, 2), (2, 4), (4, 2), (3, 4), (4, 3),
        (4, 5), (5, 4), (7, 9), (9, 7), (8, 9), (9, 8), (2, 5), (2, 6),
        (2, 7), (2, 8), (2, 9),
    ]
]

# 2×K5 cliques (0-4, 5-9) + isolated vertex 10 (via self-loop carrier)
TWO_CLIQUES = (
    [(i, j, 1.0) for i in range(5) for j in range(5) if i != j]
    + [(i, j, 1.0) for i in range(5, 10) for j in range(5, 10) if i != j]
    + [(10, 10, 1.0)]  # isolate carried as a self-loop; removed by remove_loops
)


def chain(n: int) -> list[tuple[int, int, float]]:
    """Path graph 0-1-2-…-(n-1): worst-case pointer jumping for CC."""
    return [(i, i + 1, 1.0) for i in range(n - 1)]


def star_hub(n_leaves: int) -> list[tuple[int, int, float]]:
    """1 hub (id 0) → n leaves: the skew/salting stress fixture."""
    return [(0, i, 1.0) for i in range(1, n_leaves + 1)]


def edges_df(spark: SparkSession, triples) -> DataFrame:
    return spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in triples],
        schema="src long, dst long, w double",
    )


def graph(spark: SparkSession, triples, n_partitions: int = 8, **kw) -> Graph:
    kw.setdefault("w", "w")  # keep fixture weights (min-plus/prune tests)
    return Graph.from_edge_list(
        edges_df(spark, triples), n_partitions=n_partitions, **kw
    )
