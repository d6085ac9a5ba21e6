"""Single-source shortest paths as iterative MinPlus-semiring SpMV.

Reference semantics: MinPlusSRing (include/CombBLAS/Semirings.h:235-256,
saturating inf_plus at :40-47) — per round (Bellman-Ford superstep):

    dist' = min(dist, min over incoming edges (dist[src] + w))

Spark: one co-partitioned join + groupBy(dst).min per round, then an
element-wise min merge (vec EWiseApply).  Converges in at most
diameter rounds; ``n_rounds`` fixed for the oracle-gate variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.semiring import MIN_PLUS
from ..graph import Graph
from ..operators.spmv import spmv


def sssp_rounds(
    spark: SparkSession,
    g: Graph,
    source: int,
    n_rounds: int,
) -> DataFrame:
    """(v, dist) after exactly ``n_rounds`` Bellman-Ford supersteps.

    Only reached vertices appear (sparse frontier semantics, matching
    FullyDistSpVec); unreached = +inf = absent.
    """
    edges = g.edges.repartition(g.n_partitions, "src").cache()
    dist = spark.createDataFrame([(source, 0.0)], "v long, val double")
    for _ in range(n_rounds):
        relaxed = spmv(Graph(edges, g.n_partitions), dist, MIN_PLUS)
        dist = (
            dist.withColumnRenamed("val", "d0")
            .join(relaxed.withColumnRenamed("val", "d1"), "v", "full")
            .select(
                "v",
                F.least(
                    F.coalesce("d0", F.lit(float("inf"))),
                    F.coalesce("d1", F.lit(float("inf"))),
                ).alias("val"),
            )
            .localCheckpoint(eager=True)
        )
    return dist.select("v", F.col("val").alias("dist"))


def sssp(
    spark: SparkSession,
    g: Graph,
    source: int,
    max_rounds: int = 10_000,
) -> DataFrame:
    """Run to fixpoint (no distance change) — full Bellman-Ford."""
    edges = g.edges.repartition(g.n_partitions, "src").cache()
    dist = spark.createDataFrame([(source, 0.0)], "v long, val double")
    for _ in range(max_rounds):
        relaxed = spmv(Graph(edges, g.n_partitions), dist, MIN_PLUS)
        new = (
            dist.withColumnRenamed("val", "d0")
            .join(relaxed.withColumnRenamed("val", "d1"), "v", "full")
            .select(
                "v",
                F.least(
                    F.coalesce("d0", F.lit(float("inf"))),
                    F.coalesce("d1", F.lit(float("inf"))),
                ).alias("val"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(dist.withColumnRenamed("val", "old"), "v", "left")
            .filter(
                F.col("old").isNull() | (F.col("val") < F.col("old"))
            )
            .count()
        )
        dist = new
        if changed == 0:
            break
    return dist.select("v", F.col("val").alias("dist"))
