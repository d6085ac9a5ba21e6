"""k-truss decomposition by fixed-round edge peeling.

The k-truss is the maximal subgraph where every edge closes at least
k−2 triangles — the edge-analogue of the k-core (algos/kcore.py) and,
like triangle counting, a direct consumer of the masked-SpGEMM pattern
(A·A ∘ A, SpParMat Square/EWiseMult): each peel round recomputes edge
support as the per-edge triangle count of the SURVIVING subgraph and
drops edges below k−2.

Scale shape: every round reuses the degree-oriented wedge pipeline of
algos/triangles.py (shuffle-hash pinned, O(m^1.5) wedge stream only
ever streamed, never sorted), then one explode+groupBy to credit each
triangle to its three edges and one semi-join to peel — so a round
costs one triangle count of the current subgraph, and the subgraph
only shrinks.  ``rounds`` is FIXED (not run to fixpoint) so the DuckDB
oracle can unroll the identical peel sequence; past the fixpoint extra
rounds are idempotent, exactly like the kcore gate's unroll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph
from .triangles import triangle_wedges


def ktruss_rounds(
    spark: SparkSession,
    g: Graph,
    k: int,
    rounds: int,
) -> DataFrame:
    """Canonical surviving edges (u < v) after exactly ``rounds`` peel
    iterations toward the k-truss."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    edges = (
        g.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias("u"), F.greatest(SRC, DST).alias("v")
        )
        .distinct()
    )
    for _ in range(rounds):
        edges = edges.localCheckpoint(eager=True)
        gg = Graph(
            edges=edges.select(
                F.col("u").alias(SRC), F.col("v").alias(DST), F.lit(1.0).alias("w")
            ),
            n_partitions=g.n_partitions,
        )
        t = triangle_wedges(spark, gg)
        tri_edges = t.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                    ),
                    F.struct(
                        F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                    ),
                    F.struct(
                        F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
                    ),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        support = (
            tri_edges.groupBy("u", "v")
            .agg(F.count("*").alias("_sup"))
            .filter(F.col("_sup") >= k - 2)
        )
        edges = edges.join(support, ["u", "v"], "left_semi")
    return edges
