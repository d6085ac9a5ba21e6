"""Truncated Katz centrality as iterative weighted SpMV.

Katz centrality is the third classic algebraic-path kernel next to
PageRank and HITS: ``x = Σ_{k≥0} (α Aᵀ)^k β·1``, i.e. every walk into a
vertex votes with weight α^len.  Structurally it is the SAME PlusTimes
SpMV recursion CombBLAS runs for PageRank (SpParMat::SpMV, SpImpl.h;
algos/pagerank.py here) with the damping/normalization replaced by the
affine update

    x_{k} = β·1 + α · Aᵀ x_{k-1},   x_0 = β·1,

so after ``n_iter`` steps x = β Σ_{j=0..n_iter} (α Aᵀ)^j 1 — a fixed
truncation the DuckDB oracle can unroll exactly.

Scale shape is identical to the PageRank superstep: the edge table is
cached and hash-partitioned once, the vertex vector rides the
bytes-aware broadcast/co-partitioned switch, and the only wide exchange
per iteration is the partial+final groupBy aggregate.  Edge
multiplicity votes through ``w`` exactly like algos/wpagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph


def katz_fixed(
    spark: SparkSession,
    g: Graph,
    n_iter: int,
    alpha: float = 0.005,
    beta: float = 1.0,
) -> DataFrame:
    """(v, katz) after exactly ``n_iter`` affine SpMV updates.

    ``alpha`` should sit below 1/λ_max for the infinite series to
    converge; a fixed truncation is well-defined for any alpha, and the
    default keeps values O(10) on the hub-heavy link graphs the gates
    run on.
    """
    from ..operators.spmv import broadcast_nnz_cutoff, vec_join_side

    edges = g.edges.select(SRC, DST, W).repartition(g.n_partitions, SRC).cache()
    edges.count()
    verts = (
        edges.select(F.col(SRC).alias("v"))
        .unionByName(edges.select(F.col(DST).alias("v")))
        .distinct()
        .repartition(g.n_partitions, "v")
        .cache()
    )
    n = verts.count()
    _cut = broadcast_nnz_cutoff(spark)

    x = verts.select("v", F.lit(float(beta)).alias("x"))
    for _ in range(n_iter):
        contrib = (
            edges.join(
                vec_join_side(x, n, cutoff=_cut), edges[SRC] == x["v"], "inner"
            )
            .groupBy(F.col(DST).alias("v"))
            .agg(F.sum(F.col(W) * F.col("x")).alias("s"))
        )
        x = (
            verts.join(contrib, "v", "left")
            .select(
                "v",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return x.select("v", F.round("x", 6).alias("katz"))
