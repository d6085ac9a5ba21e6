"""k-core decomposition by iterative peeling.

The standard link-graph noise filter: vertices outside the k-core are
low-connectivity fringe (crawl artifacts, orphan pages); the core is
where ranking/community structure lives.  CombBLAS has no k-core
application binary, but the kernel is its Reduce → Prune → induced
subgraph loop (operators/reduce.py Reduce, operators/indexing.py
InducedSubgraphs — SpParMat.cpp:263-305) iterated to fixpoint.

Scale shape: each peel round is ONE degree aggregation over the current
edge set (map-side combined groupBy) plus a semi-join of the edges
against the surviving vertex set (broadcast when the vector fits,
co-partitioned shuffled-hash otherwise — the same bytes-aware switch as
every other vertex-vector join).  The edge set shrinks monotonically,
so round cost is non-increasing; peel depth is bounded by the degeneracy
ordering, not the vertex count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def kcore(
    spark: SparkSession,
    g: Graph,
    k: int,
    max_iter: int = 64,
) -> DataFrame:
    """(v, deg) — the k-core of the symmetrized simple graph: the
    maximal subgraph where every vertex has degree ≥ ``k``; ``deg`` is
    the within-core degree at fixpoint.  Empty result if no core.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from ..operators.spmv import broadcast_nnz_cutoff, vec_join_side

    edges = (
        g.symmetrize()
        .remove_loops()
        .edges.select(SRC, DST)
        .distinct()
        .repartition(g.n_partitions, SRC)
        .localCheckpoint(eager=True)
    )
    _cut = broadcast_nnz_cutoff(spark)
    prev = None
    keep = None
    for _ in range(max_iter):
        deg = edges.groupBy(F.col(SRC).alias("v")).agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).localCheckpoint(eager=True)
        cnt = keep.count()
        if cnt == 0:
            return keep
        if cnt == prev:  # no vertex dropped → edge set unchanged → fixpoint
            break
        prev = cnt
        kv = vec_join_side(keep.select("v"), cnt, cutoff=_cut)
        edges = (
            edges.join(kv.withColumnRenamed("v", SRC), SRC)
            .join(kv.withColumnRenamed("v", DST), DST)
            .select(SRC, DST)
            .repartition(g.n_partitions, SRC)
            .localCheckpoint(eager=True)
        )
    return keep
