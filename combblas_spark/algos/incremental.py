"""Batch-incremental MCL clustering (Applications/Incremental/).

Reference pipeline (Incremental-Toy-Pipeline.cpp:336-470, IncClust.h):
a stream of vertex batches arrives; after each batch the reference
assembles

    Minc = [[M11, M12],
            [M21, M22]]

where ``M11`` is the *summary* of the previous MCL run over the old
vertices (the mid-run MCL state captured at ``summaryIter`` /
``summaryThresholdNNZ``, IncClust.h:426-571 — a compressed proxy for
the old clustering), ``M22`` is the new-batch subgraph, and
``M12``/``M21`` are the cross edges.  ``IncrementalMCL``
(IncClust.h:610-900) then re-clusters Minc, yielding both the updated
assignment and the next summary — new vertices join existing clusters
or form new ones without re-running MCL over the full original graph.

Spark form: vertex ids are global, so the block assembly is a plain
``unionByName`` of edge DataFrames — no Concatenate/SpAsgn index
surgery — and the summary rides as a (src, dst, w) DataFrame
checkpointed between batches.  Simplifications vs the reference,
stated: ``normalizedAssign`` rescaling and the ``SelectivePrune`` mask
(both accuracy knobs for billion-edge protein graphs) are not
implemented; self-loops added by ``mcl`` give every new vertex column
support, which is what normalizedAssign guards at toy scale.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

from ..graph import Graph
from .mcl import MCLResult, mcl


@dataclass
class IncrementalClustering:
    clusters: DataFrame   # (v, cluster) over all vertices seen so far
    summary: Graph        # MCL-state summary — the M11 of the next step
    iterations: int


def _run(spark: SparkSession, g: Graph, summary_iter: int, kw: dict) -> MCLResult:
    res = mcl(spark, g, summary_iter=summary_iter, **kw)
    assert res.summary is not None
    return res


def mcl_incremental_init(
    spark: SparkSession,
    g: Graph,
    summary_iter: int = 4,
    **mcl_kwargs,
) -> IncrementalClustering:
    """Cluster the first batch with full MCL, capturing the summary
    state (HipMCL(...) → Asummary, Incremental-Toy-Pipeline.cpp:354)."""
    res = _run(spark, g, summary_iter, mcl_kwargs)
    return IncrementalClustering(
        clusters=res.clusters.localCheckpoint(eager=True),
        summary=replace(
            res.summary, edges=res.summary.edges.localCheckpoint(eager=True)
        ),
        iterations=res.iterations,
    )


def mcl_incremental_step(
    spark: SparkSession,
    state: IncrementalClustering,
    new_edges: DataFrame,
    summary_iter: int = 4,
    **mcl_kwargs,
) -> IncrementalClustering:
    """Fold one new vertex batch into an existing clustering.

    ``new_edges`` is (src, dst[, w]) — every edge incident to at least
    one new vertex (M12 ∪ M21 ∪ M22 in reference terms).  Edges wholly
    between OLD vertices are represented by the summary and are
    dropped here before the block union — otherwise an (src, dst) pair
    present in both the summary and ``new_edges`` would survive
    ``unionByName`` as two rows and be plus-merged through the
    normalization, double-counting the edge.  Returns the updated
    assignment over old ∪ new vertices plus the next summary.
    """
    from pyspark.sql import functions as F

    from ..graph import DST, SRC, W, as_edges

    ne = as_edges(new_edges, w=W if W in new_edges.columns else None)
    old = state.clusters.select("v")
    both_old = (
        ne.join(old.withColumnRenamed("v", SRC), SRC, "left_semi")
        .join(old.withColumnRenamed("v", DST), DST, "left_semi")
        .select(SRC, DST)
        .distinct()
    )
    ne = ne.join(both_old, [SRC, DST], "left_anti")
    minc = Graph(
        edges=state.summary.edges.unionByName(ne).localCheckpoint(eager=True),
        n_partitions=state.summary.n_partitions,
    )
    res = _run(spark, minc, summary_iter, mcl_kwargs)
    return IncrementalClustering(
        clusters=res.clusters.localCheckpoint(eager=True),
        summary=replace(
            res.summary, edges=res.summary.edges.localCheckpoint(eager=True)
        ),
        iterations=res.iterations,
    )
