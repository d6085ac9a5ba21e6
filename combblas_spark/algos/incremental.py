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
checkpointed between batches.  Both reference accuracy knobs are
implemented (round 4):

* ``normalizedAssign`` (IncClust.h:1127-1143) — each of the four
  blocks (M11 summary, M12/M21 cross, M22 new-new) is made
  column-stochastic within itself and rescaled by its row count before
  the union, so a summary whose weights live on a different scale than
  the raw new edges cannot drown them (or be drowned);
* ``SelectivePrune`` (IncClust.h:300-341, applied per MCL iteration at
  :751) — iterate entries are pruned when ALL of: the entry connects
  two SAME-age vertices (both old or both new), it is absent from the
  input pattern mask, and its value is below the threshold — noise
  flows inside an age class die early while cross old↔new flows (the
  information the incremental step exists to find) are always kept.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph
from .mcl import MCLResult, mcl


def selective_prune(
    g: Graph, mask: DataFrame, is_old: DataFrame, threshold: float
) -> Graph:
    """SelectivePrune (IncClust.h:300-341): drop entries of ``g`` that
    simultaneously (1) connect two same-flag vertices, (2) do not
    appear in the ``mask`` pattern (src, dst), and (3) fall below
    ``threshold``.  ``is_old`` is (v, old) with any equality-comparable
    flag column."""
    fs = is_old.select(F.col("v").alias(SRC), F.col("old").alias("_fs"))
    fd = is_old.select(F.col("v").alias(DST), F.col("old").alias("_fd"))
    doomed = (
        g.edges.filter(F.col(W) < threshold)
        .join(mask.select(SRC, DST), [SRC, DST], "left_anti")
        .join(fs, SRC)
        .join(fd, DST)
        .filter(F.col("_fs") == F.col("_fd"))
        .select(SRC, DST)
    )
    return replace(g, edges=g.edges.join(doomed, [SRC, DST], "left_anti"))


def _normalized_block(block: DataFrame, nrows: int) -> DataFrame:
    """normalizedAssign rescale of one block (IncClust.h:1127-1143):
    column-stochastic within the block, then multiplied by the block's
    full row DIMENSION ``nrows`` — getnrow() in the reference, i.e.
    |old| for M11/M12 and |new| for M21/M22, NOT the count of rows
    that happen to hold an entry — so blocks contribute on one scale
    regardless of the magnitudes they arrived with or how sparsely
    their rows are populated."""
    sums = block.groupBy(DST).agg(F.sum(W).alias("_cs"))
    return (
        block.join(sums, DST)
        .select(SRC, DST, (F.col(W) / F.col("_cs") * float(nrows)).alias(W))
    )


def assemble_minc(
    old_vs: DataFrame,
    summary_e: DataFrame,
    ne: DataFrame,
    normalized_assign: bool = False,
) -> DataFrame:
    """Assemble the Minc block matrix (IncClust.h:610-700) as one edge
    DataFrame: ``summary_e`` is M11 over the ``old_vs`` (v) vertices,
    ``ne`` carries every edge incident to a new vertex (M12 ∪ M21 ∪
    M22; wholly-old pairs are dropped here — the summary already
    represents them, and a pair present in both inputs would otherwise
    double-count through the union).  With ``normalized_assign`` each
    block is made column-stochastic and rescaled by its row dimension
    (getnrow(): |old| for M11/M12, |new| for M21/M22,
    IncClust.h:1127-1143) before the union."""
    old = old_vs.select("v")
    both_old = (
        ne.join(old.withColumnRenamed("v", SRC), SRC, "left_semi")
        .join(old.withColumnRenamed("v", DST), DST, "left_semi")
        .select(SRC, DST)
        .distinct()
    )
    ne = ne.join(both_old, [SRC, DST], "left_anti")
    if not normalized_assign:
        return summary_e.unionByName(ne)
    # the normalized path drives ~6 separate actions over ne (four
    # isEmpty probes, the n_new count, the block scans) — checkpoint the
    # anti-join once instead of re-running its distinct+anti-join
    # lineage for each
    ne = ne.localCheckpoint(eager=True)
    old_s = old.withColumnRenamed("v", SRC)
    old_d = old.withColumnRenamed("v", DST)
    m12 = ne.join(old_s, SRC, "left_semi").join(old_d, DST, "left_anti")
    m21 = ne.join(old_s, SRC, "left_anti").join(old_d, DST, "left_semi")
    m22 = ne.join(old_s, SRC, "left_anti").join(old_d, DST, "left_anti")
    n_old = old.count()
    n_new = (
        ne.select(F.col(SRC).alias("v"))
        .unionByName(ne.select(F.col(DST).alias("v")))
        .distinct()
        .join(old, "v", "left_anti")
        .count()
    )
    parts = [
        _normalized_block(b.select(SRC, DST, W), nr)
        for b, nr in (
            (summary_e, n_old),
            (m12, n_old),
            (m21, n_new),
            (m22, n_new),
        )
        if not b.isEmpty()
    ]
    assembled = parts[0]
    for p in parts[1:]:
        assembled = assembled.unionByName(p)
    return assembled


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
    normalized_assign: bool = False,
    selective_prune_threshold: float | None = None,
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

    ``normalized_assign`` applies the reference's per-block
    column-stochastic rescale before the union (IncClust.h:1127-1143);
    ``selective_prune_threshold`` enables the per-MCL-iteration
    SelectivePrune mask against the assembled input pattern
    (IncClust.h:751) — both accuracy knobs default off, matching the
    reference's defaults (IncClust.h:135).
    """
    from ..graph import as_edges

    ne = as_edges(new_edges, w=W if W in new_edges.columns else None)
    old = state.clusters.select("v")
    assembled = assemble_minc(
        old, state.summary.edges, ne, normalized_assign=normalized_assign
    )
    minc = Graph(
        edges=assembled.localCheckpoint(eager=True),
        n_partitions=state.summary.n_partitions,
    )
    kw = dict(mcl_kwargs)
    if selective_prune_threshold is not None:
        new_v = (
            minc.edges.select(F.col(SRC).alias("v"))
            .unionByName(minc.edges.select(F.col(DST).alias("v")))
            .distinct()
            .join(old, "v", "left_anti")
        )
        flags = (
            old.withColumn("old", F.lit(1))
            .unionByName(new_v.withColumn("old", F.lit(0)))
            .localCheckpoint(eager=True)
        )
        mask = minc.edges.select(SRC, DST).localCheckpoint(eager=True)
        thr = selective_prune_threshold
        kw["extra_prune"] = lambda a: selective_prune(a, mask, flags, thr)
    res = _run(spark, minc, summary_iter, kw)
    return IncrementalClustering(
        clusters=res.clusters.localCheckpoint(eager=True),
        summary=replace(
            res.summary, edges=res.summary.edges.localCheckpoint(eager=True)
        ),
        iterations=res.iterations,
    )
