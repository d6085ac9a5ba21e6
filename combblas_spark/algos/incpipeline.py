"""End-to-end incremental-clustering pipeline drivers
(Applications/Incremental/{Incremental-Pipeline.cpp, Full.cpp,
LargestCC.cpp, Prep-Data.cpp}).

The reference ships these as MPI binaries that orchestrate mechanics
this repo already implements (IncClust summary capture + IncrementalMCL
→ algos/incremental.py; HipMCL → algos/mcl.py; CC → algos/
components.py; WriteMCLClusters → sources/clusters.py).  This module is
the same orchestration as plain driver-side composition — every data
step stays a distributed DataFrame job; the only ``.collect()`` is the
single-row largest-component argmax, exactly the scalar the reference
also reduces to rank 0 (LargestCC.cpp:193-211).

Batching (Prep-Data.cpp:120-210): the reference shuffles vertices and
splits them into ``k`` equal batches; batch ``i``'s *new edges* are the
edges incident to a batch-``i`` vertex whose other endpoint is in some
batch ``<= i`` (edges toward future vertices are withheld until their
batch arrives).  ``split_batches`` reproduces that with a seeded
xxhash64 vertex partition — fully JVM-side, deterministic, no driver
materialization of the vertex set.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph
from ..operators.indexing import subsref
from ..sources.clusters import write_mcl_clusters
from .components import connected_components
from .incremental import (
    IncrementalClustering,
    mcl_incremental_init,
    mcl_incremental_step,
)
from .mcl import mcl


def split_batches(g: Graph, k: int, seed: int = 42) -> list[DataFrame]:
    """Assign every vertex a batch in ``[0, k)`` by seeded hash and
    return, per batch ``i``, the (src, dst[, w]) edges newly visible at
    step ``i`` (max endpoint batch == ``i``) — the reference's
    Prep-Data split, re-expressed as one hash column + a max().

    The union of the returned frames is exactly ``g.edges`` (each edge
    appears in exactly one batch), mirroring Prep-Data.cpp:172-201.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    b_src = F.pmod(F.xxhash64(F.col(SRC), F.lit(seed)), F.lit(k))
    b_dst = F.pmod(F.xxhash64(F.col(DST), F.lit(seed)), F.lit(k))
    tagged = g.edges.withColumn("_batch", F.greatest(b_src, b_dst))
    return [
        tagged.filter(F.col("_batch") == i).drop("_batch") for i in range(k)
    ]


@dataclass(frozen=True)
class PipelineStep:
    step: int
    n_vertices: int
    iterations: int
    out_path: str | None


def incremental_pipeline(
    spark: SparkSession,
    batches: list[DataFrame],
    out_dir: str | None = None,
    summary_iter: int = 4,
    normalized_assign: bool = False,
    selective_prune_threshold: float | None = None,
    **mcl_kwargs,
) -> tuple[IncrementalClustering, list[PipelineStep]]:
    """Incremental-Pipeline.cpp:302-445: full MCL + summary capture on
    batch 0, then one ``IncrementalMCL`` fold per later batch, writing
    the cluster assignment after every step and carrying the returned
    summary forward as the next step's M11.

    Returns the final state plus a per-step trace (vertex count, MCL
    iterations, written path) — the pipeline's answer to the
    reference's per-step stderr log.
    """
    if not batches:
        raise ValueError("need at least one batch")
    first = Graph.from_edge_list(
        batches[0], w=W if W in batches[0].columns else None
    )
    state = mcl_incremental_init(
        spark, first, summary_iter=summary_iter, **mcl_kwargs
    )
    trace = [_emit(state, 0, out_dir)]
    for i, new_edges in enumerate(batches[1:], start=1):
        state = mcl_incremental_step(
            spark,
            state,
            new_edges,
            summary_iter=summary_iter,
            normalized_assign=normalized_assign,
            selective_prune_threshold=selective_prune_threshold,
            **mcl_kwargs,
        )
        trace.append(_emit(state, i, out_dir))
    return state, trace


def full_pipeline(
    spark: SparkSession,
    batches: list[DataFrame],
    out_dir: str | None = None,
    **mcl_kwargs,
) -> tuple[DataFrame, list[PipelineStep]]:
    """Full.cpp / Incremental-Baseline-Pipeline.cpp: the non-incremental
    baseline — after each batch, re-run full HipMCL over ALL edges seen
    so far.  Same trace shape as :func:`incremental_pipeline` so the
    two are directly comparable (the repo's equivalence pytest is the
    reference's intended experiment).
    """
    if not batches:
        raise ValueError("need at least one batch")
    acc: DataFrame | None = None
    clusters: DataFrame | None = None
    trace: list[PipelineStep] = []
    for i, be in enumerate(batches):
        acc = be if acc is None else acc.unionByName(be, allowMissingColumns=True)
        g = Graph.from_edge_list(acc, w=W if W in acc.columns else None)
        res = mcl(spark, g, **mcl_kwargs)
        clusters = res.clusters.localCheckpoint(eager=True)
        path = None
        if out_dir is not None:
            path = os.path.join(out_dir, f"clusters-step{i:03d}")
            write_mcl_clusters(clusters, path)
        trace.append(
            PipelineStep(i, clusters.count(), res.iterations, path)
        )
    return clusters, trace


def _emit(
    state: IncrementalClustering, step: int, out_dir: str | None
) -> PipelineStep:
    path = None
    if out_dir is not None:
        path = os.path.join(out_dir, f"clusters-step{step:03d}")
        write_mcl_clusters(state.clusters, path)
    return PipelineStep(step, state.clusters.count(), state.iterations, path)


def largest_cc(
    spark: SparkSession, g: Graph, max_iter: int = 64
) -> tuple[Graph, int, int]:
    """LargestCC.cpp:164-214: label components, find the largest, and
    induce the subgraph on its vertices (the reference then dumps it
    with ParallelWriteMM — compose with sources.matrixmarket.write_mm).

    Returns (induced subgraph, component label, component size).  The
    argmax is ONE driver row (groupBy → orderBy desc → limit 1), the
    same scalar reduction the reference performs; the vertex filter,
    the dense 0..n'-1 relabel (the reference's SubsRef compaction), and
    the edge induction all stay distributed.
    """
    from ..operators.indexing import _dense_rank_by

    labels = connected_components(spark, g, max_iter=max_iter)
    top = (
        labels.groupBy("comp")
        .agg(F.count("*").alias("sz"))
        .orderBy(F.desc("sz"), F.asc("comp"))
        .limit(1)
        .collect()[0]
    )
    members = labels.filter(F.col("comp") == top["comp"]).select("v")
    remap = _dense_rank_by(members, ["v"], "new_id")
    return subsref(g, remap), int(top["comp"]), int(top["sz"])
