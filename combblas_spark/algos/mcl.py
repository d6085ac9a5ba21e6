"""MCL / HipMCL Markov clustering from the engine's own operators.

Reference: Applications/MCL.cpp (860 LoC) — loop (MCL.cpp:563-620):

  expansion   A = A ⊗ A              (MemEfficientSpGEMM, ParFriends.h:464)
  prune       drop entries < threshold; keep per-column top-k
              (MCLPruneRecoverySelect, ParFriends.h:200-368)
  normalize   MakeColStochastic = column sums → 1/sum → DimApply
              (MCL.cpp:388-394)
  chaos       max over columns of (colmax − Σ w²)  (MCL.cpp:407-419)
  inflation   w ← w^inflation then re-normalize    (MCL.cpp:446-449)

until chaos < eps; clusters = connected components of the converged
matrix pattern (Interpret, MCL.cpp:372).

Spark composition: spgemm (one shuffle join per expansion),
window top-k select, two groupBy(dst) passes for normalize+chaos
(fused into one aggregate), localCheckpoint per iteration to cut
lineage.  Phased SpGEMM (spgemm_phased) is the memory-bounded variant
for when the expansion intermediate outgrows executor memory.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph
from ..operators.spgemm import spgemm
from ..operators.reduce import mcl_prune_recovery_select


@dataclass
class MCLResult:
    clusters: DataFrame      # (v, cluster) — cluster = min member id
    iterations: int
    chaos: float
    summary: Graph | None = None   # saved mid-run MCL state (IncClust.h:426-571)


def _col_stochastic(g: Graph) -> Graph:
    """MakeColStochastic: scale every column to sum 1 (MCL.cpp:388-394)."""
    sums = g.edges.groupBy(DST).agg(F.sum(W).alias("_cs"))
    e = (
        g.edges.join(sums, DST)
        .select(SRC, DST, (F.col(W) / F.col("_cs")).alias(W))
    )
    return replace(g, edges=e)


def _chaos(g: Graph) -> float:
    """max_col (colmax − Σ w²) on a column-stochastic matrix
    (MCL.cpp:407-419): 0 ⇔ every column is a single 1 (converged)."""
    row = (
        g.edges.groupBy(DST)
        .agg((F.max(W) - F.sum(F.col(W) * F.col(W))).alias("_c"))
        .agg(F.max("_c").alias("chaos"))
        .collect()[0]
    )
    return float(row["chaos"] or 0.0)


def mcl(
    spark: SparkSession,
    g: Graph,
    inflation: float = 2.0,
    prune_below: float = 1e-4,
    select_k: int = 50,
    recover_num: int = 20,
    recover_pct: float = 0.9,
    eps: float = 1e-4,
    max_iter: int = 40,
    add_self_loops: bool = True,
    summary_iter: int | None = None,
    summary_threshold_nnz: float | None = None,
    extra_prune=None,
) -> MCLResult:
    """Run MCL; returns per-vertex cluster assignment (min-member id).

    Follows the reference's prep: symmetrize input interpretation is the
    caller's choice; self-loops are added (MCL.cpp:462-470) so every
    column has support, then columns are made stochastic.

    Pruning runs the full MCLPruneRecoverySelect (ParFriends.h:200-368):
    hard-threshold prune + per-column top-``select_k``, then *recovery*
    — columns left with fewer than ``recover_num`` entries get entries
    back down to their ``recover_pct`` quantile of the pre-prune values
    (reference defaults 1400/0.9 at HipMCL scale, MCL.cpp:149-150;
    scaled to ``recover_num=20`` for sandbox-size graphs — the ratio to
    ``select_k`` is what matters).  Without recovery, low-weight
    columns prune to near-empty and their vertices detach spuriously.

    ``summary_iter`` / ``summary_threshold_nnz`` mirror the reference's
    incremental-summary capture (IncClust.h:426-571): the MCL state at
    iteration ``summary_iter`` (or the first state whose nnz drops
    below ``summary_threshold_nnz × starting nnz``) is kept in
    ``MCLResult.summary`` — the compressed representation of this
    graph's cluster structure that ``mcl_incremental`` re-clusters
    against when a new vertex batch arrives.  Fallback (as in
    IncClust.h:431): the initial normalized state.

    ``extra_prune`` (Graph -> Graph, optional) is the hook the
    incremental pipeline's SelectivePrune mask plugs into.  Matching
    IncClust.h:750-752, it fires only on iterations whose nnz GREW
    versus the previous iterate (the reference's ``nnz > prevNnz``
    guard), and it is handed the column-stochastic matrix — the
    reference applies the threshold after MakeColStochastic, so the
    comparison scale is per-column mass, not raw post-prune values.
    """
    a = g
    if add_self_loops:
        a = a.add_loops(1.0)
    a = _col_stochastic(a)
    a = replace(a, edges=a.edges.localCheckpoint(eager=True))

    want_summary = summary_iter is not None or summary_threshold_nnz is not None
    summary = a if want_summary else None
    summary_saved = False
    nnz_start = a.edges.count() if summary_threshold_nnz is not None else 0
    nnz_prev = a.edges.count() if extra_prune is not None else None

    chaos = float("inf")
    it = 0
    while it < max_iter and chaos > eps:
        # expansion
        a = spgemm(a, a)
        # prune + select + recovery (MCLPruneRecoverySelect)
        a = mcl_prune_recovery_select(
            a, prune_below, select_k, recover_num, recover_pct
        )
        if extra_prune is not None:
            # IncClust.h:750-752: SelectivePrune fires only when nnz
            # grew this iteration, and its threshold compares against
            # the column-stochastic values
            a = _col_stochastic(a)
            nnz_now = a.edges.count()
            if nnz_now > nnz_prev:
                a = extra_prune(a)
                # the guard compares against the previous ITERATE's
                # state (IncClust.h prevNnz) — after a firing prune
                # that state is the PRUNED matrix, not the pre-prune
                # count, else a post-prune re-expansion never re-fires
                nnz_prev = a.edges.count()
            else:
                nnz_prev = nnz_now
        # inflation then re-normalize
        a = replace(a, edges=a.edges.withColumn(W, F.pow(F.col(W), inflation)))
        a = _col_stochastic(a)
        a = replace(a, edges=a.edges.localCheckpoint(eager=True))
        chaos = _chaos(a)
        it += 1
        if want_summary and not summary_saved:
            if summary_iter is not None and it >= summary_iter:
                summary, summary_saved = a, True
            elif (
                summary_threshold_nnz is not None
                and a.edges.count() < summary_threshold_nnz * nnz_start
            ):
                summary, summary_saved = a, True

    # Interpret: clusters = connected components of the attractor pattern
    from .components import connected_components

    clusters = connected_components(spark, a).withColumnRenamed("comp", "cluster")
    return MCLResult(
        clusters=clusters, iterations=it, chaos=chaos, summary=summary
    )


def mcl_fixed(
    spark: SparkSession,
    g: Graph,
    n_iter: int,
    inflation: float = 2.0,
    prune_below: float = 1e-4,
    select_k: int = 50,
    quantize: int = 12,
    add_self_loops: bool = True,
) -> DataFrame:
    """Deterministic fixed-iteration MCL state — the oracle-gate mode.

    Runs exactly ``n_iter`` expansion → prune/top-k → inflate →
    normalize steps (MCL.cpp:563-620 with the convergence test and
    recovery disabled) and returns the resulting column-stochastic
    matrix as (src, dst, w).  The matrix is quantized to ``quantize``
    decimals after expansion and after each normalize so that an
    unrolled SQL oracle reproduces it exactly: engine-level summation
    noise (~1e-15) can otherwise flip the top-k boundary between two
    mathematically-tied entries and change the *support*, not just the
    values.  1e-12 quantization kills that noise while preserving every
    genuine distinction at the matrix's value scale (≥ prune_below =
    1e-4 after normalization).
    """
    a = g
    if add_self_loops:
        a = a.add_loops(1.0)
    a = _col_stochastic(a)
    a = replace(a, edges=a.edges.withColumn(W, F.round(F.col(W), quantize)))
    a = replace(a, edges=a.edges.localCheckpoint(eager=True))

    for _ in range(n_iter):
        a = spgemm(a, a)
        a = replace(a, edges=a.edges.withColumn(W, F.round(F.col(W), quantize)))
        a = mcl_prune_recovery_select(a, prune_below, select_k, 0, 0.0)
        a = replace(a, edges=a.edges.withColumn(W, F.pow(F.col(W), inflation)))
        a = _col_stochastic(a)
        a = replace(a, edges=a.edges.withColumn(W, F.round(F.col(W), quantize)))
        a = replace(a, edges=a.edges.localCheckpoint(eager=True))
    return a.edges.select(SRC, DST, W)
