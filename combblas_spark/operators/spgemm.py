"""Sparse matrix-matrix multiply over a semiring (SpGEMM, SURVEY.md §2.2).

C = A ⊗ B:  A.join(B, A.dst == B.src).groupBy(A.src, B.dst)
              .agg(SR.add(SR.mult(A.w, B.w)))

The reference's SUMMA broadcast stages (Mult_AnXBn_DoubleBuff,
ParFriends.h:1253-1463) collapse into one Spark shuffle join: the hash
exchange on the contraction key is the communication pattern, AQE picks
broadcast-hash when one side is small, and map-side partial aggregation
replaces MultiwayMerge (MultiwayMerge.h:412-692).

``spgemm_phased`` mirrors MemEfficientSpGEMM (ParFriends.h:464-790):
B is processed in column batches with per-phase prune/top-k select so
the intermediate never exceeds a memory budget — at 100 TB this is the
checkpoint-cadence knob, not a correctness requirement (Spark spills).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.semiring import PLUS_TIMES, Semiring
from ..graph import DST, SRC, W, Graph


def spgemm(a: Graph, b: Graph, semiring: Semiring = PLUS_TIMES) -> Graph:
    """C = A ⊗ B over the semiring."""
    ae = a.edges.select(
        F.col(SRC).alias("i"), F.col(DST).alias("k"), F.col(W).alias("aw")
    )
    be = b.edges.select(
        F.col(SRC).alias("k"), F.col(DST).alias("j"), F.col(W).alias("bw")
    )
    contrib = semiring.contribution(F.col("aw"), F.col("bw"))
    # Pin shuffled-hash: the build is one hash-partitioned slab of B
    # (nnz(B)/P rows) — the DataFrame analogue of the reference's local
    # hash-SpGEMM kernel.  Sort-merge would instead SORT both operand
    # streams, and beyond broadcast reach Catalyst picks it silently
    # (the degradation the triangle scale-curve run measured;
    # BASELINE.md round-5).
    ce = (
        ae.join(be.hint("shuffle_hash"), "k", "inner")
        .groupBy(F.col("i").alias(SRC), F.col("j").alias(DST))
        .agg(semiring.aggregate(contrib).alias(W))
    )
    return replace(a, edges=ce)


def square(a: Graph, semiring: Semiring = PLUS_TIMES) -> Graph:
    """A = A² (SpParMat::Square, SpParMat.cpp:3463-3534)."""
    return spgemm(a, a, semiring)


def masked_spgemm(
    a: Graph, b: Graph, mask: Graph, semiring: Semiring = PLUS_TIMES,
    exclude: bool = False,
) -> Graph:
    """(A ⊗ B) ∘ M — the triangle-counting pattern A·A ∘ A.

    Computed MASK-FIRST: the mask pattern semi-joins the multiply's
    output keys before aggregation, so the dense intermediate of A·B is
    never materialized (SURVEY.md §2.2 'join-first' note).
    """
    ae = a.edges.select(
        F.col(SRC).alias("i"), F.col(DST).alias("k"), F.col(W).alias("aw")
    )
    be = b.edges.select(
        F.col(SRC).alias("k"), F.col(DST).alias("j"), F.col(W).alias("bw")
    )
    # Same shuffled-hash pins as spgemm(): the B slab is the build of
    # the multiply, the mask pattern (nnz(M)/P rows) the build of the
    # semi join — the A·B product stream only ever STREAMS; sorting it
    # is the super-linear failure mode the scale curve recorded for the
    # wedge stream (BASELINE.md round-5).
    pairs = ae.join(be.hint("shuffle_hash"), "k", "inner")
    mk = mask.edges.select(F.col(SRC).alias("i"), F.col(DST).alias("j"))
    how = "left_anti" if exclude else "left_semi"
    pairs = pairs.join(mk.hint("shuffle_hash"), ["i", "j"], how)
    contrib = semiring.contribution(F.col("aw"), F.col("bw"))
    ce = (
        pairs.groupBy(F.col("i").alias(SRC), F.col("j").alias(DST))
        .agg(semiring.aggregate(contrib).alias(W))
    )
    return replace(a, edges=ce)


#: rough serialized bytes of one (long, long, double) intermediate row
#: inside the shuffle (used by the phase estimator)
INTERMEDIATE_ROW_BYTES = 40


def calculate_phases(
    a: Graph,
    b: Graph,
    per_phase_budget_bytes: int = 4 << 30,
    max_phases: int = 256,
) -> int:
    """CalculateNumberOfPhases (ParFriends.h:791-858): pick the column-
    batch count so each phase's multiply intermediate fits the memory
    budget.  Estimated intermediate size = FLOP count × row bytes
    (EstimateFLOP's symbolic pass); phases = ceil(size / budget).
    Spark spills rather than OOMs, so this is a knob for shuffle-spill
    avoidance and checkpoint cadence, not a hard correctness bound."""
    flops = estimate_flops(a, b)
    est_bytes = flops * INTERMEDIATE_ROW_BYTES
    return max(1, min(max_phases, -(-est_bytes // per_phase_budget_bytes)))


def spgemm_phased(
    a: Graph,
    b: Graph,
    semiring: Semiring = PLUS_TIMES,
    phases: int | None = 4,
    prune_below: float | None = None,
    select_k: int | None = None,
) -> Graph:
    """MemEfficientSpGEMM: B in ``phases`` column buckets
    (filter(pmod(dst, phases)==i)), per-phase prune/select, union.

    ``phases=None`` auto-sizes via ``calculate_phases`` (the
    reference's memory-budget estimator, wired rather than caller-
    guessed).  Per-phase top-k is safe because every output column
    lives entirely within one phase (bucketing is on B.dst = C.dst).
    """
    from .reduce import topk_per_column

    if phases is None:
        phases = calculate_phases(a, b)
    outs = []
    for p in range(phases):
        bp = replace(b, edges=b.edges.filter(F.pmod(F.col(DST), F.lit(phases)) == p))
        cp = spgemm(a, bp, semiring)
        if prune_below is not None:
            cp = replace(cp, edges=cp.edges.filter(F.col(W) >= prune_below))
        if select_k is not None:
            cp = topk_per_column(cp, select_k)
        outs.append(cp.edges)
    merged = outs[0]
    for e in outs[1:]:
        merged = merged.unionByName(e)
    return replace(a, edges=merged)


def col_split(g: Graph, k: int) -> list[Graph]:
    """ColSplit (SpParMat.cpp:2981-3263 family): partition the matrix
    into k column buckets by hash — filters over the same cached plan,
    so Spark's partition pruning does the work; the pieces are what
    double-buffered SUMMA / phased SpGEMM iterate over."""
    return [
        replace(g, edges=g.edges.filter(F.pmod(F.col(DST), F.lit(k)) == i))
        for i in range(k)
    ]


def col_concatenate(parts: list[Graph]) -> Graph:
    """ColConcatenate / Merge: reassemble column splits (disjoint
    column sets → plain union, no duplicate combine needed)."""
    merged = parts[0].edges
    for p in parts[1:]:
        merged = merged.unionByName(p.edges)
    return replace(parts[0], edges=merged)


def estimate_flops(a: Graph, b: Graph) -> int:
    """EstimateFLOP (ParFriends.h:370-463): Σ_k nnz_A(·,k)·nnz_B(k,·)
    via a join of per-key histograms — the symbolic pass that sizes
    phases.  AQE's runtime stats do this implicitly; kept as an explicit
    estimator for phase planning."""
    ah = a.edges.groupBy(F.col(DST).alias("k")).agg(F.count("*").alias("an"))
    bh = b.edges.groupBy(F.col(SRC).alias("k")).agg(F.count("*").alias("bn"))
    row = (
        ah.join(bh, "k")
        .agg(F.sum(F.col("an") * F.col("bn")).alias("f"))
        .collect()[0]
    )
    return int(row["f"] or 0)
