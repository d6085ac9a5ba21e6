"""Deterministic random-walk corpus generation (DeepWalk-style).

Training graph embeddings (DeepWalk/node2vec) starts by materializing
a corpus of fixed-length walks — at web scale that is a first-class
pipeline output, not a by-product.  Each walk step is one SpMSpV-shaped
superstep: frontier ⋈ edges on the current vertex, then a min-reduce
per walk to pick the next hop — the same cached-edge join/aggregate
shape as the BFS gates (algos/bfs.py), so the cost of a length-L walk
corpus is L BFS supersteps over a frontier of |starts| rows.

Pseudo-randomness is a multiplicative pairwise hash,
h = ((A·walk + seed) mod P) · ((C·dst + B·step) mod P) mod P with
P = 2³¹−1: both factors are reduced below 2³¹ before the multiply, so
every intermediate stays under 2⁶² — exact 64-bit integer math on both
engines, and the DuckDB oracle replays the identical choice sequence
with plain SQL arithmetic (no pinned fixture, unlike the XXH64 chains
of the MIS/coloring gates).  The multiply is what makes walks diverge:
a purely additive mix shifts every candidate by the same constant and
only reorders them on mod-P wraparound, collapsing all walks through a
vertex onto one successor (measured on the 7-vertex fixture), whereas
the per-walk factor multiplicatively scrambles the candidate order.

Dead ends terminate a walk early (standard DeepWalk truncation); on a
symmetrized graph every vertex has a neighbor, so walks run full
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph

_P = 2_147_483_647  # 2^31 - 1 (prime)
_A = 1_103_515_245
_B = 12_345
_C = 1_013_904_223


def random_walks(
    spark: SparkSession,
    g: Graph,
    walk_len: int,
    seed: int = 1,
    symmetrize: bool = True,
) -> DataFrame:
    """(walk, step, v) rows: one deterministic walk per vertex (walk id
    = start vertex), steps 0..walk_len; step t's vertex is the neighbor
    minimizing (h(walk, t, dst), dst) over the current vertex's
    neighborhood."""
    e = g.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if symmetrize:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    edges = e.distinct().repartition(g.n_partitions, SRC).cache()
    edges.count()

    from ..operators.spmv import broadcast_nnz_cutoff

    frontier = (
        edges.select(F.col(SRC).alias("walk"))
        .distinct()
        .withColumn("at", F.col("walk"))
        .localCheckpoint(eager=True)
    )
    # localCheckpoint hides size stats from Catalyst (LogicalRDD reports
    # defaultSizeInBytes), so without an explicit broadcast every step
    # sort-merges the whole cached edge table (measured 61 s vs 9 s at
    # sf0.1); the frontier only shrinks, so the O(n) start count drives
    # the same bytes-aware switch the BFS/MIS supersteps use
    n_walks = frontier.count()
    cutoff = broadcast_nnz_cutoff(spark)

    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n_walks < cutoff else df

    slices = [frontier.select("walk", F.lit(0).alias("step"), F.col("at").alias("v"))]
    for t in range(1, walk_len + 1):
        m1 = (F.lit(_A) * F.col("walk") + F.lit(seed)) % F.lit(_P)
        m2 = (F.lit(_C) * F.col(DST) + F.lit(_B * t)) % F.lit(_P)
        h = (m1 * m2) % F.lit(_P)
        frontier = (
            edges.join(_maybe_b(frontier), edges[SRC] == frontier["at"], "inner")
            .select("walk", F.struct(h.alias("h"), F.col(DST).alias("d")).alias("hd"))
            .groupBy("walk")
            .agg(F.min("hd").alias("m"))
            .select("walk", F.col("m.d").alias("at"))
            .localCheckpoint(eager=True)
        )
        slices.append(
            frontier.select("walk", F.lit(t).alias("step"), F.col("at").alias("v"))
        )
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out
