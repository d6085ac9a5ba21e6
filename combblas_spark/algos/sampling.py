"""Deterministic k-hop neighbor sampling (GraphSAGE-style minibatch
blocks) over the link graph.

The graph-learning counterpart of the corpus samplers in
pipeline/text.py: to train a GNN over a 10^12-edge web graph you never
materialize full neighborhoods — you sample a fixed fanout per hop and
ship (root, hop, src, dst) message-flow blocks to the trainer
(Hamilton et al., NeurIPS'17 §3.1).  Algebraically each hop is the
SpMSpV frontier expansion of algos/bfs.py with a top-``fanout``
select on the semiring's "add" — i.e. Kselect (operators/reduce.py)
applied to the frontier's adjacency rows.

Determinism contract (same device as algos/walks.py): the per-edge
sampling priority is the multiplicative pairwise hash

    pr(src, dst) = ((A·src + B·hop_seed) mod P) · ((C·dst) mod P) mod P

— plain 64-bit arithmetic both engines evaluate exactly, so the DuckDB
oracle replays the identical sample with no pinned fixture.  The
sample for a vertex is root-independent (one top-fanout adjacency per
hop), so the expansion joins against a pre-sampled adjacency table —
O(n·fanout) rows instead of O(frontier·fanout) re-sampling work, and
every root that reaches a vertex reuses its sample (the standard
GraphSAGE implementation trick).

Scale design: the priority rank is a window keyed on ``src`` — the
per-vertex partition is bounded by out-degree, and the sampled
adjacency is fanout-bounded, so hop-k frontiers grow at most
``fanout^k`` per root and the expansion joins are narrow
hash-partitioned equi-joins (broadcast is never required).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..graph import DST, SRC, Graph

P = 2_147_483_647
A = 1_103_515_245
B = 12_345
C = 69_069


def _priority(src, dst, hop_seed: int):
    """Pairwise multiplicative hash, exact in 64-bit integer SQL."""
    left = (A * src + B * F.lit(hop_seed)) % P
    right = (C * dst) % P
    return (left * right) % P


def sampled_adjacency(g: Graph, fanout: int, hop_seed: int) -> DataFrame:
    """Per-vertex top-``fanout`` out-edges by the deterministic priority."""
    e = g.edges.select(SRC, DST).distinct()
    w = Window.partitionBy(SRC).orderBy(
        _priority(F.col(SRC), F.col(DST), hop_seed).asc(), F.col(DST).asc()
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= fanout)
        .select(SRC, DST)
    )


def neighbor_sample(
    spark: SparkSession,
    g: Graph,
    fanouts: tuple[int, ...] = (3, 2),
    max_root: int | None = None,
    seed: int = 1,
) -> DataFrame:
    """Sampled message-flow blocks (root, hop, src, dst) for GNN training.

    ``fanouts[k]`` is the per-vertex sample width at hop k+1; roots are
    the (optionally capped) vertex set.  Each hop joins the current
    frontier against that hop's pre-sampled adjacency; a (root, hop,
    src, dst) row means "dst's features flow to src for root's
    minibatch at this depth".  Rows are distinct per (root, hop, src,
    dst) — a vertex reached twice at the same depth contributes one
    block row, mirroring the dedup the reference's SpMSpV does on
    frontier merge (algos/bfs.py).
    """
    verts = g.edges.select(F.col(SRC).alias("v")).distinct()
    if max_root is not None:
        verts = verts.filter(F.col("v") <= max_root)
    frontier = verts.select(F.col("v").alias("root"), F.col("v").alias("u"))
    blocks = []
    for k, fanout in enumerate(fanouts, start=1):
        adj = sampled_adjacency(g, fanout, hop_seed=seed + k).hint("shuffle_hash")
        hop = (
            frontier.join(adj, frontier["u"] == adj[SRC])
            .select(
                "root",
                F.lit(k).alias("hop"),
                F.col(SRC).alias("src"),
                F.col(DST).alias("dst"),
            )
            .distinct()
        )
        blocks.append(hop)
        frontier = hop.select("root", F.col("dst").alias("u")).distinct().cache()
    return reduce(DataFrame.unionByName, blocks)
