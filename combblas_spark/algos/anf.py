"""Approximate Neighborhood Function (ANF) via OR-semiring SpMV.

The classic graph-mining kernel behind "effective diameter" numbers on
web graphs (Palmer/Gibbons/Faloutsos KDD'02 ANF; Boldi/Rosa/Vigna
HyperANF): N(h) = Σ_v |ball(v, h)|, the number of reachable pairs
within h hops.  Exact computation is an all-pairs BFS; the scalable
formulation keeps a fixed-width Flajolet-Martin sketch per vertex and
iterates

    sketch_{h}(v) = sketch_{h-1}(v)  OR  ⨁_{(v,u) ∈ E} sketch_{h-1}(u)

— one SpMV per hop over the (OR, OR) semiring, exactly the shape of
CombBLAS's boolean-semiring SpMV (the BFS kernel,
/root/reference/include/CombBLAS/ParFriends.h SpMV specializations)
with a 64-bit register payload instead of a parent id.  Every merge is
algebraic (``bit_or`` partial-aggregates map-side), the per-vertex
state is R fixed-width integers, and the per-hop shuffle is O(m)
narrow rows — no frontier, no distinct, no growth with h.

Determinism contract: the FM hash is a pinned affine chain
``(A_r·v + B_r) mod P`` (P = 2^31 - 1) with the register bit at the
trailing-zero count of the hash — plain 64-bit integer arithmetic that
the DuckDB oracle replays exactly (same pattern as the walks /
simhash_pairs gates), so the "approximate" estimator is bit-for-bit
reproducible with no pinned fixture.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph

P = 2_147_483_647  # 2^31 - 1, Mersenne prime
MAX_BIT = 20  # register width cap: saturates near 2^20/φ ≈ 1.36M ball size
PHI = 0.77351  # Flajolet-Martin bias correction
# pinned affine hash constants (odd, < 2^31) — one (A, B) per register
CONSTS = (
    (1500450271, 981492001),
    (2038074743, 1299709_57),
    (1917819437, 715225741),
    (1327144003, 433494437),
    (1113954091, 982451653),
    (1752251231, 533000401),
    (1046527231, 876543211),
    (1212121213, 369696691),
)
R = len(CONSTS)


def _register_exprs() -> list[str]:
    """Per-vertex initial FM registers m0..m{R-1} from the vertex id."""
    exprs = []
    for r, (a, b) in enumerate(CONSTS):
        h = f"(({a}L * v + {b}L) % {P}L)"
        # trailing zeros of h: bit_count((h & -h) - 1); h == 0 gives
        # bit_count(-1) = 64, which `least` caps to MAX_BIT
        pos = f"least(bit_count(({h} & -({h})) - 1), {MAX_BIT})"
        exprs.append(f"shiftleft(1L, cast({pos} AS int)) AS m{r}")
    return exprs


def _estimate(cur: DataFrame, hop: int) -> DataFrame:
    """FM estimate of N(hop) = Σ_v 2^(mean lowest-zero-bit) / φ.

    The per-vertex register sum t = Σ_r lowest_zero_bit(m_r) is a small
    integer (≤ R·(MAX_BIT+1)), so the sum of estimates is grouped on t
    first — ≤ ~170 double terms per engine, making the float total
    reproducible to far below the 1e-2 rounding.
    """
    tsum = " + ".join(
        f"(bit_count(m{r} ^ (m{r} + 1L)) - 1)" for r in range(R)
    )
    return (
        cur.selectExpr(f"({tsum}) AS tsum")
        .groupBy("tsum")
        .count()
        .agg(
            F.round(
                F.sum(F.col("count") * F.expr(f"pow(2.0, tsum / {float(R)})"))
                / F.lit(PHI),
                2,
            ).alias("nf")
        )
        .select(F.lit(hop).alias("hop"), "nf")
    )


def neighborhood_function(
    spark: SparkSession, g: Graph, h: int = 4
) -> DataFrame:
    """N(0)..N(h) on the symmetrized graph as (hop, nf) rows.

    One OR-semiring SpMV per hop; each hop's sketch table is cached so
    the lazy per-hop estimates evaluate the chain once.  At cluster
    scale the sketch table is n rows × R longs — co-partitioned with
    the edge table's hash(dst) layout so the per-hop join is the only
    exchange (same layout decision as algos/pagerank.py).
    """
    # the (OR, OR) semiring is idempotent: duplicate edges and self
    # loops merge to the same registers, so the symmetrized stream is
    # NOT deduplicated — that skips a full O(m) distinct shuffle the
    # plus-semiring kernels (pagerank, triangles) cannot skip
    sym = (
        g.edges.select(SRC, DST)
        .unionByName(g.edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .cache()
    )
    verts = (
        sym.select(F.col(SRC).alias("v")).distinct().repartition(
            g.n_partitions, "v"
        )
    )
    cur = verts.selectExpr("v", *_register_exprs()).cache()
    out = [_estimate(cur, 0)]
    for hop in range(1, h + 1):
        contrib = (
            sym.join(cur.hint("shuffle_hash"), sym[DST] == cur["v"])
            .groupBy(SRC)
            .agg(*[F.expr(f"bit_or(m{r})").alias(f"o{r}") for r in range(R)])
            .withColumnRenamed(SRC, "v")
        )
        nxt = cur.join(contrib.hint("shuffle_hash"), "v", "left").select(
            "v",
            *[
                F.expr(f"m{r} | coalesce(o{r}, 0L)").alias(f"m{r}")
                for r in range(R)
            ],
        )
        cur = nxt.cache()
        out.append(_estimate(cur, hop))
    return reduce(DataFrame.unionByName, out)


def effective_diameter_df(
    spark: SparkSession, g: Graph, h: int = 4, q: float = 0.9
) -> DataFrame:
    """The q-effective diameter (HyperANF §5) as a 1-row DataFrame:
    the interpolated hop where N(hop) first reaches q·N(h).

    Pure window arithmetic over the (h+1)-row neighborhood-function
    table, so the DuckDB oracle replays it exactly."""
    from pyspark.sql import Window

    nf = neighborhood_function(spark, g, h)
    w_all = Window.partitionBy(F.lit(1))
    w_ord = Window.partitionBy(F.lit(1)).orderBy("hop")
    t = (
        nf.withColumn("target", F.lit(q) * F.max("nf").over(w_all))
        .withColumn("prev", F.lag("nf").over(w_ord))
        .filter(F.col("nf") >= F.col("target"))
        .withColumn("rn", F.row_number().over(w_ord))
        .filter(F.col("rn") == 1)
    )
    ed = F.when(F.col("hop") == 0, F.lit(0.0)).otherwise(
        F.col("hop") - 1 + (F.col("target") - F.col("prev")) / (F.col("nf") - F.col("prev"))
    )
    return t.select(F.round(ed, 4).alias("eff_diameter"))


def effective_diameter(
    spark: SparkSession, g: Graph, h: int = 8, q: float = 0.9
) -> float:
    """Smallest hop where N(hop) ≥ q·N(h) (interpolated, HyperANF §5)."""
    rows = {r["hop"]: r["nf"] for r in neighborhood_function(spark, g, h).collect()}
    target = q * rows[h]
    for hop in range(h + 1):
        if rows[hop] >= target:
            if hop == 0:
                return 0.0
            lo, hi = rows[hop - 1], rows[hop]
            return hop - 1 + (target - lo) / (hi - lo) if hi > lo else float(hop)
    return float(h)
