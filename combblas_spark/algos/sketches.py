"""Mergeable frequency sketches: Count-Min heavy hitters and
weighted sampling.

The second half of the sketch family (algos/anf.py holds the
Flajolet-Martin side): a Count-Min sketch (Cormode/Muthukrishnan '05)
is a d×w counter grid where every update adds 1 at ``(r, h_r(key))``
— each row is one map-side-combinable groupBy, the whole sketch is
O(d·w) rows however large the stream, and point estimates are the MIN
across rows.  At web scale this is the hub detector: the skew trigger
in operators/spmv.py needs "which dst keys are heavy" without a full
O(distinct-keys) aggregate, and a CMS answers it in fixed space.

Weighted sampling is Efraimidis-Spirakis (IPL 2006): key_i =
u_i^(1/w_i) with u_i uniform, take the top-k keys — a single
TakeOrdered pass, no rejection loop, mergeable across partitions.

Determinism contract (same device as algos/anf.py / walks.py): all
randomness is the pinned affine chain ``(A·key + B) mod P`` on int64 —
the DuckDB oracle replays both sketches exactly, no fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

P = 2_147_483_647
#: one (A, B) affine pair per CMS row
CMS_CONSTS = (
    (1103515245, 12345),
    (1588635695, 677890),
    (1229782938, 24700),
    (2027382861, 55555),
)
CMS_D = len(CMS_CONSTS)
#: weighted-sampling uniform-draw constants
WS_A, WS_B = 1_500_450_271, 981_492_001


def cms_heavy_hitters(
    spark: SparkSession,
    keys: DataFrame,
    width: int = 64,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` keys by Count-Min estimate over ``keys`` (one column
    ``key``: int64, one row per occurrence).

    Two fixed-size passes: (1) the d×w sketch — d map-side-combined
    groupBys over hashed buckets, O(d·w) result rows; (2) estimates —
    the DISTINCT key set joins each of its d buckets (broadcast: the
    sketch is d·w rows by construction, the one categorically-correct
    broadcast here), MIN across rows, rank.  CMS error is one-sided:
    est ≥ true, est ≤ true + N/w with prob ≥ 1-(1/2)^d, so the top-k
    by estimate contains every key with true count > N/w + gap.
    Output: (key, est) — integers, bit-reproducible.
    """
    bucketed = keys.select(
        "key",
        *[
            (((F.lit(a) * F.col("key") + F.lit(b)) % P) % width).alias(f"b{r}")
            for r, (a, b) in enumerate(CMS_CONSTS)
        ],
    ).cache()
    sketches = []
    for r in range(CMS_D):
        sketches.append(
            bucketed.groupBy(F.col(f"b{r}").alias("bucket"))
            .agg(F.count("*").alias("cnt"))
            .select(F.lit(r).alias("row"), "bucket", "cnt")
        )
    from functools import reduce

    sketch = reduce(DataFrame.unionByName, sketches)
    cand = bucketed.select(
        "key", *[F.col(f"b{r}") for r in range(CMS_D)]
    ).distinct()
    est = cand
    for r in range(CMS_D):
        srow = (
            sketch.filter(F.col("row") == r)
            .select(F.col("bucket").alias(f"b{r}"), F.col("cnt").alias(f"c{r}"))
        )
        est = est.join(F.broadcast(srow), f"b{r}")
    est = est.select(
        "key", F.least(*[F.col(f"c{r}") for r in range(CMS_D)]).alias("est")
    )
    w = Window.orderBy(F.col("est").desc(), F.col("key").asc())
    return (
        est.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("key", "est")
    )


def weighted_sample(
    spark: SparkSession,
    items: DataFrame,
    k: int,
    key_col: str = "key",
    weight_col: str = "w",
) -> DataFrame:
    """Efraimidis-Spirakis weighted sample without replacement: the
    ``k`` items with the largest ``u^(1/w)`` draw keys.

    One TakeOrdered pass (O(k) memory per partition), mergeable, no
    rejection loop; inclusion probability is proportional to weight.
    The uniform draw is the pinned affine chain on the item key, so
    the selection is deterministic and the oracle replays it.
    Returns (key, w) for the selected items.
    """
    u = (
        ((F.lit(WS_A) * F.col(key_col) + F.lit(WS_B)) % P).cast("double")
        + 1.0
    ) / (P + 1.0)
    draw = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    return (
        items.withColumn("_draw", draw)
        .orderBy(F.col("_draw").desc(), F.col(key_col).asc())
        .limit(k)
        .select(key_col, weight_col)
    )
