"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk_brute` — exact top-k neighbors for a query set:
  broadcast the (small) query side, compute dot products with builtin
  higher-order functions (zip_with + aggregate, JVM-side), window
  top-k.  This is the ground-truth baseline; at 100 TB it scans the
  corpus once per query batch with no shuffle besides the final top-k.
* :func:`cosine_topk_lsh` — the scale path: random-hyperplane (sign)
  LSH buckets both sides; candidates come from an equi-join on the
  bucket key, then exact re-ranking.  Probing multiple hash tables
  trades recall for cost.

Hyperplanes are seeded-deterministic so results are reproducible at
any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _norm_col(vec: str) -> F.Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _dot(a: str | F.Column, b: str | F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q, neighbor, cos) exact top-k by cosine; excludes self-matches.

    ``queries`` is (q_id, q_vec)-shaped (same schema as corpus).  The
    query side is broadcast — the plan is scan ⨯ broadcast-join with no
    corpus shuffle; the window top-k shuffles only (q, k) rows.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor"),
        F.col(vec_col).alias("cv"),
        _norm_col(vec_col).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("q"),
        F.col(vec_col).alias("qv"),
        _norm_col(vec_col).alias("qn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("q") != F.col("neighbor"))
        .select(
            "q",
            "neighbor",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    win = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .select("q", "neighbor", F.round("cos", 6).alias("cos"))
    )


def cosine_near_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_tables: int = 0,
    seed: int = 42,
) -> DataFrame:
    """(a, b, cos) embedding near-duplicate pairs with cosine ≥
    threshold, a < b.

    ``lsh_tables=0`` (default) is the exact all-pairs baseline — the
    a<b self-join with JVM zip_with/aggregate dot products; quadratic,
    reserved for oracle-sized inputs and re-verification.  With
    ``lsh_tables>0`` candidates come from sign-LSH bucket equi-joins
    (no all-pairs stage, the corpus-scale path) and are re-verified
    exactly, so precision is 1.0 and recall follows the table count.
    """
    a = emb.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("av"),
        _norm_col(vec_col).alias("an"),
    )
    b = emb.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("bv"),
        _norm_col(vec_col).alias("bn"),
    )
    if lsh_tables:
        sa = hyperplane_signs(emb, n_tables=lsh_tables, seed=seed,
                              id_col=id_col, vec_col=vec_col)
        ka = sa.select(F.col("id").alias("a"), "table", "bucket")
        kb = sa.select(F.col("id").alias("b"), "table", "bucket")
        cand = (
            ka.join(kb, ["table", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        pairs = cand.join(a, "a").join(b, "b")
    else:
        pairs = a.join(b, F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a", "b",
            F.round(_dot("av", "bv") / (F.col("an") * F.col("bn")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def cosine_near_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 2048,
) -> DataFrame:
    """Exact (a, b, cos) near-pairs via a block-grid matmul join.

    The scale-honest EXACT plan for moderate thresholds.  Sign-LSH
    cannot help in this regime: at cosine τ=0.4 a colliding pair sits
    at ~66°, so any (planes, tables) setting with recall ≈ 1.0
    generates ≥ all-pairs candidates (measured on the sandbox
    embeddings: recall-1.0 configs emit more candidate rows than the
    quadratic baseline).  LSH prunes only at high thresholds (τ ≳ 0.8,
    see :func:`cosine_near_pairs` lsh_tables) — with near-random
    vectors and τ=0.4, exact all-pairs *compute* is unavoidable.

    What IS avoidable at scale is the all-pairs **row join**: this plan
    buckets vectors into ``ceil(n/block_size)`` blocks and joins the
    upper-triangle block grid, so candidate pairs never materialize as
    Spark rows — each block-pair task computes its full dot-product
    matrix as ONE float64 numpy matmul (BLAS) and emits only surviving
    pairs.  Replication factor is B+1 copies per vector (B = number of
    blocks); shuffle volume is O(n·B), not O(n²).  For corpus-scale
    near-dup dedup (τ ≥ 0.85) use the LSH path instead.
    """
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    n = emb.count()
    n_blocks = max(1, -(-n // block_size))
    spark = emb.sparkSession
    grid = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    left = v.join(F.broadcast(grid), v["blk"] == grid["bi"]).withColumn(
        "side", F.lit(0)
    )
    right = v.join(F.broadcast(grid), v["blk"] == grid["bj"]).withColumn(
        "side", F.lit(1)
    )
    out_schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )
    thr = float(threshold)

    def block_pair(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        if not len(A) or not len(B):
            return pd.DataFrame({"a": [], "b": [], "cos": []})
        ma = np.stack(A["vec"].to_numpy()).astype(np.float64)
        mb = np.stack(B["vec"].to_numpy()).astype(np.float64)
        ia = A["id"].to_numpy()
        ib = B["id"].to_numpy()
        dots = ma @ mb.T
        na = np.sqrt((ma * ma).sum(axis=1))
        nb = np.sqrt((mb * mb).sum(axis=1))
        cos = np.round(dots / np.outer(na, nb), 6)
        # keep each unordered pair once: strict id order inside the
        # diagonal block, any order across blocks (normalized below)
        keep = cos >= thr
        if bi == bj:
            keep &= ia[:, None] < ib[None, :]
        r, c = np.nonzero(keep)
        aa, bb = ia[r], ib[c]
        lo = np.minimum(aa, bb)
        hi = np.maximum(aa, bb)
        return pd.DataFrame({"a": lo, "b": hi, "cos": cos[r, c]})

    return (
        left.unionByName(right)
        .groupBy("bi", "bj")
        .applyInPandas(block_pair, schema=out_schema)
    )


def hyperplane_signs(
    df: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) sign-LSH keys, one row per hash table.

    Buckets are sign-pattern ints of ``n_planes`` bits per table.
    Vectorized: one numpy matmul per Arrow batch.
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        out = []
        keys = np.zeros((m.shape[0], planes.shape[0]), dtype=np.int64)
        for t in range(planes.shape[0]):
            signs = (m @ planes[t].T) > 0  # (batch, n_planes)
            keys[:, t] = signs.dot(1 << np.arange(signs.shape[1], dtype=np.int64))
        out = [row for row in keys]
        return pd.Series(out)

    return (
        df.select(F.col(id_col).alias("id"), buckets(F.col(vec_col)).alias("bk"))
        .select("id", F.posexplode("bk").alias("table", "bucket"))
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact re-rank.

    Recall grows with n_tables (any shared table-bucket makes a pair a
    candidate); fewer planes = coarser buckets = higher recall, more
    candidates.  Defaults (4 planes × 16 tables) give ~0.98 top-5
    recall on the sandbox embeddings, whose neighbor structure is weak
    (median top-5 cosine ≈ 0.32) — corpora with tighter clusters can
    afford more planes.  Validated against :func:`cosine_topk_brute`
    in tests.
    """
    cb = hyperplane_signs(corpus, n_planes, dim, seed, n_tables, id_col, vec_col)
    qb = hyperplane_signs(queries, n_planes, dim, seed, n_tables, id_col, vec_col)
    cand = (
        qb.select(F.col("id").alias("q"), "table", "bucket")
        .join(cb.select(F.col("id").alias("neighbor"), "table", "bucket"), ["table", "bucket"])
        .filter(F.col("q") != F.col("neighbor"))
        .select("q", "neighbor")
        .distinct()
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("cv"), _norm_col(vec_col).alias("cn")
    )
    q = queries.select(
        F.col(id_col).alias("q"), F.col(vec_col).alias("qv"), _norm_col(vec_col).alias("qn")
    )
    scored = (
        cand.join(F.broadcast(q), "q")
        .join(c, "neighbor")
        .select("q", "neighbor", (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos"))
    )
    win = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .select("q", "neighbor", F.round("cos", 6).alias("cos"))
    )
