"""IVF (inverted-file) approximate nearest neighbor over embeddings.

The third ANN regime next to :mod:`similarity`'s brute-force baseline
and sign-LSH path: a coarse spherical k-means quantizer partitions the
corpus into ``n_clusters`` inverted lists; a query probes only its
``nprobe`` nearest centroids and re-ranks the short-listed candidates
exactly.  This is the classic IVF-Flat index (Sivic & Zisserman's
Video Google inverted file; the FAISS IVF family) re-expressed as
DataFrame joins:

* the corpus is scanned ONCE per k-means iteration and once for the
  final assignment — each pass is a single Arrow-batched matmul UDF
  against a broadcast (k × dim) centroid matrix, no shuffle;
* the centroid update is a JVM-side ``posexplode → groupBy(cluster,
  pos).avg`` producing only k·dim rows;
* search is an equi-join on ``cluster`` between the query probe table
  and the inverted lists — candidate volume is ~``nprobe/n_clusters``
  of the corpus per query, never all-pairs, and the exact re-rank is
  the same JVM ``zip_with``/``aggregate`` dot product the brute path
  uses.

Exactness invariant (the oracle gate): the inverted lists PARTITION
the corpus, so with ``nprobe = n_clusters`` every corpus vector is a
candidate and the result is byte-identical to brute-force top-k —
independent of what the quantizer learned.  Recall at ``nprobe <
n_clusters`` is gated in pytest against the brute baseline.

At 100 TB the corpus-side assignment is written bucketed by
``cluster`` so probe joins shuffle only the (small) query-probe side;
centroids (k · dim · 8 bytes) stay driver/broadcast-sized for any
practical k.

Reference framing: CombBLAS has no ANN surface; this belongs to the
training-data-pipeline extension mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from .similarity import _dot, _norm_col


def _assign_udf(centroids: np.ndarray, nprobe: int):
    """pandas_udf mapping a vector batch to its ``nprobe`` nearest
    centroids by cosine (descending), one numpy matmul per Arrow batch.

    ``centroids`` rows are L2-normalized, so argmax of the raw dot is
    argmax of cosine; ties break on the lower cluster index
    (``argsort`` is stable with ``kind='stable'``).
    """
    cmat = centroids.astype(np.float64)
    p = int(nprobe)

    @F.pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        sims = (m / norms[:, None]) @ cmat.T  # (batch, k)
        # top-p clusters, best first; stable sort for deterministic ties
        order = np.argsort(-sims, axis=1, kind="stable")[:, :p].astype(np.int32)
        return pd.Series(list(order))

    return probes


def kmeans_centroids(
    emb: DataFrame,
    n_clusters: int = 16,
    iters: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer: (n_clusters × dim) float64,
    rows L2-normalized.

    Init is seeded-deterministic at any parallelism: the ``n_clusters``
    vectors with the smallest ``xxhash64(id, seed)`` (a total order on
    ids, independent of partitioning).  Each Lloyd iteration is one
    corpus scan (broadcast-centroid matmul UDF) plus a k·dim-row JVM
    aggregate; clusters that go empty keep their previous centroid.
    Centroid means are floating-point sums whose order follows the
    partitioning — the IVF exactness invariant (see module docstring)
    does not depend on them.
    """
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    init_rows = (
        v.withColumn("h", F.xxhash64(F.col("id"), F.lit(seed)))
        .orderBy("h", "id")
        .limit(n_clusters)
        .select("vec")
        .collect()
    )
    cmat = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in init_rows])
    norms = np.linalg.norm(cmat, axis=1)
    norms[norms == 0.0] = 1.0
    cmat = cmat / norms[:, None]

    for _ in range(int(iters)):
        assign = _assign_udf(cmat, nprobe=1)
        assigned = v.select(
            assign(F.col("vec")).getItem(0).alias("cluster"), "vec"
        )
        sums = (
            assigned.select("cluster", F.posexplode("vec").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = cmat.copy()
        touched = set()
        for r in sums:
            new[r["cluster"], r["i"]] = r["m"]
            touched.add(r["cluster"])
        nn = np.linalg.norm(new, axis=1)
        nn[nn == 0.0] = 1.0
        new = new / nn[:, None]
        # empty clusters keep the previous (already normalized) centroid
        for c in range(n_clusters):
            if c not in touched:
                new[c] = cmat[c]
        cmat = new
    return cmat


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, vec) inverted-list assignment — the IVF index.

    One corpus scan; at scale, write the result bucketed by ``cluster``
    so every probe join is shuffle-free on the corpus side.
    """
    assign = _assign_udf(centroids, nprobe=1)
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    ).withColumn("cluster", assign(F.col("vec")).getItem(0))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q, neighbor, cos) IVF top-k by cosine; excludes self-matches.

    ``nprobe = n_clusters`` probes every list and is EXACTLY the brute
    top-k (the lists partition the corpus) — the driver-oracle gate.
    Smaller ``nprobe`` trades recall for a ~``nprobe/n_clusters``
    candidate fraction; recall is pytest-gated vs the brute baseline.
    Pass a precomputed ``centroids`` to reuse a trained quantizer.
    """
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, n_clusters, kmeans_iters, seed, id_col, vec_col
        )
    nprobe = min(int(nprobe), centroids.shape[0])

    lists = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col("id").alias("neighbor"), "cluster"
    )
    probe = _assign_udf(centroids, nprobe)
    qprobes = (
        queries.select(F.col(id_col).alias("q"), F.col(vec_col).alias("qv"))
        .withColumn("pk", probe(F.col("qv")))
        .select("q", F.explode("pk").alias("cluster"))
    )
    cand = (
        qprobes.join(lists, "cluster")
        .filter(F.col("q") != F.col("neighbor"))
        .select("q", "neighbor")
        .distinct()
    )
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
        cand.join(F.broadcast(q), "q")
        .join(c, "neighbor")
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
