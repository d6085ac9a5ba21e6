"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the point of each design):

* exact: one hash-groupBy — map-side combine keeps the shuffle tiny.
* n-gram Jaccard (exact pairwise): doc×gram inverted index self-joined
  on gram.  Grams appearing in huge numbers of docs are *capped*
  (``max_df``) — the standard trick that keeps the self-join from
  exploding quadratically on stop-grams at corpus scale.
* MinHash+LSH: Arrow-vectorized numpy signatures; banding turns
  near-dup search into an equi-join on (band, band_hash) — no all-pairs
  stage ever materializes.  Candidates are verified with exact Jaccard.
* SimHash: 64-bit signature; Hamming-≤k retrieval via 4×16-bit block
  keys (pigeonhole: any pair within distance 3 shares one block).

Only the signature computation is Python (Arrow-batched numpy); every
join/group stays JVM-side.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE = (1 << 61) - 1


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(h, n_dups, keep_id): md5-exact duplicate groups."""
    return docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("h")).agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id")
    )


def word_ngrams(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, gram) distinct word n-grams — the inverted-index feed.

    Built from builtin transform/slice over the token array (JVM-side).
    """
    toks = F.split(F.col(text_col), " ", -1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold).

    inverted index → self-join on gram → |A∩B| per pair → Jaccard from
    per-doc gram counts.  ``max_df`` drops grams present in more docs
    (stop-grams) before the self-join; exactness is preserved for any
    pair whose intersection isn't entirely stop-grams — at the default
    threshold real near-dups always share rare grams.
    """
    grams = word_ngrams(docs, n=n).cache()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    idx = grams
    if max_df is not None:
        df_counts = grams.groupBy("gram").agg(F.count("*").alias("df"))
        idx = grams.join(df_counts.filter(F.col("df") <= max_df), "gram")
    a = idx.select(F.col("doc_id").alias("a"), "gram")
    b = idx.select(F.col("doc_id").alias("b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _gram_hashes(text: str, n: int) -> np.ndarray:
    toks = text.split(" ")
    grams = {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))} or {""}
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )


def _minhash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig: array<long>) — (a·g + b) mod p minwise hashes.

    Arrow-batched; inside the batch it is numpy broadcasting
    (n_hashes × n_grams), no per-row Python beyond the shingle split.
    """
    a, b = _minhash_params(n_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            g = _gram_hashes(t, shingle_n) % MERSENNE
            hv = (a[:, None] * g[None, :] + b[:, None]) % MERSENNE
            out.append(hv.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return docs.select("doc_id", sig(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """LSH candidate generation + exact Jaccard verification.

    rows-per-band r = n_hashes/bands; a pair collides in a band iff all
    r minhashes agree, so candidate recall follows 1-(1-s^r)^b.  The
    band key is a hash of the r-slice — candidates come from an
    equi-join on (band, key), never a cross join.  Verification joins
    candidates back to exact gram sets (distinct-gram Jaccard).
    """
    r = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes, shingle_n, seed).cache()
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    keys = sigs.select("doc_id", "sig", band_idx).select(
        "doc_id",
        "band",
        F.hash(F.slice(F.col("sig"), F.col("band") * r + 1, r)).alias("key"),
    )
    # self-join per band bucket; dedup pairs that collide in many bands
    ka = keys.select(F.col("doc_id").alias("a"), "band", "key")
    kb = keys.select(F.col("doc_id").alias("b"), "band", "key")
    cand = (
        ka.join(kb, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    grams = word_ngrams(docs, n=shingle_n)
    gsets = grams.groupBy("doc_id").agg(F.collect_set("gram").alias("gs"))
    ga = gsets.select(F.col("doc_id").alias("a"), F.col("gs").alias("gsa"))
    gb = gsets.select(F.col("doc_id").alias("b"), F.col("gs").alias("gsb"))
    inter = F.size(F.array_intersect("gsa", "gsb")).cast("double")
    union = (F.size("gsa") + F.size("gsb") - inter).cast("double")
    return (
        cand.join(ga, "a")
        .join(gb, "b")
        .select("a", "b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_py(text: str) -> int:
    """Pinned scalar SimHash (64-bit, md5 token hashes, unit weights) —
    the reference implementation the vectorized UDF must match."""
    acc = [0] * 64
    for tok in text.split(" "):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v  # as signed int64


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: long) Arrow-batched signature computation."""

    @F.pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = t.split(" ")
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(x.encode()).digest()[:8], "little")
                    for x in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            v = sum(1 << int(p) for p in np.nonzero(acc > 0)[0])
            out[i] = v - (1 << 64) if v >= 1 << 63 else v
        return pd.Series(out)

    return docs.select("doc_id", sh(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via 16-bit block LSH.

    Pigeonhole: distance ≤3 ⇒ at least one of the four 16-bit blocks is
    identical, so an equi-join on (block_idx, block_value) finds every
    qualifying pair; bit_count verifies exactly.  No cross join.
    """
    sigs = simhash_signatures(docs).cache()
    block = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("blk")
    keyed = sigs.select("doc_id", "simhash", block).withColumn(
        "key",
        F.expr("shiftrightunsigned(simhash, blk * 16)").bitwiseAND(F.lit(0xFFFF)),
    )
    a = keyed.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "blk", "key")
    b = keyed.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "blk", "key")
    return (
        a.join(b, ["blk", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
