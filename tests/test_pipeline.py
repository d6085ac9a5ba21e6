"""Training-data pipeline operator tests: dedup, similarity, text, multimodal."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from combblas_spark.pipeline.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_py,
    simhash_signatures,
)
from combblas_spark.pipeline.multimodal import (
    decode_and_featurize,
    frame_sample,
    synth_media,
)
from combblas_spark.pipeline.similarity import cosine_topk_brute, cosine_topk_lsh
from combblas_spark.pipeline.text import fingerprint, language_id, quality_score

BASE = "the quick brown fox jumps over the lazy dog again and again today"
DOCS = [
    (0, BASE),
    (1, BASE),  # exact dup of 0
    (2, BASE.replace("today", "tomorrow")),  # near dup
    (3, "completely different content about sparse matrices and semirings xyz"),
    (4, "der hund läuft und die katze ist nicht da ein zu mit auf"),
    (5, "le chat est dans la maison et les oiseaux pour que une"),
]


def _py_jaccard(a: str, b: str, n: int = 3) -> float:
    def grams(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a), grams(b)
    return len(ga & gb) / len(ga | gb)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    groups = {r["keep_id"]: r["n_dups"] for r in exact_duplicates(docs).collect()}
    assert groups[0] == 2  # docs 0 and 1
    assert sum(groups.values()) == len(DOCS)


def test_ngram_jaccard_matches_bruteforce(spark, docs):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = _py_jaccard(ta, tb)
        if j >= 0.5:
            want[(ia, ib)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["a"], r["b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs and (1, 2) in pairs  # near dups
    assert all(_py_jaccard(DOCS[a][1], DOCS[b][1]) >= 0.5 for a, b in pairs)


def test_minhash_deterministic(spark, docs):
    s1 = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(docs).collect()}
    s2 = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(docs).collect()}
    assert s1 == s2
    assert s1[0] == s1[1]  # identical text -> identical signature
    assert s1[0] != s1[3]


def test_xxh64_reference_matches_spark(spark):
    from combblas_spark.functions.xxh import spark_xxhash64_str

    vals = ["", "a", "hello world", "x" * 31, "y" * 32, "héllo ünïcode", "long " * 20]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [spark_xxhash64_str(v) for v in vals]


def test_minhash_signature_pinned(spark, docs):
    """JVM signatures == pure-Python xxh64 reference, byte-exact."""
    from combblas_spark.functions.xxh import spark_xxhash64_longs, spark_xxhash64_str

    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, n_hashes=8).collect()
    }

    def grams(t, n=3):
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    from combblas_spark.pipeline.dedup import _family_key

    for doc_id, text in DOCS:
        want = [
            min(
                spark_xxhash64_longs(_family_key(i, 42), spark_xxhash64_str(g))
                for g in grams(text)
            )
            for i in range(8)
        ]
        assert sigs[doc_id] == want, doc_id


def test_simhash_matches_reference(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == simhash_py(text), doc_id


def test_simhash_near_pairs(spark, docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(docs, 3).collect()}
    assert pairs[(0, 1)] == 0
    for (a, b), d in pairs.items():
        ref = bin(
            (simhash_py(DOCS[a][1]) ^ simhash_py(DOCS[b][1])) & ((1 << 64) - 1)
        ).count("1")
        assert d == ref <= 3


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_cosine_topk_brute_vs_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qids = sorted(vecs)[:3]
    queries = emb.filter(F.col("vec_id").isin([int(q) for q in qids]))
    got = cosine_topk_brute(emb, queries, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q"], []).append((r["neighbor"], r["cos"]))
    for q in qids:
        qv = vecs[q]
        sims = {
            i: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for i, v in vecs.items()
            if i != q
        }
        want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        got_ids = [n for n, _ in by_q[q]]
        assert got_ids == [i for i, _ in want]
        for (gn, gc), (wn, wc) in zip(by_q[q], want):
            assert gc == pytest.approx(wc, abs=1e-5)


def test_cosine_topk_lsh_recall(spark, emb):
    queries = emb.limit(10)
    brute = cosine_topk_brute(emb, queries, k=5).collect()
    approx = cosine_topk_lsh(emb, queries, k=5).collect()
    bset = {(r["q"], r["neighbor"]) for r in brute}
    aset = {(r["q"], r["neighbor"]) for r in approx}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_ivf_lists_partition_corpus_and_quantizer_deterministic(spark, emb):
    from combblas_spark.pipeline.ivf import ivf_assign, kmeans_centroids

    c1 = kmeans_centroids(emb, n_clusters=8, iters=2)
    c2 = kmeans_centroids(emb, n_clusters=8, iters=2)
    assert np.array_equal(c1, c2)  # seeded init + fixed iteration count
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    assigned = ivf_assign(emb, c1)
    # every vector lands in exactly one inverted list (the exactness
    # invariant that makes nprobe = n_clusters provably brute-equal)
    assert assigned.count() == emb.count()
    assert assigned.select("id").distinct().count() == emb.count()
    assert assigned.filter(
        (F.col("cluster") < 0) | (F.col("cluster") >= 8)
    ).count() == 0


def test_ivf_exact_mode_matches_brute(spark, emb):
    from combblas_spark.pipeline.ivf import ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    brute = sorted(
        (r["q"], r["neighbor"], r["cos"])
        for r in cosine_topk_brute(emb, queries, k=5).collect()
    )
    exact = sorted(
        (r["q"], r["neighbor"], r["cos"])
        for r in ivf_topk(
            emb, queries, k=5, n_clusters=8, nprobe=8, kmeans_iters=2
        ).collect()
    )
    assert exact == brute  # including cos values and tie order


def test_ivf_recall_at_partial_nprobe(spark, emb):
    from combblas_spark.pipeline.ivf import ivf_topk, kmeans_centroids

    queries = emb.filter(F.col("vec_id") < 10)
    cents = kmeans_centroids(emb, n_clusters=8, iters=2)
    bset = {
        (r["q"], r["neighbor"])
        for r in cosine_topk_brute(emb, queries, k=5).collect()
    }
    approx = ivf_topk(
        emb, queries, k=5, n_clusters=8, nprobe=4, centroids=cents
    ).collect()
    aset = {(r["q"], r["neighbor"]) for r in approx}
    recall = len(bset & aset) / len(bset)
    # near-random sf0.001 vectors measure 0.74 at nprobe=4/8; real
    # clustered corpora do far better — gate well above chance (0.5)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # candidate volume is bounded by the probed lists, so every result
    # a partial probe returns must score <= the brute winner it displaces
    assert len(aset) <= len(bset)


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def test_language_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert got[0] == "en" and got[3] == "en"
    assert got[4] == "de"
    assert got[5] == "fr"


def test_quality_and_fingerprint(spark, docs):
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0 < q[0]["quality"] <= 1.0
    assert q[3]["uniq_ratio"] == 1.0  # no repeated tokens
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------

def test_multimodal_plumbing(spark):
    media = synth_media(spark, 30, seed=42, n_partitions=3).cache()
    feats = decode_and_featurize(media, feat_dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 255.0 for f in r["features"])
    # deterministic across runs & partitionings
    again = {
        r["media_id"]: r["features"]
        for r in decode_and_featurize(
            synth_media(spark, 30, seed=42, n_partitions=7), feat_dim=8
        ).collect()
    }
    for r in feats:
        assert again[r["media_id"]] == r["features"]
    frames = frame_sample(media, every_ms=1000)
    counts = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    vids = {r["media_id"]: r["duration_ms"] for r in media.filter("kind='video'").collect()}
    assert set(counts) == set(vids)
    for mid, dur in vids.items():
        assert counts[mid] == max(dur // 1000, 1)


def test_cosine_near_pairs_exact_and_lsh(spark, emb):
    from combblas_spark.pipeline.similarity import cosine_near_pairs

    exact = {
        (r["a"], r["b"]): r["cos"]
        for r in cosine_near_pairs(emb, threshold=0.5).collect()
    }
    # brute-force reference in numpy
    import numpy as np

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    want = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
            if round(c, 6) >= 0.5:
                want[(a, b)] = round(c, 6)
    assert set(exact) == set(want)
    for k in want:
        assert exact[k] == pytest.approx(want[k], abs=1e-6)
    # LSH-bucketed variant: perfect precision, decent recall
    approx = {
        (r["a"], r["b"]) for r in cosine_near_pairs(emb, 0.5, lsh_tables=8).collect()
    }
    assert approx <= set(want) or not want
    if want:
        assert len(approx) / len(want) >= 0.6


def test_minhash_verify_modes_agree(spark, docs):
    """join_back (candidate ⋈ gram-table counts) and gram_sets
    (collect_set arrays) verification must produce the identical exact
    pair set — they differ only in shuffle shape."""
    jb = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5, verify="join_back").collect()
    }
    gs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5, verify="gram_sets").collect()
    }
    assert jb == gs and jb  # identical and non-vacuous
    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, verify="nope")


def test_auto_max_df_formula(spark):
    from combblas_spark.pipeline.dedup import auto_max_df

    assert auto_max_df(0) == 10_000
    assert auto_max_df(10) == 10_000          # floor = the historical
    assert auto_max_df(1_000_000) == 10_000   # literal default — never
    assert auto_max_df(25_000_000) == 10_000  # TIGHTER than before
    assert auto_max_df(10**12) == 2_000_000   # grows as 2*sqrt(n)
    assert auto_max_df(10**12) < 10**12       # subquadratic join bound


def test_ngram_max_df_envelope(spark):
    """Constructed all-stop-gram near-dup pair: the capped self-join
    MISSES it (documented exactness envelope), the envelope row reports
    the dropped posting mass, and the uncapped run finds it."""
    from combblas_spark.pipeline.dedup import ngram_max_df_envelope

    phrase = "alpha beta gamma delta epsilon"
    rows = [(i, phrase) for i in range(6)]  # every gram df=6
    rows += [(10, "unique text one two three xyzzy"),
             (11, "another unique body four five six")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=3 < df=6: all grams of the identical docs are stop-grams
    capped = ngram_jaccard_pairs(d, n=3, threshold=0.9, max_df=3).collect()
    assert capped == []  # the documented miss
    uncapped = {
        (r["a"], r["b"]) for r in ngram_jaccard_pairs(d, n=3, threshold=0.9, max_df=None).collect()
    }
    assert (0, 1) in uncapped and len(uncapped) == 15  # C(6,2) identical docs
    env = ngram_max_df_envelope(d, n=3, max_df=3).collect()[0]
    assert env["max_df"] == 3
    assert env["n_stop_grams"] == 3          # the 3 grams of the shared phrase
    assert env["dropped_postings"] == 18     # 3 grams x df 6
    assert env["total_postings"] == 18 + 8   # plus 4 grams per unique doc
    assert 0 < env["dropped_mass"] < 1
    # max_df=None means NO cap in the envelope too: an uncapped run's
    # envelope must report zero dropped mass, not resolve to the auto
    # cap and claim drops the exact run never made
    env_none = ngram_max_df_envelope(d, n=3, max_df=None).collect()[0]
    assert env_none["max_df"] is None
    assert env_none["dropped_postings"] == 0
    assert env_none["dropped_mass"] == 0.0
    assert env_none["n_stop_grams"] == 0
    # auto mode resolves the cap from corpus size (floor: 10000 > any df
    # here, so nothing drops and the pair set is exact)
    auto_pairs = {
        (r["a"], r["b"]) for r in ngram_jaccard_pairs(d, n=3, threshold=0.9).collect()
    }
    assert auto_pairs == uncapped


def test_dedup_survivors(spark):
    """Survivorship invariants: transitive closure (A~B, B~C collapse
    even without an A~C pair), exactly one keep per cluster, survivor =
    highest quality (ties to lowest doc_id), singletons kept."""
    from combblas_spark.pipeline.dedup import dedup_survivors

    long_pad = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            # cluster {1,2,3} via chain pairs; doc 2 is the longest /
            # highest-quality member (length band bonus)
            (1, "the quick brown fox"),
            (2, "the quick brown fox jumps over a lazy dog " + long_pad),
            (3, "quick brown fox jumps"),
            # singleton
            (4, "completely unrelated text body"),
            # cluster {5,6}: identical quality -> tie broken to min id
            (5, "same same same"),
            (6, "same same same"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long"
    )
    rows = {r["doc_id"]: r for r in dedup_survivors(spark, docs, pairs).collect()}
    assert len(rows) == 6
    # transitive closure: 1,2,3 share a cluster (min id = 1)
    assert rows[1]["cluster"] == rows[2]["cluster"] == rows[3]["cluster"] == 1
    assert rows[4]["cluster"] == 4 and rows[4]["keep"]  # singleton keeps itself
    assert rows[5]["cluster"] == rows[6]["cluster"] == 5
    # exactly one survivor per cluster
    kept = [d for d, r in rows.items() if r["keep"]]
    assert sorted(kept) == [2, 4, 5]  # 2: best quality; 5: tie -> min id
    # the survivor's quality is the cluster max
    assert rows[2]["quality"] == max(rows[d]["quality"] for d in (1, 2, 3))
    assert rows[5]["quality"] == rows[6]["quality"]


def test_split_assign(spark):
    """Deterministic held-out split: stable across runs and
    repartitioning, fraction-proportional, salt-keyed."""
    from combblas_spark.pipeline.text import split_assign, split_bounds

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.repartition(7)).collect()
    }
    assert a == b  # membership survives any repartition
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    frac_valid = sum(1 for s in a.values() if s == "valid") / n
    assert abs(frac_train - 0.9) < 0.03 and abs(frac_valid - 0.05) < 0.02
    resampled = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs, salt="split-v2").collect()
    }
    assert resampled != a  # salt re-deals
    # bounds are cumulative and clamped
    assert split_bounds((0.9, 0.05, 0.05)) == ["e6666666", "f3333333", "ffffffff"]
    with pytest.raises(ValueError):
        split_assign(docs, fractions=(0.5, 0.5), names=("a", "b", "c"))


def test_pack_sequences(spark):
    """Blocked packing must equal the naive concat-and-split rule:
    exclusive prefix sum of tokens over doc_id order, sequence ids by
    integer division.  block_bits=2 forces many blocks; sparse doc_ids
    (gaps, empty blocks) exercise the block join."""
    import pytest

    from combblas_spark.pipeline.text import pack_sequences

    rows = [(i * 7 % 97, "w " * (i % 13) + "w") for i in range(40)]
    rows = [(d, t.strip()) for d, t in {d: t for d, t in rows}.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in pack_sequences(docs, 16, block_bits=2).collect()
    }
    cum = 0
    for doc_id, text in sorted(rows):
        tokens = len(text.split(" "))
        r = got[doc_id]
        assert (r["tokens"], r["tok_start"]) == (tokens, cum)
        assert r["seq_first"] == cum // 16
        assert r["seq_last"] == (cum + tokens - 1) // 16
        cum += tokens
    # packing is exhaustive: sequence ranges tile [0, total) contiguously
    assert max(r["seq_last"] for r in got.values()) == (cum - 1) // 16
    spans = [r for r in got.values() if r["seq_first"] != r["seq_last"]]
    assert spans  # non-vacuous: some doc crosses a sequence boundary
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


def test_budget_select(spark):
    """The two-level bucket/block decomposition must equal the naive
    greedy prefix rule: order by (quality desc, doc_id), keep while
    running tokens <= budget.  block_bits=2 forces multi-block boundary
    buckets; repeated texts force quality ties inside one bucket."""
    from combblas_spark.pipeline.text import budget_select, quality_score

    texts = [
        "the quick brown fox jumps over the lazy dog every day",
        "a b c d e f g h i j k l m n o p",
        "same same same same same",
    ]
    rows = [(i, texts[i % 3]) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        r["doc_id"]: r
        for r in budget_select(docs, 300, block_bits=2).collect()
    }
    # naive reference on the same quality/token values
    naive = sorted(
        ((r["quality"], r["doc_id"]) for r in got.values()),
        key=lambda t: (-t[0], t[1]),
    )
    cum, expect_keep = 0, set()
    for quality, doc_id in naive:
        cum += got[doc_id]["tokens"]
        if cum <= 300:
            expect_keep.add(doc_id)
    assert {d for d, r in got.items() if r["keep"]} == expect_keep
    assert 0 < len(expect_keep) < 60  # non-vacuous boundary
    # tokens/quality columns agree with quality_score / tokenization
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert all(got[d]["quality"] == q[d] for d in got)
    # edges: zero budget keeps nothing, huge budget keeps everything
    none = budget_select(docs, 0).filter("keep").count()
    assert none == 0
    allk = budget_select(docs, 10**9).filter("NOT keep").count()
    assert allk == 0


def test_contamination_screen(spark):
    """Constructed case: one doc copies a benchmark sentence verbatim
    (full hit), one embeds it inside fresh text (partial hit), one is
    clean, one is shorter than n (excluded)."""
    from combblas_spark.pipeline.dedup import contamination_screen

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (0, bench_text),
            (1, "pre one two " + bench_text + " post three four five six"),
            (2, "totally unrelated words that never overlap anything here now"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in contamination_screen(docs, bench, n=8, threshold=0.2).collect()
    }
    assert set(got) == {0, 1, 2}  # doc 3 has no 8-grams
    assert got[0]["contam_ratio"] == 1.0 and got[0]["contaminated"]
    assert 0 < got[1]["hit_grams"] == 1  # exactly the verbatim 8-gram
    assert got[1]["doc_grams"] == 9 and not got[1]["contaminated"]
    assert got[2]["hit_grams"] == 0 and not got[2]["contaminated"]


def test_repetition_stats(spark):
    """Constructed cases: all-same doc (every 2-gram identical), a
    half-repetitive doc, a no-repeat doc, and a 1-token doc (no grams)."""
    from combblas_spark.pipeline.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),  # 5 grams, all "spam spam"
            (1, "a b a b a b c"),                  # 6 grams: a b ×3, b a ×2, b c
            (2, "one two three four five"),        # 4 grams, all distinct
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["total_grams"] == 5 and got[0]["distinct_grams"] == 1
    assert got[0]["dup_gram_frac"] == 0.8 and got[0]["top_gram_frac"] == 1.0
    assert got[1]["distinct_grams"] == 3
    assert got[1]["top_gram_frac"] == pytest.approx(round(3 * 2 / 7, 6))
    assert got[2]["dup_gram_frac"] == 0.0 and got[2]["top_gram_frac"] == pytest.approx(
        round(2 / 5, 6)
    )


def test_mixture_sample(spark):
    """Rates ~hold per group, rate-1 groups keep everything, the rule
    is repartition-invariant, and a salt change redraws membership."""
    from combblas_spark.pipeline.text import mixture_sample

    rows = [(i, "t", f"g{i % 3}") for i in range(3000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rates = {"g0": 0.2, "g1": 1.0}
    out = mixture_sample(docs, rates, default_rate=0.6).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(r["keep"])
    assert all(by_group["g1"])
    assert abs(sum(by_group["g0"]) / 1000 - 0.2) < 0.05
    assert abs(sum(by_group["g2"]) / 1000 - 0.6) < 0.05
    # repartition-invariant
    again = {
        r["doc_id"]: r["keep"]
        for r in mixture_sample(docs.repartition(7), rates, 0.6).collect()
    }
    assert all(again[r["doc_id"]] == r["keep"] for r in out)
    # salt redraw changes some g0 decisions
    redraw = {
        r["doc_id"]: r["keep"]
        for r in mixture_sample(docs, rates, 0.6, salt="mix-v2").collect()
    }
    assert any(redraw[r["doc_id"]] != r["keep"] for r in out if r["group"] == "g0")


def test_top_tokens(spark):
    """Top-k equals the Python counter, boundary ties break by token."""
    from collections import Counter

    from combblas_spark.pipeline.text import top_tokens

    rows = [(0, "b b b a a c c d"), (1, "a c d d e")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # counts: a=3, b=3, c=3, d=3, e=1 — k=2 cuts inside the 4-way tie
    got = [(r["token"], r["cnt"]) for r in top_tokens(docs, 2).collect()]
    assert sorted(got) == [("a", 3), ("b", 3)]
    full = [(r["token"], r["cnt"]) for r in top_tokens(docs, 10).collect()]
    assert sorted(full) == sorted(Counter("b b b a a c c d a c d d e".split()).items())


def test_tokenize_ids_matches_python(spark):
    """Encode vs a pure-Python replay: top-2 vocab by (count desc,
    token asc), ids by rank, OOV -> 0, sequences in document order."""
    from pyspark.sql import Row
    from combblas_spark.pipeline.text import tokenize_ids

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="b a b c b a"),
            Row(doc_id=1, text="a c c d"),
            Row(doc_id=2, text="d d"),
        ]
    )
    # corpus counts: a=3, b=3, c=3, d=3 (all tie) -> vocab (V=2) by
    # (count desc, token asc): a->1, b->2; c and d OOV
    want = {
        0: (6, 1, "2,1,2,0,2,1"),
        1: (4, 3, "1,0,0,0"),
        2: (2, 2, "0,0"),
    }
    rows = {r["doc_id"]: r for r in tokenize_ids(docs, vocab_size=2).collect()}
    for d, (nt, no, ids) in want.items():
        assert rows[d]["n_tokens"] == nt
        assert rows[d]["n_oov"] == no
        assert rows[d]["ids"] == ids


def test_tokenize_ids_roundtrip_consistency(spark, sf_dir):
    """Corpus-level invariants: id sequence length == n_tokens; n_oov
    counts the zeros; every id <= vocab_size."""
    from pyspark.sql import functions as F
    from combblas_spark.pipeline.text import tokenize_ids
    from combblas_spark.sources.tables import load_table

    out = tokenize_ids(load_table(spark, sf_dir, "documents"), vocab_size=15)
    bad = out.filter(
        (F.size(F.split("ids", ",")) != F.col("n_tokens"))
        | (
            F.size(F.filter(F.split("ids", ","), lambda x: x == "0"))
            != F.col("n_oov")
        )
        | F.exists(
            F.split("ids", ","), lambda x: x.cast("int") > F.lit(15)
        )
    ).count()
    assert bad == 0
