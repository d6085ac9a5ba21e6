"""Tests for the ANF neighborhood-function sketch kernel
(algos/anf.py) and the web-corpus curation operators
(pipeline/web.py: URL canonicalization/recrawl dedup, C4-style span
dedup, PII scrubbing)."""

from collections import deque

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from combblas_spark.sources import fixtures as FX

# ---------------------------------------------------------------------------
# ANF / neighborhood function
# ---------------------------------------------------------------------------


def exact_nf(triples, h):
    """Exact N(0..h) = Σ_v |ball(v, hop)| by BFS on the symmetrized graph."""
    adj: dict[int, set[int]] = {}
    for s, d, _ in triples:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = [0.0] * (h + 1)
    for src in adj:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if dist[u] >= h:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for hop in range(h + 1):
            out[hop] += sum(1 for d_ in dist.values() if d_ <= hop)
    return out


def test_anf_tracks_exact_within_sketch_error(spark):
    """8 FM registers give ~1/sqrt(8) ≈ 35% standard error; the
    deterministic estimate must stay within a generous 2.5x band of
    the exact neighborhood function and be monotone in the hop."""
    from combblas_spark.algos.anf import neighborhood_function

    got = {
        r["hop"]: r["nf"]
        for r in neighborhood_function(spark, _seven(spark), h=3).collect()
    }
    want = exact_nf(FX.SEVEN, 3)
    assert sorted(got) == [0, 1, 2, 3]
    for hop in range(4):
        assert want[hop] / 2.5 <= got[hop] <= want[hop] * 2.5
    assert got[0] <= got[1] <= got[2] <= got[3]


def _seven(spark):
    return FX.graph(spark, FX.SEVEN)


def test_anf_saturates_past_diameter(spark):
    """Once every ball is the whole component the sketches stop
    changing, so the estimates at successive hops are exactly equal."""
    from combblas_spark.algos.anf import neighborhood_function

    got = {
        r["hop"]: r["nf"]
        for r in neighborhood_function(
            spark, FX.graph(spark, FX.chain(4)), h=6
        ).collect()
    }
    assert got[3] == got[4] == got[5] == got[6]


def test_anf_deterministic(spark):
    from combblas_spark.algos.anf import neighborhood_function

    a = sorted(neighborhood_function(spark, _seven(spark), h=2).collect())
    b = sorted(neighborhood_function(spark, _seven(spark), h=2).collect())
    assert a == b


def test_effective_diameter_chain(spark):
    from combblas_spark.algos.anf import effective_diameter

    d = effective_diameter(spark, FX.graph(spark, FX.chain(6)), h=6, q=0.9)
    assert 1.0 <= d <= 5.0


# ---------------------------------------------------------------------------
# URL canonicalization / recrawl dedup
# ---------------------------------------------------------------------------


def test_canonicalize_url_variants_collapse(spark):
    from combblas_spark.pipeline.web import canonicalize_url

    variants = [
        "https://site5.example/p12",
        "HTTPS://WWW.SITE5.EXAMPLE/p12/?utm_source=rss#frag",
        "http://site5.example/p12#top",
        "ftp://www.site5.example/p12/",
    ]
    df = spark.createDataFrame([Row(url=u) for u in variants]).select(
        canonicalize_url("url").alias("c")
    )
    assert {r["c"] for r in df.collect()} == {"site5.example/p12"}


def test_crawl_dedup_latest_wins(spark):
    from combblas_spark.pipeline.web import crawl_dedup

    crawls = spark.createDataFrame(
        [
            Row(url="https://a.example/x", ver=1),
            Row(url="http://A.EXAMPLE/x/", ver=9),
            Row(url="https://www.a.example/x?id=1", ver=5),
            Row(url="https://b.example/y", ver=2),
        ]
    )
    rows = {r["canon_url"]: r for r in crawl_dedup(crawls).collect()}
    assert rows["a.example/x"]["n_crawls"] == 3
    assert rows["a.example/x"]["last_ver"] == 9
    assert rows["b.example/y"]["n_crawls"] == 1


# ---------------------------------------------------------------------------
# span dedup
# ---------------------------------------------------------------------------


def test_span_dedup_first_occurrence_wins(spark):
    """doc 0 and doc 1 share their first 5-token span; doc 0 (lower
    doc_id) keeps it, doc 1 loses exactly that span."""
    from combblas_spark.pipeline.web import span_dedup

    shared = "a b c d e"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=shared + " f g h i j"),
            Row(doc_id=1, text=shared + " k l m n o"),
            Row(doc_id=2, text="p q r s t"),
        ]
    )
    rows = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=5).collect()}
    assert rows[0]["n_spans"] == 2 and rows[0]["n_kept"] == 2
    assert rows[1]["n_spans"] == 2 and rows[1]["n_kept"] == 1
    assert rows[1]["keep_frac"] == pytest.approx(0.5)
    assert rows[2]["n_kept"] == 1


def test_span_dedup_global_invariant(spark, sf_dir):
    """Corpus-wide: Σ n_kept == number of distinct spans; every doc
    keeps at least one span (its first unique occurrence or earlier
    duplicate ownership can't drop a whole doc to zero unless every
    span is owned elsewhere — check bounds only)."""
    from combblas_spark.pipeline.web import span_dedup
    from combblas_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = span_dedup(docs, span_tokens=5)
    agg = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_spans").alias("spans")
    ).collect()[0]
    toks = F.split(F.col("text"), " ")
    n_spans = F.ceil(F.size(toks) / F.lit(5)).cast("int")
    distinct_spans = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_spans - 1),
                    lambda i: F.array_join(F.slice(toks, i * 5 + 1, 5), " "),
                )
            ).alias("span")
        )
        .distinct()
        .count()
    )
    assert agg["kept"] == distinct_spans
    assert agg["kept"] <= agg["spans"]


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_replacement(spark):
    from combblas_spark.pipeline.web import pii_scrub

    docs = spark.createDataFrame(
        [
            Row(
                doc_id=0,
                text="mail me at jo.doe+x@corp.example or call +1-555-0199, "
                "server 192.168.0.1 backup 10.0.0.2",
            ),
            Row(doc_id=1, text="no pii here"),
        ]
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert rows[0]["n_email"] == 1
    assert rows[0]["n_ip"] == 2
    assert rows[0]["n_phone"] == 1
    s = rows[0]["scrubbed"]
    assert "<EMAIL>" in s and "<IP>" in s and "<PHONE>" in s
    assert "corp.example" not in s and "192.168" not in s
    assert rows[1]["scrubbed"] == "no pii here"
    assert (rows[1]["n_email"], rows[1]["n_ip"], rows[1]["n_phone"]) == (0, 0, 0)


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text finds nothing: the placeholder
    tokens match none of the patterns."""
    from combblas_spark.pipeline.web import pii_scrub

    docs = spark.createDataFrame([Row(doc_id=0, text="a b@c.example 1.2.3.4")])
    once = pii_scrub(docs).select(
        F.col("doc_id"), F.col("scrubbed").alias("text")
    )
    twice = pii_scrub(once).collect()[0]
    assert (twice["n_email"], twice["n_ip"], twice["n_phone"]) == (0, 0, 0)
    assert twice["scrubbed"] == twice["text"]


def test_effective_diameter_df_matches_scalar(spark):
    """The 1-row DataFrame form equals the driver-side scalar form on
    the same sketch table (same interpolation)."""
    from combblas_spark.algos.anf import (
        effective_diameter,
        effective_diameter_df,
    )

    g = FX.graph(spark, FX.chain(6))
    scalar = effective_diameter(spark, g, h=6, q=0.9)
    df_val = effective_diameter_df(spark, g, h=6, q=0.9).collect()[0][
        "eff_diameter"
    ]
    assert abs(scalar - df_val) < 1e-4
    assert 1.0 <= df_val <= 5.0


def test_anf_plan_is_sortfree_and_hashjoined(spark):
    """Lock the ANF superstep plan: no sort-merge join, no sort — the
    OR-merge is hash joins + hash aggregates end to end."""
    from combblas_spark.algos.anf import neighborhood_function

    df = neighborhood_function(spark, _seven(spark), h=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan


def test_linkpred_plans_are_sortfree(spark):
    """Lock both link-prediction pipelines sort-free (the wedge joins,
    degree attaches, and complement-mask anti-joins are all pinned
    hash joins; only the top-k windows may sort)."""
    from combblas_spark.algos.linkpred import adamic_adar_topk, jaccard_topk

    g = _seven(spark)
    for fn in (adamic_adar_topk, jaccard_topk):
        plan = (
            fn(spark, g, k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan, (fn.__name__, plan)
