"""Pages → text/links extraction tests (FIXTURES.md §1 invariants).

* byte-identical text per url: Arrow-vectorized extract_text vs the
  pinned pure-Python reference extractor (input_hint contract), and vs
  the golden ``text`` column generated at build time;
* extracted link set == the generator's documented link rule;
* end-to-end: synthetic crawl → dictionary → Graph → PageRank runs and
  ranks sum to ~1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from combblas_spark.sources.extract import extract_text, extract_text_py, page_links
from combblas_spark.sources.pages import (
    expected_edges,
    page_url,
    synth_pages,
)
from combblas_spark.sources.webgraph import pages_to_graph, synth_web_graph

N_PAGES = 64


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, N_PAGES, seed=42, n_partitions=4).cache()


def test_extract_text_byte_identical(spark, pages):
    rows = (
        pages.select(
            "url",
            "html",
            "text",
            extract_text(F.col("html")).alias("extracted"),
        )
        .collect()
    )
    assert len(rows) == N_PAGES
    for r in rows:
        ref = extract_text_py(bytes(r["html"]))
        assert r["extracted"] == ref, f"vectorized != reference for {r['url']}"
        assert r["text"] == ref, f"golden column != reference for {r['url']}"
        assert "ignored" not in r["extracted"]  # <title>/<style>/<script> dropped
        assert "&amp;" not in r["extracted"]  # entities unescaped


def test_extraction_handles_edge_cases():
    assert extract_text_py(b"") == ""
    assert extract_text_py(b"<p>a&amp;b</p>") == "a&b"
    assert extract_text_py(b"plain no tags") == "plain no tags"
    assert extract_text_py("<p>café</p>".encode()) == "café"
    assert extract_text_py(b"\xff\xfebad utf8") != ""  # errors=replace, no crash
    assert extract_text_py(b"<SCRIPT>x</SCRIPT>visible") == "visible"


def test_links_match_generator_rule(spark, pages):
    got = {
        (r["src_url"], r["dst_url"]) for r in page_links(pages).distinct().collect()
    }
    want = {
        (page_url(s), page_url(d))
        for s, d in expected_edges(N_PAGES, seed=42)
    }
    assert got == want


def test_pages_deterministic_across_partitioning(spark):
    a = synth_pages(spark, 32, seed=7, n_partitions=1).orderBy("url").collect()
    b = synth_pages(spark, 32, seed=7, n_partitions=8).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_dictionary_relabel_roundtrip(spark, pages):
    wg = pages_to_graph(pages, n_partitions=4)
    id_of = {r["label"]: r["id"] for r in wg.dictionary.collect()}
    # dense ids 0..n-1
    assert sorted(id_of.values()) == list(range(len(id_of)))
    got = {(r["src"], r["dst"]) for r in wg.graph.edges.collect()}
    want = {
        (id_of[page_url(s)], id_of[page_url(d)])
        for s, d in expected_edges(N_PAGES, seed=42)
        if s != d
    }
    assert got == want


def test_end_to_end_pagerank_on_crawl(spark):
    from combblas_spark.algos.pagerank import pagerank

    wg = synth_web_graph(spark, 48, seed=42, n_partitions=4)
    res = pagerank(spark, wg.graph, tol=1e-6, max_iter=60)
    total = res.ranks.agg(F.sum("rank")).collect()[0][0]
    assert res.delta <= 1e-6
    assert total == pytest.approx(1.0, abs=1e-6)


def test_host_graph_rollup(spark, pages):
    """Host rollup == the pure rule rolled up with urllib: distinct
    host pairs, self-host links dropped, dictionary round trip."""
    from urllib.parse import urlparse

    from combblas_spark.sources.webgraph import host_graph

    hg = host_graph(pages, n_partitions=4)
    id_of = {r["label"]: r["id"] for r in hg.dictionary.collect()}
    assert sorted(id_of.values()) == list(range(len(id_of)))
    got = {(r["src"], r["dst"]) for r in hg.graph.edges.collect()}
    want = set()
    for s, d in expected_edges(N_PAGES, seed=42):
        hs, hd = urlparse(page_url(s)).netloc, urlparse(page_url(d)).netloc
        if hs != hd:
            want.add((id_of[hs], id_of[hd]))
    assert got == want
    # dictionary universe == hosts that appear on some cross-host edge
    assert set(id_of.values()) == {v for e in want for v in e}


def test_host_curation_matches_pure_python(spark):
    """q_host_curation's selected page set == an independent pure-Python
    pipeline: reference extractor + urllib hosts + numpy PageRank on the
    pure-rule host graph + the same rank·sqrt(tokens) scoring."""
    from urllib.parse import urlparse

    import numpy as np

    import __spark_entry__ as entry
    from combblas_spark.sources.pages import _render_page, link_targets

    n_pages, seed = 256, 42
    # pure host edge list (distinct pairs, self-host dropped)
    pairs = set()
    for i in range(n_pages):
        hs = urlparse(page_url(i)).netloc
        for t in link_targets(i, n_pages, seed):
            hd = urlparse(page_url(t)).netloc
            if hs != hd:
                pairs.add((hs, hd))
    hosts = sorted({h for e in pairs for h in e})
    idx = {h: k for k, h in enumerate(hosts)}
    n = len(hosts)
    out: list[list[int]] = [[] for _ in range(n)]
    for s, d in pairs:
        out[idx[s]].append(idx[d])
    deg = np.array([len(o) for o in out], dtype=float)
    rank = np.full(n, 1.0 / n)
    for _ in range(entry.PR_ITERS):
        nxt = np.zeros(n)
        for v, targets in enumerate(out):
            if targets:
                nxt[targets] += rank[v] / deg[v]
        dangling = rank[deg == 0].sum()
        rank = (1 - entry.ALPHA) / n + entry.ALPHA * (nxt + dangling / n)
    rank = np.round(rank, 6)
    # pure per-page scores; only pages whose host is in the graph
    scored = []
    for i in range(n_pages):
        url, host = page_url(i), urlparse(page_url(i)).netloc
        if host not in idx:
            continue
        _, html, _ = _render_page(i, n_pages, seed)
        n_tok = len(extract_text_py(html).split(" "))
        score = round(float(rank[idx[host]]) * float(np.sqrt(n_tok)), 6)
        scored.append((url, score))
    scored.sort(key=lambda r: (-r[1], r[0]))
    want = {u for u, _ in scored[: entry.CURATE_K]}

    got_rows = entry.q_host_curation(spark, "unused").collect()
    assert len(got_rows) == entry.CURATE_K
    assert {r["url"] for r in got_rows} == want
    by_url = {u: s for u, s in scored}
    for r in got_rows:
        assert r["score"] == pytest.approx(by_url[r["url"]], abs=2e-6)


def test_anchor_rows_match_generator_rule(spark, pages):
    """Every extracted anchor row is (src, dst, 'to {dst_id}') for an
    edge of the pure link rule — extraction parity with link_targets."""
    from combblas_spark.sources.extract import extract_anchor_rows

    got = {
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in extract_anchor_rows(pages).collect()
    }
    want = {
        (page_url(s), page_url(d), f"to {d}")
        for s, d in expected_edges(N_PAGES, seed=42)
    }
    assert got == want


def test_anchor_index_counts(spark, pages):
    """Per-target: two distinct terms ('to' + the numeric id), term
    mass = 2x in-degree, dominant term is the numeric one (digits sort
    before letters on the count tie)."""
    from combblas_spark.sources.extract import anchor_index

    indeg: dict[int, int] = {}
    for _, d in expected_edges(N_PAGES, seed=42):
        indeg[d] = indeg.get(d, 0) + 1
    rows = {r["dst_url"]: r for r in anchor_index(pages).collect()}
    assert set(rows) == {page_url(d) for d in indeg}
    for d, c in indeg.items():
        r = rows[page_url(d)]
        assert r["n_terms"] == 2
        assert r["n_anchor_terms"] == 2 * c
        assert r["top_term"] == str(d)


def test_anchor_extraction_edge_cases(spark):
    """Nested-quote hrefs, empty anchor text, multiline anchors."""
    import pandas as pd
    from combblas_spark.sources.extract import extract_anchor_rows

    html = (
        b'<a href="https://x.example/a">first link</a>'
        b"<a href='https://x.example/b'></a>"
        b'<a class="z" href="https://x.example/c"> padded </a>'
        b'<a href="https://x.example/d"><b>nested-skipped</b></a>'
    )
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["https://s.example/p"], "html": [html]})
    )
    rows = sorted(
        (r["dst_url"], r["anchor"]) for r in extract_anchor_rows(df).collect()
    )
    assert rows == [
        ("https://x.example/a", "first link"),
        ("https://x.example/b", ""),
        ("https://x.example/c", "padded"),
    ]
