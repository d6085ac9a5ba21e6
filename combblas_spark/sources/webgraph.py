"""End-to-end pages → link-graph pipeline (the north-star ingest path).

    pages(url, warc_ts, html, text, lang)
      → extract hrefs (Arrow UDF)            sources/extract.py
      → (src_url, dst_url) links
      → url→id dictionary                    sources/dictionary.py
      → (src, dst, w) edges, duplicates summed, loops dropped
      → Graph (hash-partitioned on src)      graph.py

At cluster scale each stage is one shuffle at most: extraction is
narrow, the dictionary build is a sort + zipWithIndex over *distinct*
urls (≪ pages), relabeling is two joins that broadcast the dictionary
when small, and the Graph ctor's groupBy(src,dst) is the only wide
exchange over the full edge list.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import Graph
from .dictionary import build_dictionary, relabel_edges
from .extract import page_links
from .pages import synth_pages


@dataclass
class WebGraph:
    graph: Graph
    dictionary: DataFrame  # (label=url, id)


def pages_to_graph(
    pages: DataFrame,
    n_partitions: int = 32,
    keep_dangling: bool = False,
) -> WebGraph:
    """Extract the link graph from a pages table.

    ``keep_dangling``: when True, dst urls outside the crawl get ids
    too (union of src and dst labels feeds the dictionary); default
    drops them like the web-graph convention.
    """
    links = page_links(pages)
    if keep_dangling:
        labels = (
            links.selectExpr("src_url AS label")
            .unionByName(links.selectExpr("dst_url AS label"))
        )
    else:
        labels = pages.selectExpr("url AS label")
    dictionary = build_dictionary(labels).cache()
    edges = relabel_edges(links, dictionary)
    g = Graph.from_edge_list(
        edges, sum_duplicates=True, remove_loops=True, n_partitions=n_partitions
    )
    return WebGraph(graph=g, dictionary=dictionary)


def host_graph(pages: DataFrame, n_partitions: int = 32) -> WebGraph:
    """Host-level rollup of the page link graph (the "domain rank"
    aggregation used on Common-Crawl-scale corpora: url edges →
    distinct host→host edges, self-host links dropped).

    Host extraction is the JVM builtin ``parse_url(url, 'HOST')`` — a
    narrow map, no Python.  The rollup SHRINKS the problem by orders of
    magnitude before any iterative work (hosts ≪ urls), so at 100 TB
    the expensive kernels run on the small rolled-up graph; the only
    full-width exchange is the distinct over host pairs, which
    map-side-combines within each scan partition first.  PageRank on
    the result follows the link-pattern convention (one vote per
    distinct host pair), matching algos/pagerank.py semantics.
    """
    links = page_links(pages)
    hl = (
        links.select(
            F.parse_url("src_url", F.lit("HOST")).alias("src_url"),
            F.parse_url("dst_url", F.lit("HOST")).alias("dst_url"),
        )
        .filter(F.col("src_url") != F.col("dst_url"))
        .distinct()
    )
    labels = hl.selectExpr("src_url AS label").unionByName(
        hl.selectExpr("dst_url AS label")
    )
    dictionary = build_dictionary(labels).cache()
    edges = relabel_edges(hl, dictionary)
    g = Graph.from_edge_list(
        edges, sum_duplicates=True, remove_loops=True, n_partitions=n_partitions
    )
    return WebGraph(graph=g, dictionary=dictionary)


def synth_web_graph(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    n_partitions: int = 32,
) -> WebGraph:
    """Synthetic crawl → graph, deterministic at any parallelism."""
    pages = synth_pages(spark, n_pages, seed=seed, n_partitions=max(n_partitions // 4, 1))
    return pages_to_graph(pages, n_partitions=n_partitions)
