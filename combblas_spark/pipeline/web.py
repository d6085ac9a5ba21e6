"""Web-corpus curation operators: URL canonicalization + recrawl
dedup, C4-style span-level dedup, and PII scrubbing.

The three operators every Common-Crawl-scale training-data pipeline
runs between "raw WARC" and "training corpus":

* **URL canonicalization / recrawl dedup** — a crawl sees the same
  page under scheme/case/www./query-tracking/fragment variants and
  again on every recrawl; the corpus wants one row per canonical URL,
  the latest capture winning.  One regexp chain + one groupBy — the
  exact-dedup shape of pipeline/dedup.py applied to the key itself.
* **Span dedup** — C4's famous filter (Raffel et al. 2020 §2.2)
  deduplicates short spans *across* documents (boilerplate sentences,
  navigation text), keeping only the first occurrence corpus-wide and
  reporting what fraction of each document survives.
* **PII scrubbing** — regex-replace emails / IPv4s / phone numbers
  with typed placeholder tokens and count what was removed, entirely
  JVM-side (`regexp_replace` / `regexp_count`), so the hot path never
  leaves whole-stage codegen.

All three are pure column-expression pipelines (no UDFs); every
aggregate is algebraic (map-side combinable) and every window is keyed
on a high-cardinality column, so the operators scale to 100 TB as
single shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# ---------------------------------------------------------------- URLs

#: canonicalization chain, applied in order (kept in one place so the
#: DuckDB oracle can replay the identical regexps — all RE2-safe)
URL_CANON_STEPS = (
    ("^[a-z]+://", ""),  # strip scheme
    (r"^www\.", ""),  # strip leading www.
    (r"[#?].*$", ""),  # strip query + fragment
    ("/$", ""),  # strip trailing slash
)


def canonicalize_url(url: Column | str) -> Column:
    """Lowercase + scheme/www/query/fragment/trailing-slash stripping."""
    c = F.lower(url if isinstance(url, Column) else F.col(url))
    for pat, rep in URL_CANON_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def crawl_dedup(crawls: DataFrame, version_col: str = "ver") -> DataFrame:
    """Collapse crawl records to one row per canonical URL.

    Input: (url, <version_col>) — the version is any monotone capture
    stamp (WARC timestamp as epoch seconds, crawl id, ...).  Output:
    (canon_url, n_crawls, last_ver) — the survivor is the latest
    capture; ``n_crawls`` is the collapsed multiplicity.  One
    map-side-combined groupBy on the canonical key: at corpus scale
    this is a single O(rows) shuffle with no skew beyond what the
    host distribution already has.
    """
    return (
        crawls.withColumn("canon_url", canonicalize_url("url"))
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_crawls"),
            F.max(version_col).alias("last_ver"),
        )
    )


# ---------------------------------------------------------------- spans


def span_dedup(docs: DataFrame, span_tokens: int = 5) -> DataFrame:
    """C4-style cross-document span dedup survivorship.

    Documents are cut into consecutive non-overlapping spans of
    ``span_tokens`` whitespace tokens; a span occurrence survives iff
    it is the corpus-wide FIRST occurrence (ordered by doc_id, then
    span index — deterministic because the pair is unique).  Returns
    per-document (doc_id, n_spans, n_kept, keep_frac).

    Spans are materialized JVM-side with ``sequence``/``slice``/
    ``array_join`` (no explode of single tokens, no Python); the
    first-occurrence window partitions by span text — high cardinality,
    so the window shuffle is balanced.  This is the groupBy-based
    exact-dedup of pipeline/dedup.py moved from whole-document to
    span granularity.
    """
    toks = F.split(F.col("text"), " ")
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * span_tokens + 1, span_tokens), " "
                ),
            )
        ).alias("span_idx", "span"),
    )
    w = Window.partitionBy("span").orderBy("doc_id", "span_idx")
    kept = spans.withColumn("_rn", F.row_number().over(w))
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.round(
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            / F.count("*").cast("double"),
            4,
        ).alias("keep_frac"),
    )


# ------------------------------------------------------------------ PII

#: detection patterns — valid and identical under Java regex and RE2
#: (no lookaround, no backreferences), so Spark and the DuckDB oracle
#: replay the same matches
PII_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ip", r"\d{1,3}(\.\d{1,3}){3}", "<IP>"),
    ("phone", r"\+\d-\d{3}-\d{4}", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and replace PII spans with typed placeholder tokens.

    Returns the input columns plus ``n_<kind>`` counts per pattern and
    the scrubbed text in ``scrubbed``.  Replacement order is the
    declaration order (emails first, so an address's host is never
    half-eaten by the IP rule).  Pure `regexp_count`/`regexp_replace`
    column chain — whole-stage codegen end to end.
    """
    out = docs
    scrubbed = F.col(text_col)
    for kind, pat, rep in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        scrubbed = F.regexp_replace(scrubbed, pat, rep)
    return out.withColumn("scrubbed", scrubbed)
