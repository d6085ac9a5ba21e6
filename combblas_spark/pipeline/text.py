"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is JVM-side builtin column expressions (tokenize,
ratios, hashes) so plans stay inside whole-stage codegen; nothing here
needs Python at execution time.  Every function is deterministic and
has an exact ANSI-SQL twin in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic (deliberately small + frozen so the SQL oracle can inline them)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
}


def tokens_col(text: F.Column | str) -> F.Column:
    """Whitespace tokenization (the corpus is whitespace-delimited)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ", -1)


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, chars, tokens, uniq_tokens, avg_token_len)."""
    toks = tokens_col("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("chars"),
        F.size(toks).cast("long").alias("tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("uniq_tokens"),
        F.round(
            (F.length("text") - F.size(toks) + 1) / F.size(toks), 6
        ).alias("avg_token_len"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic: distinct-token overlap with each
    language's frozen stopword list; ties break by language code order.

    Fully JVM-side: array_intersect over a literal array — at 100 TB
    this is a narrow map with no shuffle at all.
    """
    uniq = F.array_distinct(tokens_col("text"))
    scores = [
        F.size(F.array_intersect(uniq, F.array(*[F.lit(w) for w in ws]))).alias(
            f"score_{lang}"
        )
        for lang, ws in STOPWORDS.items()
    ]
    scored = docs.select("doc_id", *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    # first language hitting the max wins the tie (en > de > fr)
    expr = F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )
    return scored.select(
        "doc_id",
        *[F.col(f"score_{l}").cast("long") for l in langs],
        F.when(best == 0, F.lit("und")).otherwise(expr).alias("lang_pred"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length band, stopword ratio, mean
    token length, repetition (uniq/total) — the usual web-corpus
    filters, each a pure column expression.
    """
    toks = tokens_col("text")
    n_tok = F.size(toks).cast("double")
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tok
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
    sw_ratio = sw_hits / n_tok
    len_ok = (F.length("text") >= 50) & (F.length("text") <= 10000)
    score = (
        F.when(len_ok, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.least(sw_ratio * 2.5, F.lit(0.25))
        + F.least(uniq_ratio, F.lit(0.5))
    )
    return docs.select(
        "doc_id",
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over casefolded, punctuation-stripped,
    whitespace-collapsed text — the cheap exact-near-dup key."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return docs.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))


def split_bounds(fractions: tuple[float, ...]) -> list[str]:
    """Cumulative fractions → fixed 8-hex-digit upper bounds on the
    32-bit hash prefix.  Shared by the Spark expression and the SQL
    oracle so both sides compare against byte-identical literals."""
    bounds, acc = [], 0.0
    for frac in fractions:
        acc += frac
        bounds.append(format(min(int(acc * 2**32), 2**32 - 1), "08x"))
    return bounds


def split_assign(
    docs: DataFrame,
    fractions: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "valid", "test"),
    salt: str = "split-v1",
) -> DataFrame:
    """(doc_id, h32, split) — deterministic held-out split assignment.

    Membership is a pure column expression over md5(salt || doc_id):
    stable across runs, clusters, and engine versions, decided per row
    with zero shuffle (the standard reproducible train/valid/test
    protocol for corpus work — sampling by mutable position or RNG
    state would silently re-deal the split on every repartition).
    Fractions map to fixed 32-bit hex prefix ranges via
    :func:`split_bounds`; changing ``salt`` resamples everything.
    """
    if len(fractions) != len(names):
        raise ValueError("fractions and names must align")
    h = F.substring(
        F.md5(
            F.concat(F.lit(salt), F.col("doc_id").cast("string")).cast("binary")
        ),
        1,
        8,
    )
    case = None
    for bound, name in zip(split_bounds(fractions), names):
        cond = h < F.lit(bound)
        case = F.when(cond, name) if case is None else case.when(cond, name)
    case = case.otherwise(names[-1])
    return docs.select("doc_id", h.alias("h32"), case.alias("split"))


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    group_col: str = "source",
    salt: str = "mix-v1",
) -> DataFrame:
    """(doc_id, group, h32, keep) — deterministic per-group rate
    sampling: keep each document with its group's configured
    probability (the data-mixing step that up/down-weights sources or
    languages before training).  Membership is the same zero-shuffle
    hash rule as :func:`split_assign` — stable across runs, clusters
    and repartitioning; changing ``salt`` redraws every group at once.
    """
    h = F.substring(
        F.md5(
            F.concat(F.lit(salt), F.col("doc_id").cast("string")).cast("binary")
        ),
        1,
        8,
    )
    group = F.col(group_col)

    def keep_expr(rate: float) -> F.Column:
        if rate >= 1.0:
            return F.lit(True)
        return h < F.lit(split_bounds((rate,))[0])

    case = None
    for name, rate in rates.items():
        cond = group == name
        case = (
            F.when(cond, keep_expr(rate))
            if case is None
            else case.when(cond, keep_expr(rate))
        )
    keep = case.otherwise(keep_expr(default_rate)) if case is not None else keep_expr(
        default_rate
    )
    return docs.select(
        "doc_id", group.alias("group"), h.alias("h32"), keep.alias("keep")
    )


def top_tokens(docs: DataFrame, k: int) -> DataFrame:
    """(token, cnt) — the ``k`` most frequent tokens, ties broken by
    token order (the vocabulary-seed step before BPE training).

    Global top-k, NOT a global sort: count map-side combines, then
    Spark's TakeOrderedAndProject keeps k rows per partition and merges
    k at the driver — O(k) memory anywhere, any corpus size.
    """
    ex = docs.select(F.explode(tokens_col("text")).alias("token"))
    return (
        ex.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(k)
    )


def tokenize_ids(
    docs: DataFrame, vocab_size: int = 64, oov_id: int = 0
) -> DataFrame:
    """Encode every document as its token-id sequence against a
    corpus-built vocabulary — the last step before sequence packing
    (pack_sequences) hands the corpus to a trainer.

    The vocabulary is the top-``vocab_size`` tokens by count (ties
    broken on the token — deterministic), ids 1..V by rank; any other
    token maps to ``oov_id``.  Returns (doc_id, n_tokens, n_oov, ids)
    with ``ids`` the comma-joined id sequence in document order.

    Scale shape: the vocabulary is bounded by construction (a real BPE
    vocab is ~50k rows), so selection is :func:`top_tokens`'s
    TakeOrderedAndProject (O(V) memory) followed by one V-row window
    for rank ids, and the encode join BROADCASTS the vocab — the one
    place in this module where broadcast is categorically correct.
    The per-doc reassembly is an ``array_sort(collect_list(struct))``
    aggregate keyed on doc_id: one map-side-combinable shuffle, rows
    bounded by document length.
    """
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    vocab = (
        counts.orderBy(F.desc("cnt"), "tok")
        .limit(vocab_size)
        .withColumn("id", F.row_number().over(w))
        .select("tok", "id")
    )
    enc = toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("id"), F.lit(oov_id)).alias("tid"),
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("tid") == oov_id, 1).otherwise(0)).alias("n_oov"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda x: x["tid"].cast("string"),
            ),
            ",",
        ).alias("ids"),
    )


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, tokens, total_grams, distinct_grams, dup_gram_frac,
    top_gram_frac) — Gopher-style within-document repetition filters:
    the fraction of word ``n``-grams that are repeats, and the fraction
    of tokens covered by the single most frequent ``n``-gram (machine-
    generated/boilerplate text scores high on both).

    One explode → two-level aggregate with map-side combine; the
    per-(doc, gram) counts never leave their partition un-combined.
    Documents shorter than ``n`` tokens have no grams and are excluded.
    """
    toks = tokens_col("text")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = docs.select(
        "doc_id", F.size(toks).cast("long").alias("tokens"), F.explode(grams).alias("gram")
    )
    per_gram = ex.groupBy("doc_id", "tokens", "gram").agg(F.count("*").alias("c"))
    agg = per_gram.groupBy("doc_id", "tokens").agg(
        F.sum("c").alias("total_grams"),
        F.count("*").alias("distinct_grams"),
        F.max("c").alias("top_c"),
    )
    return agg.select(
        "doc_id",
        "tokens",
        "total_grams",
        "distinct_grams",
        F.round(
            (F.col("total_grams") - F.col("distinct_grams")) / F.col("total_grams"), 6
        ).alias("dup_gram_frac"),
        F.round(
            F.least(F.col("top_c") * n / F.col("tokens"), F.lit(1.0)), 6
        ).alias("top_gram_frac"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    block_bits: int = 16,
) -> DataFrame:
    """(doc_id, tokens, tok_start, seq_first, seq_last) — training-
    sequence packing: concatenate documents in doc_id order and cut the
    token stream into fixed ``seq_len``-token blocks (the standard
    concat-and-split packing used to build pretraining batches).  Each
    document maps to its global token offset and the range of sequence
    ids it lands in; a downstream writer groups by sequence id.

    Scale shape: the global exclusive prefix sum over doc_id order is
    computed with the same two-level block decomposition as
    :func:`budget_select` — per-block token sums (``doc_id >>
    block_bits``), ONE bounded window over the block table (n_docs /
    2^block_bits rows), then a per-row window partitioned by block
    (≤ 2^block_bits rows each).  No corpus-sized sort or window ever
    exists; nest another block level if n_docs / 2^block_bits itself
    outgrows a partition.
    """
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    base = docs.select(
        "doc_id",
        F.size(tokens_col("text")).cast("long").alias("tokens"),
        F.shiftright("doc_id", block_bits).alias("blk"),
    )
    blocks = base.groupBy("blk").agg(F.sum("tokens").alias("blktok"))
    wb = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    blocks = blocks.select(
        "blk", F.coalesce(F.sum("blktok").over(wb), F.lit(0)).alias("blk_before")
    )
    wdoc = Window.partitionBy("blk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        base.join(blocks, "blk")
        .withColumn(
            "tok_start",
            F.col("blk_before") + F.coalesce(F.sum("tokens").over(wdoc), F.lit(0)),
        )
        .select(
            "doc_id",
            "tokens",
            "tok_start",
            F.floor(F.col("tok_start") / seq_len).alias("seq_first"),
            F.floor((F.col("tok_start") + F.col("tokens") - 1) / seq_len).alias(
                "seq_last"
            ),
        )
    )


def budget_select(
    docs: DataFrame,
    budget_tokens: int,
    quality: DataFrame | None = None,
    block_bits: int = 16,
) -> DataFrame:
    """(doc_id, quality, tokens, keep) — greedy best-quality-first
    corpus selection under a token budget: rank documents by
    (quality desc, doc_id asc) and keep while the running token total
    stays ≤ ``budget_tokens`` (the standard "best N tokens" curation
    step before pretraining).

    Scale shape: the global prefix sum is NEVER computed with a
    corpus-sized window.  Level 1 aggregates to quality buckets (the
    1e-6 rounding grid bounds distinct qualities at ≤ 10^6 rows
    regardless of corpus size) and windows over THAT; whole buckets are
    kept or dropped by their bucket-level prefix.  At most ONE boundary
    bucket needs intra-bucket order — level 2 re-applies the same trick
    inside it on doc_id blocks (``doc_id >> block_bits``, order-
    preserving), so the only per-row window is partitioned by block
    (≤ 2^block_bits rows each).  Caveat (documented, not hidden): a
    degenerate corpus where one quality value holds ~everything makes
    the level-2 block table large; the construction nests further
    levels if that ever matters.
    """
    from pyspark.sql import Window

    if quality is None:
        quality = quality_score(docs).select("doc_id", "quality")
    base = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("tokens")
    ).join(quality, "doc_id")

    buckets = base.groupBy("quality").agg(F.sum("tokens").alias("btok"))
    wq = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    buckets = buckets.select(
        "quality",
        "btok",
        F.coalesce(F.sum("btok").over(wq), F.lit(0)).alias("cum_before"),
    )
    full = buckets.filter(
        F.col("cum_before") + F.col("btok") <= budget_tokens
    ).select("quality", F.lit(True).alias("keep_full"))
    boundary = buckets.filter(
        (F.col("cum_before") < budget_tokens)
        & (F.col("cum_before") + F.col("btok") > budget_tokens)
    ).select(
        "quality", (F.lit(budget_tokens) - F.col("cum_before")).alias("remain")
    )

    bdocs = base.join(F.broadcast(boundary), "quality").withColumn(
        "blk", F.shiftright("doc_id", block_bits)
    )
    bblocks = bdocs.groupBy("quality", "blk").agg(F.sum("tokens").alias("blktok"))
    wb = Window.partitionBy("quality").orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bblocks = bblocks.select(
        "quality",
        "blk",
        F.coalesce(F.sum("blktok").over(wb), F.lit(0)).alias("blk_before"),
    )
    wdoc = Window.partitionBy("quality", "blk").orderBy("doc_id")
    bkeep = (
        bdocs.join(bblocks, ["quality", "blk"])
        .withColumn("cum_in_blk", F.sum("tokens").over(wdoc))
        .select(
            "doc_id",
            (
                (F.col("blk_before") + F.col("cum_in_blk")) <= F.col("remain")
            ).alias("keep_b"),
        )
    )
    return (
        base.join(full, "quality", "left")
        .join(bkeep, "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            "tokens",
            F.coalesce("keep_full", "keep_b", F.lit(False)).alias("keep"),
        )
    )


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, token, tfidf) — the ``k`` highest tf-idf terms per
    document (tf × ln(N/df)), the classic keyword/term-salience step
    before indexing or topic bucketing.

    Entirely JVM-side: one explode + two map-side-combined groupBys +
    an O(n)-build token join; scores are exact scalars (no summation),
    rounded to 6 decimals BEFORE the per-doc rank window so the top-k
    boundary is engine-independent (ties break on the token)."""
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.count()
    scored = tf.join(dfreq.hint("shuffle_hash"), "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n)) / F.col("df").cast("double")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("doc_id", "token", "tfidf")
    )
