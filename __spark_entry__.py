"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (PageRank on the derived
link graph at sf0.001).  ``queries()`` exposes each implemented operator
from SURVEY.md §2 as (spark, sf_dir) -> DataFrame; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL (iterative kernels are unrolled as
chained CTEs with a fixed iteration count matching the Spark side).

Doubles are rounded to 6 decimals on BOTH sides so the driver's
value-hash is insensitive to summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

ALPHA = 0.85
PR_ITERS = 5
CC_ROUNDS = 8
LP_ITERS = 2
TOPK = 2

# ---------------------------------------------------------------------------
# shared SQL building blocks (DuckDB oracle side)
# ---------------------------------------------------------------------------

EDGES_CTE = """
edges AS MATERIALIZED (
  SELECT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey, l.l_suppkey
)"""

SYM_EDGES_CTE = """
sedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
  )
)"""


def _pagerank_sql(n_iter: int) -> str:
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        """verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)
),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src),
vd AS MATERIALIZED (SELECT verts.v, coalesce(deg.deg, 0) AS deg FROM verts LEFT JOIN deg USING (v)),
params AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT n FROM params) AS rank FROM verts)""",
    ]
    for k in range(1, n_iter + 1):
        prev = f"r{k-1}"
        parts.append(
            f""",
d{k} AS MATERIALIZED (
  SELECT coalesce(sum(p.rank), 0.0) AS mass
  FROM {prev} p JOIN vd USING (v) WHERE vd.deg = 0
),
s{k} AS MATERIALIZED (
  SELECT e.dst AS v, sum(p.rank / vd.deg) AS s
  FROM edges e JOIN {prev} p ON e.src = p.v JOIN vd ON vd.v = p.v
  WHERE vd.deg > 0
  GROUP BY e.dst
),
r{k} AS MATERIALIZED (
  SELECT verts.v,
         (1 - {ALPHA}) / (SELECT n FROM params)
         + {ALPHA} * (coalesce(s{k}.s, 0.0)
                      + (SELECT mass FROM d{k}) / (SELECT n FROM params)) AS rank
  FROM verts LEFT JOIN s{k} ON verts.v = s{k}.v
)"""
        )
    parts.append(f"\nSELECT v, round(rank, 6) AS rank FROM r{n_iter}")
    return "\n".join(parts)


def _cc_sql(rounds: int) -> str:
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        """verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM sedges),
l0 AS MATERIALIZED (SELECT v, v AS comp FROM verts)""",
    ]
    for k in range(1, rounds + 1):
        prev = f"l{k-1}" if k == 1 else f"j{k-1}"
        parts.append(
            f""",
h{k} AS MATERIALIZED (
  SELECT l.v, least(l.comp, coalesce(nm.nmin, l.comp)) AS comp
  FROM {prev} l LEFT JOIN (
    SELECT e.dst AS v, min(p.comp) AS nmin
    FROM sedges e JOIN {prev} p ON e.src = p.v
    GROUP BY e.dst
  ) nm USING (v)
),
j{k} AS MATERIALIZED (
  SELECT a.v, coalesce(b.comp, a.comp) AS comp
  FROM h{k} a LEFT JOIN h{k} b ON a.comp = b.v
)"""
        )
    parts.append(f"\nSELECT v, comp FROM j{rounds}")
    return "\n".join(parts)


def _labelprop_sql(n_iter: int) -> str:
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        """verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM sedges),
l0 AS MATERIALIZED (SELECT v, v AS label FROM verts)""",
    ]
    for k in range(1, n_iter + 1):
        prev = f"l{k-1}"
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS v, p.label, count(*) AS cnt
  FROM sedges e JOIN {prev} p ON e.src = p.v
  GROUP BY e.dst, p.label
),
t{k} AS MATERIALIZED (
  SELECT v, label FROM (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY cnt DESC, label ASC) AS rn
    FROM c{k}
  ) WHERE rn = 1
),
l{k} AS MATERIALIZED (
  SELECT p.v, coalesce(t{k}.label, p.label) AS label
  FROM {prev} p LEFT JOIN t{k} USING (v)
)"""
        )
    parts.append(f"\nSELECT v, label FROM l{n_iter}")
    return "\n".join(parts)


TRIANGLES_SQL = """
WITH und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM und GROUP BY src),
o AS MATERIALIZED (
  SELECT u.src, u.dst
  FROM und u JOIN deg ds ON ds.v = u.src JOIN deg dd ON dd.v = u.dst
  WHERE (ds.deg < dd.deg) OR (ds.deg = dd.deg AND u.src < u.dst)
),
w AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM o e1 JOIN o e2 ON e1.dst = e2.src
)
SELECT count(*) AS n_triangles
FROM w WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.a AND o.dst = w.c)
"""

DEGREES_SQL = (
    "WITH " + EDGES_CTE.strip() + "\nSELECT src AS v, count(*) AS deg FROM edges GROUP BY src"
)

COLSUMS_SQL = (
    "WITH " + EDGES_CTE.strip()
    + "\nSELECT dst AS v, round(sum(w), 6) AS colsum FROM edges GROUP BY dst"
)

KSELECT_SQL = (
    "WITH " + EDGES_CTE.strip()
    + f"""
SELECT dst, src, w FROM (
  SELECT dst, src, w,
         row_number() OVER (PARTITION BY dst ORDER BY w DESC, src ASC) AS rn
  FROM edges
) WHERE rn <= {TOPK}
"""
)

DEDUP_EXACT_SQL = """
SELECT md5(text) AS h, count(*) AS n_dups, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
"""

TEXT_STATS_SQL = """
SELECT doc_id, length(text) AS chars,
       len(string_split(text, ' ')) AS tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Spark query implementations
# ---------------------------------------------------------------------------

def _graph(spark, sf_dir):
    from combblas_spark.sources.tables import link_graph

    return link_graph(spark, sf_dir)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.pagerank import pagerank_fixed

    ranks = pagerank_fixed(spark, _graph(spark, sf_dir), n_iter=PR_ITERS, alpha=ALPHA)
    return ranks.select("v", F.round("rank", 6).alias("rank"))


def q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.components import connected_components

    return connected_components(spark, _graph(spark, sf_dir))


def q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.labelprop import label_propagation

    return label_propagation(spark, _graph(spark, sf_dir), n_iter=LP_ITERS)


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.triangles import triangle_count
    from combblas_spark.graph import Graph
    from combblas_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
        .withColumn("w", F.lit(1.0))
    )
    g = Graph(edges=und, n_partitions=32)
    n = triangle_count(spark, g)
    return spark.createDataFrame([(n,)], schema="n_triangles long")


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _graph(spark, sf_dir).out_degrees()


def q_colsums(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    return g.edges.groupBy(F.col("dst").alias("v")).agg(
        F.round(F.sum("w"), 6).alias("colsum")
    )


def q_kselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    win = Window.partitionBy("dst").orderBy(F.col("w").desc(), F.col("src").asc())
    return (
        g.edges.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TOPK)
        .select("dst", "src", "w")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id")
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("chars"),
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("tokens"),
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: converged PageRank on the sf0.001 link graph."""
    from combblas_spark.algos.pagerank import pagerank
    from combblas_spark.sources.tables import link_graph

    g = link_graph(spark, "/root/testdata/sf0.001")
    res = pagerank(spark, g, tol=1e-6, max_iter=100)
    return res.ranks.select("v", F.round("rank", 6).alias("rank"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank5": q_pagerank,
        "cc": q_cc,
        "labelprop2": q_labelprop,
        "triangles": q_triangles,
        "degrees": q_degrees,
        "colsums": q_colsums,
        "kselect_top2": q_kselect,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank5": _pagerank_sql(PR_ITERS),
        "cc": _cc_sql(CC_ROUNDS),
        "labelprop2": _labelprop_sql(LP_ITERS),
        "triangles": TRIANGLES_SQL,
        "degrees": DEGREES_SQL,
        "colsums": COLSUMS_SQL,
        "kselect_top2": KSELECT_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "text_stats": TEXT_STATS_SQL,
    }
