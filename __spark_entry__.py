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

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

#: pinned oracle fixtures (scripts/make_oracle_fixtures.py) — parquet
#: tables produced by implementations INDEPENDENT of the Spark code
#: (pure-Python XXH64 / pinned scalar SimHash / pure link rule), read
#: by the DuckDB oracle via read_parquet so the seeded-hash queries get
#: full value gates instead of rows-only checks.  Regenerate whenever
#: /root/testdata (sf0.01) or the page generator changes.
_FIXDIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "dist", "oracle_fixtures"
)


def _fixture(name: str) -> str:
    return os.path.join(_FIXDIR, name)

ALPHA = 0.85
PR_ITERS = 5
CC_ROUNDS = 8
KCORE_K = 40       # non-trivial core at sf0.01: 449 of 1600 vertices survive
KCORE_ROUNDS = 4   # oracle unroll depth; fixpoint at 2 rounds, extra rounds idempotent
LP_ITERS = 2
TOPK = 2
BFS_SRC = 0
BFS_LEVELS = 4
SSSP_ROUNDS = 4
SPGEMM_MAX_SRC = 20
JACCARD_N = 3
JACCARD_T = 0.5
CONTAM_N = 8       # contamination-screen shingle width
CONTAM_T = 0.2     # contaminated iff ≥20% of a doc's grams hit the benchmark
CONTAM_BENCH_MOD = 50  # benchmark set = docs with doc_id % 50 == 0
ANN_K = 5
ANN_NQ = 10
KATZ_ALPHA = 0.005  # << 1/λ_max on the link graph; keeps x values O(10)
KATZ_BETA = 1.0
AA_K = 3           # Adamic-Adar candidates kept per query vertex
AA_MAX_SRC = 40    # deterministic query-side slice (part-id space)
COLOR_SEED = 42    # same XXH64 priority chain as the mis gate/fixture
COLOR_ROUNDS = 5   # converges in 3 rounds at sf0.01; extra rounds empty
COLOR_CAP = 4      # rank-offset cap: 13 colors / 4 rounds at sf0.1 vs
                   # pure mex's 14 colors / ~12 rounds (measured)
WALK_LEN = 6       # DeepWalk-style corpus: one length-6 walk per vertex
WALK_SEED = 1
MST_ROUNDS = 4     # Borůvka converges in 2 rounds at sf0.01 AND sf0.1
MST_JUMPS = 6      # per-round pointer-jump unroll (measured ≤ 4, 2^6 depth margin)
BOWTIE_LEVELS = 20  # reach fixpoint at sf0.01: fwd depth 10 / bwd 15 (margin;
                    # the frontier union is monotone, extra levels are no-ops)
HARM_SOURCES = [0, 1, 2, 3]  # harmonic-centrality source batch
HARM_DEPTH = 4     # same truncation depth as the BFS gates
KTRUSS_K = 12      # support >= 10: peels 115729 -> 69588 -> 22275 at sf0.01
KTRUSS_ROUNDS = 2  # both peel rounds non-idempotent at sf0.01 AND sf0.1
TFIDF_K = 3        # salient terms kept per document
ANF_H = 4          # neighborhood-function sketch depth (hops)
PR_INC_ITERS = 3   # warm-start iterations after the crawl delta lands
CMS_W = 64         # Count-Min sketch width (4 rows pinned in sketches.py)
CMS_K = 10         # heavy hitters kept
WSAMPLE_K = 20     # weighted corpus sample size
PR_INC_SPLIT = 10  # base graph = edges with (src + dst) % PR_INC_SPLIT != 0
NS_FANOUTS = (3, 2)  # GraphSAGE-style per-hop sample widths
NS_MAX_ROOT = 20   # deterministic root slice (part-id space)
NS_SEED = 1
SPAN_TOKENS = 5    # C4-style span width for cross-document span dedup
URL_N = 256        # synthetic crawl size for the URL-canonicalization gate
VOCAB_IDS_V = 15   # tokenize-to-ids vocabulary size (most of the corpus OOV)

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


def _wpagerank_sql(n_iter: int) -> str:
    """Weighted-PageRank unroll: the _pagerank_sql recursion with
    deg → Σw and per-edge contributions scaled by w."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        """verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)
),
wdeg AS MATERIALIZED (SELECT src AS v, sum(w) AS wdeg FROM edges GROUP BY src),
vd AS MATERIALIZED (
  SELECT verts.v, coalesce(wdeg.wdeg, 0.0) AS wdeg FROM verts LEFT JOIN wdeg USING (v)
),
params AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT n FROM params) AS rank FROM verts)""",
    ]
    for k in range(1, n_iter + 1):
        prev = f"r{k-1}"
        parts.append(
            f""",
d{k} AS MATERIALIZED (
  SELECT coalesce(sum(p.rank), 0.0) AS mass
  FROM {prev} p JOIN vd USING (v) WHERE vd.wdeg = 0
),
s{k} AS MATERIALIZED (
  SELECT e.dst AS v, sum(p.rank * e.w / vd.wdeg) AS s
  FROM edges e JOIN {prev} p ON e.src = p.v JOIN vd ON vd.v = p.v
  WHERE vd.wdeg > 0
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


PPR_SEEDS = [1, 7, 42]  # customer-side vertices present at every sf


def _ppr_sql(n_iter: int, seeds: list[int]) -> str:
    """Personalized-PageRank unroll: the _pagerank_sql recursion with
    the uniform teleport replaced by the seed indicator t(v)."""
    t = 1.0 / len(seeds)
    in_list = ", ".join(str(s) for s in seeds)
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        f"""verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)
),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src),
vd AS MATERIALIZED (
  SELECT verts.v, coalesce(deg.deg, 0) AS deg,
         CASE WHEN verts.v IN ({in_list}) THEN {t} ELSE 0.0 END AS t
  FROM verts LEFT JOIN deg USING (v)
),
r0 AS MATERIALIZED (SELECT v, t AS rank FROM vd)""",
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
  SELECT vd.v,
         (1 - {ALPHA}) * vd.t
         + {ALPHA} * (coalesce(s{k}.s, 0.0) + (SELECT mass FROM d{k}) * vd.t) AS rank
  FROM vd LEFT JOIN s{k} ON vd.v = s{k}.v
)"""
        )
    parts.append(f"\nSELECT v, round(rank, 6) AS rank FROM r{n_iter}")
    return "\n".join(parts)


def _hits_sql(n_iter: int) -> str:
    """HITS unroll: alternating L1-normalized hub/authority updates on
    the distinct edge set — the exact recursion of algos/hits.py."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        """dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM dedges UNION ALL SELECT dst AS v FROM dedges)
),
h0 AS MATERIALIZED (SELECT v, 1.0 AS hub FROM verts)""",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
ar{k} AS MATERIALIZED (
  SELECT e.dst AS v, sum(h.hub) AS a
  FROM dedges e JOIN h{k-1} h ON e.src = h.v GROUP BY e.dst
),
a{k} AS MATERIALIZED (
  SELECT verts.v, coalesce(ar{k}.a, 0.0) / (SELECT sum(a) FROM ar{k}) AS auth
  FROM verts LEFT JOIN ar{k} USING (v)
),
hr{k} AS MATERIALIZED (
  SELECT e.src AS v, sum(a.auth) AS h
  FROM dedges e JOIN a{k} a ON e.dst = a.v GROUP BY e.src
),
h{k} AS MATERIALIZED (
  SELECT verts.v, coalesce(hr{k}.h, 0.0) / (SELECT sum(h) FROM hr{k}) AS hub
  FROM verts LEFT JOIN hr{k} USING (v)
)"""
        )
    parts.append(
        f"""
SELECT h.v, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
FROM h{n_iter} h JOIN a{n_iter} a USING (v)"""
    )
    return "\n".join(parts)


def _katz_sql(n_iter: int, alpha: float, beta: float) -> str:
    """Truncated-Katz unroll: x_k = β + α·Σ_{u→v} w·x_{k-1}(u), x_0 = β
    — the exact affine SpMV recursion of algos/katz.py."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        f"""verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)
),
x0 AS MATERIALIZED (SELECT v, {beta} AS x FROM verts)""",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
s{k} AS MATERIALIZED (
  SELECT e.dst AS v, sum(e.w * x.x) AS s
  FROM edges e JOIN x{k-1} x ON e.src = x.v GROUP BY e.dst
),
x{k} AS MATERIALIZED (
  SELECT verts.v, {beta} + {alpha} * coalesce(s{k}.s, 0.0) AS x
  FROM verts LEFT JOIN s{k} USING (v)
)"""
        )
    parts.append(f"\nSELECT v, round(x, 6) AS katz FROM x{n_iter}")
    return "\n".join(parts)


def _salsa_sql(n_iter: int) -> str:
    """SALSA unroll: the _hits_sql recursion with each vote split by
    the sender's degree (hub/outdeg on the auth step, auth/indeg on the
    hub step) — the exact recursion of algos/hits.py::salsa_fixed."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        """dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM dedges UNION ALL SELECT dst AS v FROM dedges)
),
od AS MATERIALIZED (SELECT src AS v, count(*) AS od FROM dedges GROUP BY src),
idg AS MATERIALIZED (SELECT dst AS v, count(*) AS idg FROM dedges GROUP BY dst),
h0 AS MATERIALIZED (SELECT v, 1.0 AS hub FROM verts)""",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
ar{k} AS MATERIALIZED (
  SELECT e.dst AS v, sum(h.hub / od.od) AS a
  FROM dedges e JOIN h{k-1} h ON e.src = h.v JOIN od ON od.v = e.src
  GROUP BY e.dst
),
a{k} AS MATERIALIZED (
  SELECT verts.v, coalesce(ar{k}.a, 0.0) / (SELECT sum(a) FROM ar{k}) AS auth
  FROM verts LEFT JOIN ar{k} USING (v)
),
hr{k} AS MATERIALIZED (
  SELECT e.src AS v, sum(a.auth / idg.idg) AS h
  FROM dedges e JOIN a{k} a ON e.dst = a.v JOIN idg ON idg.v = e.dst
  GROUP BY e.src
),
h{k} AS MATERIALIZED (
  SELECT verts.v, coalesce(hr{k}.h, 0.0) / (SELECT sum(h) FROM hr{k}) AS hub
  FROM verts LEFT JOIN hr{k} USING (v)
)"""
        )
    parts.append(
        f"""
SELECT h.v, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
FROM h{n_iter} h JOIN a{n_iter} a USING (v)"""
    )
    return "\n".join(parts)


def _adamic_adar_sql(k: int, max_src: int) -> str:
    """Adamic-Adar top-k over the co-purchase graph (the same ``und``
    the triangle gates use): wedge join through the common neighbor z,
    1/ln(global degree) votes, complement-of-A mask, score rounded
    BEFORE the rank window so FP noise can't flip a top-k boundary —
    the exact pipeline of algos/linkpred.py."""
    return f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM und GROUP BY src),
wdg AS MATERIALIZED (
  SELECT e1.src AS u, e1.dst AS z, e2.dst AS v
  FROM und e1 JOIN und e2 ON e1.dst = e2.src
  WHERE e1.src <= {max_src} AND e1.src <> e2.dst
),
sc AS MATERIALIZED (
  SELECT w.u, w.v, sum(1.0 / ln(d.deg)) AS s
  FROM wdg w JOIN deg d ON d.v = w.z
  GROUP BY w.u, w.v
),
masked AS MATERIALIZED (
  SELECT u, v, round(s, 6) AS score FROM sc
  WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.src = sc.u AND und.dst = sc.v)
)
SELECT u, v, score FROM (
  SELECT u, v, score,
         row_number() OVER (PARTITION BY u ORDER BY score DESC, v ASC) AS rn
  FROM masked
) WHERE rn <= {k}
"""


def _pr_unroll(prefix: str, edges: str, n_iter: int, start: str) -> str:
    """PageRank recursion as chained CTEs with ``prefix``-scoped names,
    iterating over CTEs ``{prefix}verts/vd/params`` and edge CTE
    ``edges`` from rank CTE ``start``."""
    out = []
    prev = start
    for k in range(1, n_iter + 1):
        out.append(
            f""",
{prefix}d{k} AS MATERIALIZED (
  SELECT coalesce(sum(p.rank), 0.0) AS mass
  FROM {prev} p JOIN {prefix}vd USING (v) WHERE {prefix}vd.deg = 0
),
{prefix}s{k} AS MATERIALIZED (
  SELECT e.dst AS v, sum(p.rank / vd.deg) AS s
  FROM {edges} e JOIN {prev} p ON e.src = p.v
  JOIN {prefix}vd vd ON vd.v = p.v
  WHERE vd.deg > 0
  GROUP BY e.dst
),
{prefix}r{k} AS MATERIALIZED (
  SELECT {prefix}verts.v,
         (1 - {ALPHA}) / (SELECT n FROM {prefix}params)
         + {ALPHA} * (coalesce({prefix}s{k}.s, 0.0)
                      + (SELECT mass FROM {prefix}d{k})
                        / (SELECT n FROM {prefix}params)) AS rank
  FROM {prefix}verts LEFT JOIN {prefix}s{k} ON {prefix}verts.v = {prefix}s{k}.v
)"""
        )
        prev = f"{prefix}r{k}"
    return "".join(out)


def _pagerank_inc_sql(base_iters: int, warm_iters: int, split: int) -> str:
    """Incremental / warm-start PageRank (algos/pagerank.py
    pagerank_warm): base-graph unroll → crawl delta lands → warm init
    (prior ranks carried over, 1/n for new vertices, L1-renormalized)
    → warm unroll over the grown graph."""
    base_graph = f"""
bedges AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE (src + dst) % {split} <> 0
),
bverts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM bedges
                          UNION ALL SELECT dst AS v FROM bedges)
),
bdeg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM bedges GROUP BY src),
bvd AS MATERIALIZED (
  SELECT bverts.v, coalesce(bdeg.deg, 0) AS deg FROM bverts LEFT JOIN bdeg USING (v)
),
bparams AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM bverts),
br0 AS MATERIALIZED (
  SELECT v, 1.0 / (SELECT n FROM bparams) AS rank FROM bverts
)"""
    union_graph = f""",
wverts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges
                          UNION ALL SELECT dst AS v FROM edges)
),
wdeg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src),
wvd AS MATERIALIZED (
  SELECT wverts.v, coalesce(wdeg.deg, 0) AS deg FROM wverts LEFT JOIN wdeg USING (v)
),
wparams AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM wverts),
wpre AS MATERIALIZED (
  SELECT wverts.v, coalesce(b.rank, 1.0 / (SELECT n FROM wparams)) AS rank
  FROM wverts LEFT JOIN br{base_iters} b USING (v)
),
wtot AS MATERIALIZED (SELECT sum(rank) AS t FROM wpre),
wr0 AS MATERIALIZED (SELECT v, rank / (SELECT t FROM wtot) AS rank FROM wpre)"""
    return (
        "WITH " + EDGES_CTE.strip() + ","
        + base_graph
        + _pr_unroll("b", "bedges", base_iters, "br0")
        + union_graph
        + _pr_unroll("w", "edges", warm_iters, "wr0")
        + f"\nSELECT v, round(rank, 6) AS rank FROM wr{warm_iters}"
    )


def _jaccard_links_sql(k: int, max_src: int) -> str:
    """Jaccard link prediction (algos/linkpred.py jaccard_topk): the
    same wedge join as Adamic-Adar with a constant-1 semiring and a
    union-size normalization — common / (deg(u) + deg(v) - common),
    complement-of-A mask, score rounded BEFORE the rank window."""
    return f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM und GROUP BY src),
cn AS MATERIALIZED (
  SELECT e1.src AS u, e2.dst AS v, count(*) AS cn
  FROM und e1 JOIN und e2 ON e1.dst = e2.src
  WHERE e1.src <= {max_src} AND e1.src <> e2.dst
  GROUP BY e1.src, e2.dst
),
sc AS MATERIALIZED (
  SELECT cn.u, cn.v,
         round(CAST(cn.cn AS DOUBLE) / (du.deg + dv.deg - cn.cn), 6) AS score
  FROM cn JOIN deg du ON du.v = cn.u JOIN deg dv ON dv.v = cn.v
),
masked AS MATERIALIZED (
  SELECT u, v, score FROM sc
  WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.src = sc.u AND und.dst = sc.v)
)
SELECT u, v, score FROM (
  SELECT u, v, score,
         row_number() OVER (PARTITION BY u ORDER BY score DESC, v ASC) AS rn
  FROM masked
) WHERE rn <= {k}
"""


def _anf_sql(h: int) -> str:
    """ANF / neighborhood function (algos/anf.py): the OR-semiring
    SpMV unrolled — per-vertex Flajolet-Martin registers from the
    pinned affine hash chain, ``bit_or`` merges over neighbors per hop,
    and the 2^(mean lowest-zero-bit)/φ estimate grouped on the integer
    register sum so the float total is order-insensitive."""
    from combblas_spark.algos.anf import CONSTS, MAX_BIT, P, PHI, R

    regs = []
    for r, (a, b) in enumerate(CONSTS):
        hh = f"(({a} * v + {b}) % {P})"
        pos = f"least(bit_count(({hh} & -({hh})) - 1), {MAX_BIT})"
        regs.append(f"CAST(1 AS BIGINT) << ({pos}) AS m{r}")
    reg_cols = ",\n         ".join(regs)
    tsum = " + ".join(f"(bit_count(xor(m{r}, m{r} + 1)) - 1)" for r in range(R))
    parts = [
        f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
b0 AS MATERIALIZED (
  SELECT v, {reg_cols}
  FROM (SELECT DISTINCT src AS v FROM und)
)"""
    ]
    for s in range(1, h + 1):
        ors = ", ".join(f"bit_or(b.m{r}) AS o{r}" for r in range(R))
        merged = ", ".join(
            f"(p.m{r} | coalesce(c.o{r}, 0)) AS m{r}" for r in range(R)
        )
        parts.append(
            f""",
c{s} AS MATERIALIZED (
  SELECT e.src AS v, {ors}
  FROM und e JOIN b{s - 1} b ON e.dst = b.v GROUP BY e.src
),
b{s} AS MATERIALIZED (
  SELECT p.v, {merged} FROM b{s - 1} p LEFT JOIN c{s} c USING (v)
)"""
        )
    ests = []
    for s in range(h + 1):
        ests.append(
            f"""
SELECT {s} AS hop, round(sum(cnt * pow(2.0, tsum / {float(R)})) / {PHI}, 2) AS nf
FROM (SELECT tsum, count(*) AS cnt
      FROM (SELECT ({tsum}) AS tsum FROM b{s}) GROUP BY tsum)"""
        )
    parts.append("\nUNION ALL".join(ests))
    return "".join(parts)


def _neigh_sample_sql(fanouts: tuple[int, ...], max_root: int, seed: int) -> str:
    """GraphSAGE-style sampled message-flow blocks (algos/sampling.py):
    per-hop top-fanout adjacency by the multiplicative pairwise hash
    (exact 64-bit SQL, no fixture), expanded from the capped root set;
    the oracle replays the identical sample and expansion joins."""
    from combblas_spark.algos.sampling import A, B, C, P

    parts = [
        """
WITH und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)"""
    ]
    for k, f in enumerate(fanouts, start=1):
        pr = (
            f"((({A} * src + {B} * {seed + k}) % {P})"
            f" * (({C} * dst) % {P})) % {P}"
        )
        parts.append(
            f""",
adj{k} AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY {pr} ASC, dst ASC) AS rn
    FROM und) WHERE rn <= {f}
)"""
        )
    parts.append(
        f""",
h1 AS MATERIALIZED (
  SELECT r.v AS root, 1 AS hop, a.src, a.dst
  FROM (SELECT DISTINCT src AS v FROM und WHERE src <= {max_root}) r
  JOIN adj1 a ON a.src = r.v
)"""
    )
    for k in range(2, len(fanouts) + 1):
        parts.append(
            f""",
h{k} AS MATERIALIZED (
  SELECT DISTINCT p.root, {k} AS hop, a.src, a.dst
  FROM h{k - 1} p JOIN adj{k} a ON a.src = p.dst
)"""
        )
    sel = "\nUNION ALL ".join(
        f"SELECT root, hop, src, dst FROM h{k}"
        for k in range(1, len(fanouts) + 1)
    )
    parts.append("\n" + sel)
    return "".join(parts)


def _heavy_hitters_sql(width: int, k: int) -> str:
    """Count-Min heavy hitters (algos/sketches.py cms_heavy_hitters)
    over the co-purchase dst stream: the d×w sketch, per-key MIN across
    rows, rank — all integer arithmetic on the pinned affine chain."""
    from combblas_spark.algos.sketches import CMS_CONSTS, P

    bcols = ",\n         ".join(
        f"(({a} * key + {b}) % {P}) % {width} AS b{r}"
        for r, (a, b) in enumerate(CMS_CONSTS)
    )
    sks = ",\n".join(
        f"sk{r} AS MATERIALIZED (SELECT b{r} AS bucket, count(*) AS c{r} "
        f"FROM b GROUP BY b{r})"
        for r in range(len(CMS_CONSTS))
    )
    joins = "\n  ".join(
        f"JOIN sk{r} s{r} ON s{r}.bucket = cand.b{r}"
        for r in range(len(CMS_CONSTS))
    )
    least = ", ".join(f"s{r}.c{r}" for r in range(len(CMS_CONSTS)))
    return f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
b AS MATERIALIZED (
  SELECT key, {bcols}
  FROM (SELECT dst AS key FROM und)
),
{sks},
cand AS MATERIALIZED (SELECT DISTINCT * FROM b),
est AS MATERIALIZED (
  SELECT cand.key, least({least}) AS est
  FROM cand
  {joins}
)
SELECT key, est FROM (
  SELECT key, est, row_number() OVER (ORDER BY est DESC, key ASC) AS rn
  FROM est
) WHERE rn <= {k}
"""


def _wsample_sql(k: int) -> str:
    """Efraimidis-Spirakis weighted sample (algos/sketches.py
    weighted_sample) of documents by n_chars: top-k u^(1/w) draw keys,
    the uniform draw replayed from the pinned affine chain."""
    from combblas_spark.algos.sketches import P, WS_A, WS_B

    return f"""
SELECT doc_id, w FROM (
  SELECT doc_id, n_chars AS w,
         pow((CAST(({WS_A} * doc_id + {WS_B}) % {P} AS DOUBLE) + 1.0)
             / ({P} + 1.0), 1.0 / n_chars) AS draw
  FROM documents
) ORDER BY draw DESC, doc_id ASC LIMIT {k}
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter gate (algos/sketches.py): top-10 hub
    vertices of the co-purchase dst stream by CMS estimate — the
    fixed-space hub detector the skew trigger wants at corpus scale."""
    from combblas_spark.algos.sketches import cms_heavy_hitters

    keys = _copurchase_graph(spark, sf_dir).edges.select(
        F.col("dst").alias("key")
    )
    return cms_heavy_hitters(spark, keys, width=CMS_W, k=CMS_K)


def q_wsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-sampling gate (algos/sketches.py): 20 documents drawn
    proportional to length without replacement (Efraimidis-Spirakis) —
    the corpus-subsampling primitive."""
    from combblas_spark.algos.sketches import weighted_sample

    docs = _docs(spark, sf_dir).select("doc_id", F.col("n_chars").alias("w"))
    return weighted_sample(spark, docs, k=WSAMPLE_K, key_col="doc_id")


def _eff_diam_sql(h: int, q: float) -> str:
    """q-effective diameter over the ANF table (algos/anf.py
    effective_diameter_df): the same window interpolation replayed over
    the _anf_sql estimate rows."""
    anf = _anf_sql(h)
    return f"""
WITH anf AS MATERIALIZED (
{anf}
),
t AS MATERIALIZED (
  SELECT hop, nf,
         {q} * max(nf) OVER () AS target,
         lag(nf) OVER (ORDER BY hop) AS prev
  FROM anf
),
c AS MATERIALIZED (
  SELECT hop, nf, target, prev,
         row_number() OVER (ORDER BY hop) AS rn
  FROM t WHERE nf >= target
)
SELECT round(CASE WHEN hop = 0 THEN 0.0
             ELSE hop - 1 + (target - prev) / (nf - prev) END, 4)
       AS eff_diameter
FROM c WHERE rn = 1
"""


def q_eff_diam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-diameter gate: the 0.9-quantile interpolated hop from
    the ANF sketch table (the headline statistic ANF/HyperANF exist to
    produce on web graphs)."""
    from combblas_spark.algos.anf import effective_diameter_df

    return effective_diameter_df(
        spark, _copurchase_graph(spark, sf_dir), h=ANF_H, q=0.9
    )


_URL_CANON_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "lower(url), '^[a-z]+://', ''), '^www\\.', ''), '[#?].*$', ''), '/$', '')"
)


def _url_dedup_sql(n: int) -> str:
    """URL canonicalization + recrawl dedup (pipeline/web.py): the
    synthetic crawl re-derived from the pure url rule
    (sources/pages.py page_url) plus the two deterministic variant
    families the Spark gate derives, collapsed through the identical
    regexp canonicalization chain (URL_CANON_STEPS)."""
    return f"""
WITH ids AS MATERIALIZED (SELECT i FROM generate_series(0, {n - 1}) t(i)),
base AS MATERIALIZED (
  SELECT 'https://site' || (i % 97) || '.example/p' || i AS url, i AS ver
  FROM ids
),
crawls AS MATERIALIZED (
  SELECT url, ver FROM base
  UNION ALL
  SELECT 'HTTPS://WWW.' || upper('site' || (i % 97) || '.example/p' || i)
         || '/?utm_source=rss#frag' AS url, i + 1000000 AS ver
  FROM ids WHERE i % 3 = 0
  UNION ALL
  SELECT 'http://site' || (i % 97) || '.example/p' || i || '#top' AS url,
         i + 2000000 AS ver
  FROM ids WHERE i % 7 = 0
)
SELECT canon_url, count(*) AS n_crawls, max(ver) AS last_ver
FROM (SELECT {_URL_CANON_SQL} AS canon_url, ver FROM crawls)
GROUP BY canon_url
"""


def _span_dedup_sql(span_tokens: int) -> str:
    """Cross-document span-dedup survivorship (pipeline/web.py
    span_dedup): non-overlapping ``span_tokens``-token spans, corpus-
    wide first occurrence by (doc_id, span_idx), per-doc keep stats."""
    w = span_tokens
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
u AS MATERIALIZED (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM t
),
s AS MATERIALIZED (
  SELECT doc_id, CAST((ord - 1) // {w} AS BIGINT) AS span_idx,
         string_agg(tok, ' ' ORDER BY ord) AS span
  FROM u GROUP BY doc_id, (ord - 1) // {w}
),
k AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
  FROM s
)
SELECT doc_id, count(*) AS n_spans,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
       round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS keep_frac
FROM k GROUP BY doc_id
"""


def _token_ids_sql(vocab_size: int) -> str:
    """Corpus tokenization to ids (pipeline/text.py tokenize_ids):
    top-V vocabulary by (count desc, token asc) with rank ids, OOV→0,
    per-doc id sequence reassembled in position order."""
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
u AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok
  FROM t
),
counts AS MATERIALIZED (SELECT tok, count(*) AS cnt FROM u GROUP BY tok),
vocab AS MATERIALIZED (
  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS id
  FROM counts ORDER BY cnt DESC, tok ASC LIMIT {vocab_size}
),
enc AS MATERIALIZED (
  SELECT u.doc_id, u.pos, coalesce(v.id, 0) AS tid
  FROM u LEFT JOIN vocab v USING (tok)
)
SELECT doc_id, count(*) AS n_tokens,
       sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS n_oov,
       string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids
FROM enc GROUP BY doc_id
"""


def _pii_scrub_sql() -> str:
    """PII scrub (pipeline/web.py): deterministic PII injection from
    doc_id arithmetic (both engines build the identical string), then
    the same RE2/Java-compatible patterns counted on the original text
    and replaced in declaration order; the scrubbed text is compared
    via md5."""
    from combblas_spark.pipeline.web import PII_PATTERNS

    (_, em_pat, em_rep), (_, ip_pat, ip_rep), (_, ph_pat, ph_rep) = PII_PATTERNS
    return f"""
WITH inj AS MATERIALIZED (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' contact user' || (doc_id % 50) || '@mail'
                      || (doc_id % 7) || '.example'
                 ELSE '' END
         || CASE WHEN doc_id % 3 > 0
                 THEN ' ip 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
                 ELSE '' END
         || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || CASE WHEN doc_id % 5 = 0
                 THEN ' or +1-555-' || lpad(CAST((doc_id + 1) % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         AS txt
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(txt, '{em_pat}')) AS n_email,
       len(regexp_extract_all(txt, '{ip_pat}')) AS n_ip,
       len(regexp_extract_all(txt, '{ph_pat}')) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(
           txt, '{em_pat}', '{em_rep}', 'g'),
                '{ip_pat}', '{ip_rep}', 'g'),
                '{ph_pat}', '{ph_rep}', 'g')) AS scrub_md5
FROM inj
"""


RECIP_ASSORT_SQL = """
WITH de AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
   AND a.l_partkey <> b.l_partkey
),
od AS MATERIALIZED (SELECT src AS v, count(*) AS od FROM de GROUP BY src),
idg AS MATERIALIZED (SELECT dst AS v, count(*) AS idg FROM de GROUP BY dst),
st AS MATERIALIZED (
  SELECT avg(CASE WHEN EXISTS (
           SELECT 1 FROM de r WHERE r.src = e.dst AND r.dst = e.src
         ) THEN 1.0 ELSE 0.0 END) AS r,
         avg(CAST(od.od AS DOUBLE)) AS mx, avg(CAST(idg.idg AS DOUBLE)) AS my,
         avg(CAST(od.od AS DOUBLE) * idg.idg) AS mxy,
         avg(CAST(od.od AS DOUBLE) * od.od) AS mxx,
         avg(CAST(idg.idg AS DOUBLE) * idg.idg) AS myy
  FROM de e JOIN od ON od.v = e.src JOIN idg ON idg.v = e.dst
)
SELECT round(r, 6) AS reciprocity,
       round(CASE WHEN mxx - mx*mx > 0 AND myy - my*my > 0
                  THEN (mxy - mx*my) / (sqrt(mxx - mx*mx) * sqrt(myy - my*my))
             END, 6) AS assortativity
FROM st
"""


def _walks_sql(walk_len: int, seed: int) -> str:
    """Random-walk corpus unroll (algos/walks.py): per step the next
    hop is the neighbor minimizing the multiplicative pairwise hash
    ((A·walk + seed) mod P) · ((C·dst + B·t) mod P) mod P — both
    factors reduced below 2³¹ first, so the arithmetic is exact plain
    SQL on both engines and the oracle replays the identical choice
    sequence with no pinned fixture."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        "s0 AS MATERIALIZED (SELECT DISTINCT src AS walk, src AS at FROM sedges)",
    ]
    for t in range(1, walk_len + 1):
        parts.append(
            f""",
s{t} AS MATERIALIZED (
  SELECT walk, dst AS at FROM (
    SELECT f.walk, e.dst,
           row_number() OVER (
             PARTITION BY f.walk
             ORDER BY (((1103515245 * f.walk + {seed}) % 2147483647)
                       * ((1013904223 * e.dst + {12_345 * t}) % 2147483647))
                      % 2147483647, e.dst
           ) AS rn
    FROM sedges e JOIN s{t-1} f ON e.src = f.at
  ) WHERE rn = 1
)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT walk, {t} AS step, at AS v FROM s{t}" for t in range(walk_len + 1)
    )
    parts.append("\n" + union)
    return "\n".join(parts)


def _mst_sql(rounds: int, jumps: int) -> str:
    """Borůvka unroll (algos/mst.py): per round each component's min
    outgoing edge under (w, u, v), mutual-pair hooks broken at the
    smaller id, then ``jumps`` pointer-jump compositions contract the
    hook forest (idempotent at the fixpoint — roots map to themselves,
    so extra jumps and extra rounds are no-ops)."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        """e0 AS MATERIALIZED (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v, min(w) AS w
  FROM edges GROUP BY 1, 2
),
cp0 AS MATERIALIZED (
  SELECT x AS vtx, x AS c FROM (
    SELECT u AS x FROM e0 UNION SELECT v AS x FROM e0
  )
)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
cr{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.w, a.c AS cu, b.c AS cv
  FROM e0 e JOIN cp{r-1} a ON a.vtx = e.u JOIN cp{r-1} b ON b.vtx = e.v
  WHERE a.c <> b.c
),
cd{r} AS MATERIALIZED (
  SELECT cu AS c, cv AS oc, w, u, v FROM cr{r}
  UNION ALL SELECT cv AS c, cu AS oc, w, u, v FROM cr{r}
),
sl{r} AS MATERIALIZED (
  SELECT c, oc, w, u, v FROM (
    SELECT *, row_number() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM cd{r}
  ) WHERE rn = 1
),
pr{r} AS MATERIALIZED (
  SELECT s.c,
         CASE WHEN q.oc = s.c AND s.c < s.oc THEN s.c ELSE s.oc END AS p
  FROM sl{r} s LEFT JOIN sl{r} q ON q.c = s.oc
),
p{r}_0 AS MATERIALIZED (
  SELECT d.c, coalesce(pr.p, d.c) AS p
  FROM (SELECT DISTINCT c FROM cp{r-1}) d LEFT JOIN pr{r} pr ON pr.c = d.c
)"""
        )
        for j in range(1, jumps + 1):
            parts.append(
                f""",
p{r}_{j} AS MATERIALIZED (
  SELECT x.c, y.p FROM p{r}_{j-1} x JOIN p{r}_{j-1} y ON x.p = y.c
)"""
            )
        parts.append(
            f""",
cp{r} AS MATERIALIZED (
  SELECT m.vtx, y.p AS c FROM cp{r-1} m JOIN p{r}_{jumps} y ON y.c = m.c
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT u, v, w FROM sl{r}" for r in range(1, rounds + 1)
    )
    parts.append(f"\nSELECT DISTINCT u, v, w FROM (\n  {union}\n)")
    return "\n".join(parts)


def _bowtie_sql(levels: int) -> str:
    """Bowtie oracle (algos/bowtie.py): rebuild the thinned directed
    event graph with the identical SQL rule, pick the max-out-degree
    root, then unroll BOTH reachability sweeps ``levels`` deep (the
    running set is monotone, so levels past the fixpoint are no-ops)
    and case-split CORE/IN/OUT/OTHER."""
    parts = [
        """WITH tedges AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM events a JOIN events b
    ON a.event_type = b.event_type AND b.event_id = a.event_id + 1
  WHERE a.user_id <> b.user_id
    AND (a.user_id * 131 + b.user_id * 17) % 7 = 0
),
rt AS MATERIALIZED (
  SELECT src AS r FROM tedges GROUP BY src
  ORDER BY count(*) DESC, src LIMIT 1
),
fw0 AS MATERIALIZED (SELECT r AS v FROM rt),
bw0 AS MATERIALIZED (SELECT r AS v FROM rt)""",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f""",
fw{k} AS MATERIALIZED (
  SELECT v FROM fw{k-1}
  UNION
  SELECT e.dst AS v FROM tedges e JOIN fw{k-1} x ON e.src = x.v
),
bw{k} AS MATERIALIZED (
  SELECT v FROM bw{k-1}
  UNION
  SELECT e.src AS v FROM tedges e JOIN bw{k-1} x ON e.dst = x.v
)"""
        )
    parts.append(
        f""",
verts AS MATERIALIZED (
  SELECT src AS v FROM tedges UNION SELECT dst AS v FROM tedges
)
SELECT verts.v,
       CASE WHEN f.v IS NOT NULL AND b.v IS NOT NULL THEN 'CORE'
            WHEN b.v IS NOT NULL THEN 'IN'
            WHEN f.v IS NOT NULL THEN 'OUT'
            ELSE 'OTHER' END AS region
FROM verts
LEFT JOIN fw{levels} f ON f.v = verts.v
LEFT JOIN bw{levels} b ON b.v = verts.v"""
    )
    return "\n".join(parts)


def _harmonic_sql(sources: list[int], depth: int) -> str:
    """Harmonic-centrality unroll: one multi-source BFS over the
    symmetrized link graph — the (s, v) frontier advances exactly like
    _bfs_sql's with the source id carried along, then H(v) = Σ 1/depth
    over the reached pairs (depth 0, v = s itself, excluded) — the
    exact recursion of algos/harmonic.py."""
    vals = ", ".join(f"({s})" for s in sources)
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        f"""v0 AS MATERIALIZED (
  SELECT s, s AS v, 0 AS depth FROM (VALUES {vals}) t(s)
),
f0 AS MATERIALIZED (SELECT s, v FROM v0)""",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f""",
c{d} AS MATERIALIZED (
  SELECT DISTINCT f.s, e.dst AS v
  FROM sedges e JOIN f{d-1} f ON e.src = f.v
),
n{d} AS MATERIALIZED (
  SELECT c.s, c.v, {d} AS depth
  FROM c{d} c LEFT JOIN v{d-1} p ON p.s = c.s AND p.v = c.v
  WHERE p.v IS NULL
),
v{d} AS MATERIALIZED (SELECT * FROM v{d-1} UNION ALL SELECT * FROM n{d}),
f{d} AS MATERIALIZED (SELECT s, v FROM n{d})"""
        )
    parts.append(
        f"""
SELECT v, round(sum(1.0 / depth), 6) AS harmonic
FROM v{depth} WHERE depth > 0 GROUP BY v"""
    )
    return "\n".join(parts)


def _ktruss_sql(k: int, rounds: int) -> str:
    """k-truss peel unroll on the co-purchase graph: each round counts
    per-edge triangle support (common neighbors of the edge's endpoints
    in the SURVIVING subgraph) and keeps edges with support ≥ k−2 — the
    exact peel sequence of algos/truss.py (where support comes from the
    oriented wedge pipeline; per-edge triangle credit == common-neighbor
    count, so the two formulations agree edge-for-edge)."""
    parts = [
        """WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
adj{r} AS MATERIALIZED (
  SELECT u AS a, v AS b FROM e{r-1} UNION ALL SELECT v AS a, u AS b FROM e{r-1}
),
sup{r} AS MATERIALIZED (
  SELECT e.u, e.v, count(*) AS c
  FROM e{r-1} e JOIN adj{r} x ON x.a = e.u JOIN adj{r} y ON y.a = e.v AND y.b = x.b
  GROUP BY e.u, e.v
),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r-1} e
  JOIN sup{r} s ON s.u = e.u AND s.v = e.v AND s.c >= {k - 2}
)"""
        )
    parts.append(f"\nSELECT u, v FROM e{rounds}")
    return "\n".join(parts)


def _kcore_sql(k: int, rounds: int) -> str:
    """Peel unroll: each round recomputes degrees on the surviving edge
    set and drops deg < k vertices; idempotent past the fixpoint, so
    ``rounds`` only needs to be ≥ the sf0.01 peel depth."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        "e0 AS MATERIALIZED (SELECT src, dst FROM sedges)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
k{r} AS MATERIALIZED (
  SELECT src AS v, count(*) AS deg FROM e{r-1} GROUP BY src HAVING count(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r-1} e JOIN k{r} a ON e.src = a.v JOIN k{r} b ON e.dst = b.v
)"""
        )
    parts.append(f"\nSELECT v, deg FROM k{rounds}")
    return "\n".join(parts)


def _pagerank_sql(
    n_iter: int, edges_cte: str = EDGES_CTE, final_sql: str | None = None
) -> str:
    """PageRank unroll; ``final_sql`` replaces the default final select
    (it sees CTE ``r{n_iter}`` and must start with its own ``,`` if it
    adds CTEs) so downstream consumers can join the converged ranks."""
    parts = [
        "WITH " + edges_cte.strip() + ",",
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
    parts.append(
        final_sql
        if final_sql is not None
        else f"\nSELECT v, round(rank, 6) AS rank FROM r{n_iter}"
    )
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


#: weighted symmetrization keeping max weight (Graph.symmetrize semantics)
WSYM_CTE = """
wsedges AS MATERIALIZED (
  SELECT src, dst, max(w) AS w FROM (
    SELECT src, dst, w FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM edges
  ) GROUP BY src, dst
)"""


def _bfs_sql(levels: int, src: int) -> str:
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        f"""p0 AS MATERIALIZED (SELECT {src} AS v, {src} AS parent, 0 AS level),
f0 AS MATERIALIZED (SELECT v FROM p0)""",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS v, max(e.src) AS parent
  FROM sedges e JOIN f{k-1} f ON e.src = f.v
  GROUP BY e.dst
),
n{k} AS MATERIALIZED (
  SELECT c.v, c.parent, {k} AS level
  FROM c{k} c LEFT JOIN p{k-1} p ON c.v = p.v WHERE p.v IS NULL
),
p{k} AS MATERIALIZED (SELECT * FROM p{k-1} UNION ALL SELECT * FROM n{k}),
f{k} AS MATERIALIZED (SELECT v FROM n{k})"""
        )
    parts.append(f"\nSELECT v, parent, level FROM p{levels}")
    return "\n".join(parts)


def _bfs_child_sql(levels: int, src: int) -> str:
    """single_child_bfs oracle: the bfs unroll plus the per-level
    fringe.Uniq representative (min child per parent,
    SingleChildBFS.cpp:280-281)."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        f"""p0 AS MATERIALIZED (
  SELECT {src} AS v, {src} AS parent, 0 AS level, TRUE AS single_child),
f0 AS MATERIALIZED (SELECT v FROM p0)""",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS v, max(e.src) AS parent
  FROM sedges e JOIN f{k-1} f ON e.src = f.v
  GROUP BY e.dst
),
n{k} AS MATERIALIZED (
  SELECT c.v, c.parent, {k} AS level
  FROM c{k} c LEFT JOIN p{k-1} p ON c.v = p.v WHERE p.v IS NULL
),
s{k} AS MATERIALIZED (
  SELECT v, parent, level,
         v = min(v) OVER (PARTITION BY parent) AS single_child
  FROM n{k}
),
p{k} AS MATERIALIZED (SELECT * FROM p{k-1} UNION ALL SELECT * FROM s{k}),
f{k} AS MATERIALIZED (SELECT v FROM n{k})"""
        )
    parts.append(f"\nSELECT v, parent, level, single_child FROM p{levels}")
    return "\n".join(parts)


def _bfs_rand_sql(levels: int, src: int) -> str:
    """random_parent_bfs oracle: the bfs unroll with min-priority parent
    selection (SelectRandSRing, RandomParentBFS.cpp:92-117); the seeded
    XXH64 priorities come from the pinned fixture (pure-Python/numpy
    chain — not SQL-expressible), the BFS itself is re-derived in SQL."""
    pri = _fixture("bfs_rand_priorities.parquet")
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        f"""pri AS MATERIALIZED (
  SELECT src, dst, level, pri FROM read_parquet('{pri}')),
p0 AS MATERIALIZED (SELECT {src} AS v, {src} AS parent, 0 AS level),
f0 AS MATERIALIZED (SELECT v FROM p0)""",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS v, arg_min(e.src, x.pri) AS parent
  FROM sedges e JOIN f{k-1} f ON e.src = f.v
  JOIN pri x ON x.src = e.src AND x.dst = e.dst AND x.level = {k}
  GROUP BY e.dst
),
n{k} AS MATERIALIZED (
  SELECT c.v, c.parent, {k} AS level
  FROM c{k} c LEFT JOIN p{k-1} p ON c.v = p.v WHERE p.v IS NULL
),
p{k} AS MATERIALIZED (SELECT * FROM p{k-1} UNION ALL SELECT * FROM n{k}),
f{k} AS MATERIALIZED (SELECT v FROM n{k})"""
        )
    parts.append(f"\nSELECT v, parent, level FROM p{levels}")
    return "\n".join(parts)


def _sssp_sql(rounds: int, src: int) -> str:
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        f"d0 AS MATERIALIZED (SELECT CAST({src} AS BIGINT) AS v, 0.0 AS dist)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (
  SELECT v, min(dist) AS dist FROM (
    SELECT v, dist FROM d{k-1}
    UNION ALL
    SELECT e.dst AS v, d.dist + e.w AS dist
    FROM edges e JOIN d{k-1} d ON e.src = d.v
  ) GROUP BY v
)"""
        )
    parts.append(f"\nSELECT v, round(dist, 6) AS dist FROM d{rounds}")
    return "\n".join(parts)


SPGEMM_SQL = (
    "WITH " + EDGES_CTE.strip() + ",\n" + WSYM_CTE.strip()
    + f"""
SELECT a.src AS src, b.dst AS dst, round(sum(a.w * b.w), 6) AS w
FROM wsedges a JOIN wsedges b ON a.dst = b.src
WHERE a.src <= {SPGEMM_MAX_SRC}
GROUP BY a.src, b.dst
"""
)

#: MaskedReduce semantics: the mask restricts which ROW (src) entries
#: feed the per-column reduction (SpParMat.cpp:1849-2027 masks the
#: non-reduced dimension).
MASKED_COLSUMS_SQL = (
    "WITH " + EDGES_CTE.strip()
    + """
SELECT dst AS v, round(sum(w), 6) AS colsum
FROM edges WHERE src % 2 = 1 GROUP BY dst
"""
)

CONTAMINATION_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS MATERIALIZED (
  SELECT DISTINCT doc_id, list_aggregate(t[i:i+{CONTAM_N-1}], 'string_agg', ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {CONTAM_N - 2})) AS u(i)
),
bench AS MATERIALIZED (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {CONTAM_BENCH_MOD} = 0
),
per AS (
  SELECT g.doc_id, count(*) AS doc_grams, count(b.gram) AS hit_grams
  FROM grams g LEFT JOIN bench b USING (gram)
  GROUP BY g.doc_id
)
SELECT doc_id, doc_grams, hit_grams,
       round(hit_grams / doc_grams, 6) AS contam_ratio,
       (hit_grams / doc_grams) >= {CONTAM_T} AS contaminated
FROM per
"""


NGRAM_JACCARD_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS MATERIALIZED (
  SELECT DISTINCT doc_id, list_aggregate(t[i:i+{JACCARD_N-1}], 'string_agg', ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {JACCARD_N - 2})) AS u(i)
),
sz AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a, b, round(inter.inter / (sa.sz + sb.sz - inter.inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = inter.a JOIN sz sb ON sb.doc_id = inter.b
WHERE inter.inter / (sa.sz + sb.sz - inter.inter) >= {JACCARD_T}
"""


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _lang_id_sql() -> str:
    from combblas_spark.pipeline.text import STOPWORDS

    scores = ",\n  ".join(
        f"len(list_intersect(u, {_sql_list(ws)})) AS score_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    langs = list(STOPWORDS)
    g = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = " ".join(
        f"WHEN score_{l} = {g} THEN '{l}'" for l in langs
    )
    return f"""
WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS u FROM documents),
s AS (SELECT doc_id,
  {scores}
FROM t)
SELECT doc_id, score_en, score_de, score_fr,
  CASE WHEN {g} = 0 THEN 'und' {case} END AS lang_pred
FROM s
"""


def _quality_sql() -> str:
    from combblas_spark.pipeline.text import STOPWORDS

    sw = _sql_list(STOPWORDS["en"])
    return f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
  round(len(list_distinct(toks)) / len(toks), 6) AS uniq_ratio,
  round(len(list_filter(toks, x -> list_contains({sw}, x))) / len(toks), 6) AS stopword_ratio,
  round(
    (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.25 ELSE 0.0 END)
    + least(len(list_filter(toks, x -> list_contains({sw}, x))) / len(toks) * 2.5, 0.25)
    + least(len(list_distinct(toks)) / len(toks), 0.5), 6) AS quality
FROM t
"""


DEDUP_CC_ROUNDS = 6  # pair-graph clusters are tiny at sf0.01; the FastSV-style
# unroll (min-label hook + pointer jump) converges in ≤ log2(diameter)+1 rounds


def _dedup_survivors_sql(rounds: int = DEDUP_CC_ROUNDS) -> str:
    """Near-dup survivorship oracle: n-gram Jaccard pairs (the exact
    NGRAM_JACCARD_SQL formulation) → transitive closure via the same
    hook+shortcut unroll _cc_sql uses → highest-quality survivor per
    cluster (quality = the green `quality` oracle's formula)."""
    from combblas_spark.pipeline.text import STOPWORDS

    sw = _sql_list(STOPWORDS["en"])
    parts = [
        f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS MATERIALIZED (
  SELECT DISTINCT doc_id, list_aggregate(t[i:i+{JACCARD_N-1}], 'string_agg', ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {JACCARD_N - 2})) AS u(i)
),
sz AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS MATERIALIZED (
  SELECT a, b
  FROM inter JOIN sz sa ON sa.doc_id = inter.a JOIN sz sb ON sb.doc_id = inter.b
  WHERE inter.inter / (sa.sz + sb.sz - inter.inter) >= {JACCARD_T}
),
sedges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM pairs UNION SELECT b AS src, a AS dst FROM pairs
),
j0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS comp FROM sedges)"""
    ]
    for k in range(1, rounds + 1):
        prev = f"j{k-1}"
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
    parts.append(
        f""",
q AS MATERIALIZED (
  SELECT doc_id,
    round(
      (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.25 ELSE 0.0 END)
      + least(len(list_filter(t, x -> list_contains({sw}, x))) / len(t) * 2.5, 0.25)
      + least(len(list_distinct(t)) / len(t), 0.5), 6) AS quality
  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
),
lab AS (
  SELECT d.doc_id, coalesce(cc.comp, d.doc_id) AS cluster
  FROM documents d LEFT JOIN j{rounds} cc ON cc.v = d.doc_id
)
SELECT lab.doc_id AS doc_id, cluster, quality,
  (ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY quality DESC, lab.doc_id ASC) = 1) AS keep
FROM lab JOIN q ON q.doc_id = lab.doc_id
"""
    )
    return "\n".join(parts)


def _doc_split_sql() -> str:
    from combblas_spark.pipeline.text import split_bounds

    b = split_bounds((0.9, 0.05, 0.05))
    return f"""
WITH h AS (
  SELECT doc_id, substr(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 8) AS h32
  FROM documents
)
SELECT doc_id, h32,
  CASE WHEN h32 < '{b[0]}' THEN 'train'
       WHEN h32 < '{b[1]}' THEN 'valid'
       WHEN h32 < '{b[2]}' THEN 'test'
       ELSE 'test' END AS split
FROM h
"""


def _budget_select_sql() -> str:
    """Oracle for the bucketed budget_select: the plain global prefix
    sum over (quality DESC, doc_id ASC) — DuckDB can afford the naive
    window at oracle scale, and semantic equality with the two-level
    bucket decomposition is exactly what the gate should prove."""
    from combblas_spark.pipeline.text import STOPWORDS

    sw = _sql_list(STOPWORDS["en"])
    return f"""
WITH q AS (
  SELECT doc_id, len(t) AS tokens,
    round(
      (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.25 ELSE 0.0 END)
      + least(len(list_filter(t, x -> list_contains({sw}, x))) / len(t) * 2.5, 0.25)
      + least(len(list_distinct(t)) / len(t), 0.5), 6) AS quality
  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
),
r AS (
  SELECT doc_id, quality, tokens,
    sum(tokens) OVER (ORDER BY quality DESC, doc_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM q
)
SELECT doc_id, quality, tokens, (cum <= {BUDGET_TOKENS}) AS keep FROM r
"""


def _repetition_sql() -> str:
    n = REP_N
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ex AS MATERIALIZED (
  SELECT doc_id, len(t) AS tokens,
         list_aggregate(t[i:i+{n-1}], 'string_agg', ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS u(i)
),
pg AS (SELECT doc_id, tokens, gram, count(*) AS c FROM ex GROUP BY ALL),
agg AS (
  SELECT doc_id, tokens, CAST(sum(c) AS BIGINT) AS total_grams, count(*) AS distinct_grams,
         max(c) AS top_c
  FROM pg GROUP BY doc_id, tokens
)
SELECT doc_id, tokens, total_grams, distinct_grams,
       round((total_grams - distinct_grams) / total_grams, 6) AS dup_gram_frac,
       round(least(top_c * {n} / tokens, 1.0), 6) AS top_gram_frac
FROM agg
"""


MIX_RATES = {"src0": 0.1, "src1": 0.5, "src2": 1.0}  # others: default 0.75
MIX_DEFAULT = 0.75


def _mixture_sql() -> str:
    from combblas_spark.pipeline.text import split_bounds

    def bound(rate: float) -> str:
        return "TRUE" if rate >= 1.0 else f"h32 < '{split_bounds((rate,))[0]}'"

    whens = "\n       ".join(
        f"WHEN source = '{g}' THEN {bound(r)}" for g, r in MIX_RATES.items()
    )
    return f"""
WITH h AS (
  SELECT doc_id, source,
         substr(md5('mix-v1' || CAST(doc_id AS VARCHAR)), 1, 8) AS h32
  FROM documents
)
SELECT doc_id, source AS "group", h32,
  CASE {whens}
       ELSE {bound(MIX_DEFAULT)} END AS keep
FROM h
"""


VOCAB_K = 15  # boundary falls inside a count tie (data/table both 908 at sf0.01)
# so the token-order tie-break is exercised, and 15 < 31 distinct tokens

VOCAB_SQL = f"""
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT {VOCAB_K}
"""


def _pack_seqs_sql() -> str:
    """Oracle for the blocked pack_sequences: the naive global prefix
    sum over doc_id order — affordable in DuckDB at oracle scale;
    equality proves the two-level block decomposition."""
    return f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS tokens FROM documents
),
p AS (
  SELECT doc_id, tokens,
    coalesce(sum(tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM t
)
SELECT doc_id, tokens, tok_start,
       tok_start // {SEQ_LEN} AS seq_first,
       (tok_start + tokens - 1) // {SEQ_LEN} AS seq_last
FROM p
"""


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g'))) AS fp
FROM documents
"""

def _tfidf_sql(k: int) -> str:
    """tf-idf top-k unroll: tf × ln(N/df) with df = number of documents
    containing the token, scores rounded to 6 decimals BEFORE the
    per-doc rank window (ties break on the token) — the exact pipeline
    of pipeline/text.py::tfidf_topk."""
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, token, count(*) AS tf FROM t GROUP BY doc_id, token
),
dfq AS MATERIALIZED (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS c FROM documents),
sc AS MATERIALIZED (
  SELECT doc_id, token,
         round(tf * ln((SELECT c FROM n) / df), 6) AS tfidf
  FROM tf JOIN dfq USING (token)
)
SELECT doc_id, token, tfidf FROM (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token ASC) AS rn
  FROM sc
) WHERE rn <= {k}
"""


TOKEN_STATS_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, length(text) AS chars, len(toks) AS tokens,
       len(list_distinct(toks)) AS uniq_tokens,
       round((length(text) - len(toks) + 1) / len(toks), 6) AS avg_token_len
FROM t
"""

COSINE_TOPK_SQL = f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS MATERIALIZED (
  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * x)) AS n FROM ex GROUP BY vec_id
),
dots AS MATERIALIZED (
  SELECT a.vec_id AS q, b.vec_id AS neighbor, sum(CAST(a.x AS DOUBLE) * b.x) AS d
  FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {ANN_NQ}
  GROUP BY a.vec_id, b.vec_id
),
scored AS (
  SELECT q, neighbor, d / (na.n * nb.n) AS cos
  FROM dots JOIN norms na ON na.vec_id = q JOIN norms nb ON nb.vec_id = neighbor
)
SELECT q, neighbor, round(cos, 6) AS cos FROM (
  SELECT q, neighbor, cos,
         row_number() OVER (PARTITION BY q ORDER BY cos DESC, neighbor ASC) AS rn
  FROM scored
) WHERE rn <= {ANN_K}
"""

EMBED_T = 0.4

EMBED_PAIRS_SQL = f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS MATERIALIZED (
  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * x)) AS n FROM ex GROUP BY vec_id
),
dots AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b, sum(CAST(a.x AS DOUBLE) * b.x) AS d
  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT a, b, round(d / (na.n * nb.n), 6) AS cos
FROM dots JOIN norms na ON na.vec_id = a JOIN norms nb ON nb.vec_id = b
WHERE round(d / (na.n * nb.n), 6) >= {EMBED_T}
"""

SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
         event_id
  FROM events
),
marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM o
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
FROM sess GROUP BY user_id, session_id
"""

MOVING_AVG_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, CAST(day AS VARCHAR) AS day, n,
       round(avg(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
FROM daily
"""


def _cc_hist_sql(rounds: int) -> str:
    base = _cc_sql(rounds)
    head, _, _ = base.rpartition("\nSELECT")
    return (
        head
        + f"""
SELECT sz AS size, count(*) AS n FROM (
  SELECT comp, count(*) AS sz FROM j{rounds} GROUP BY comp
) GROUP BY sz
"""
    )


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

# Per-vertex triangle credit: the triangle SET is orientation-
# independent, so the oracle may use the same degree orientation and
# credit each (a, b, c) to all three corners.
TRIANGLES_PV_SQL = (
    TRIANGLES_SQL.rpartition("\nSELECT")[0]
    + """,
t AS MATERIALIZED (
  SELECT a, b, c FROM w
  WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.a AND o.dst = w.c)
),
corners AS (
  SELECT a AS v FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t
)
SELECT v, count(*) AS triangles FROM corners GROUP BY v
"""
)

# Local clustering coefficient: per-vertex triangle credit over the
# same oriented pipeline, divided by the undirected-degree pair count.
CLUSTERING_SQL = (
    TRIANGLES_PV_SQL.rpartition("\nSELECT")[0]
    + """,
tc AS MATERIALIZED (SELECT v, count(*) AS t FROM corners GROUP BY v)
SELECT d.v,
       round(CASE WHEN d.deg >= 2
                  THEN 2.0 * coalesce(tc.t, 0) / (CAST(d.deg AS DOUBLE) * (d.deg - 1.0))
                  ELSE 0.0 END, 6) AS coeff
FROM deg d LEFT JOIN tc ON d.v = tc.v
"""
)

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

def _matching_sql(rounds: int) -> str:
    """Greedy bipartite maximal matching, fixed-round unrolled
    (BPMaximalMatching.h:84-130: column proposes min row, row accepts
    min column, matched endpoints leave)."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        "u0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
p{k} AS MATERIALIZED (SELECT dst, min(src) AS src FROM u{k-1} GROUP BY dst),
m{k} AS MATERIALIZED (SELECT src, min(dst) AS dst FROM p{k} GROUP BY src),
u{k} AS MATERIALIZED (
  SELECT u.src, u.dst FROM u{k-1} u
  WHERE u.src NOT IN (SELECT src FROM m{k})
    AND u.dst NOT IN (SELECT dst FROM m{k})
)"""
        )
    union = " UNION ALL ".join(f"SELECT src, dst FROM m{k}" for k in range(1, rounds + 1))
    parts.append(f"\n{union}")
    return "\n".join(parts)


AWPM_ITERS = 2


def _awpm_sql(greedy_rounds: int, cycle_iters: int) -> str:
    """TwoThirdApprox unrolled (ApproxWeightPerfectMatching.h:791-1120):
    start from the matching3 greedy unroll (weights joined back on),
    then ``cycle_iters`` rounds of weight-increasing vertex-disjoint
    alternating 4-cycles — Phase1/2 candidate generation (open wedge +
    existing back edge, positive published gain), Phase3 per-j max,
    Phase4 per-mi max excluding Phase3-winner columns, simultaneous
    flip.  Gains are integer-valued (w = count(*)), so double summation
    is exact on both engines."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        "u0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
    ]
    for k in range(1, greedy_rounds + 1):
        parts.append(
            f""",
p{k} AS MATERIALIZED (SELECT dst, min(src) AS src FROM u{k-1} GROUP BY dst),
m{k} AS MATERIALIZED (SELECT src, min(dst) AS dst FROM p{k} GROUP BY src),
u{k} AS MATERIALIZED (
  SELECT u.src, u.dst FROM u{k-1} u
  WHERE u.src NOT IN (SELECT src FROM m{k})
    AND u.dst NOT IN (SELECT dst FROM m{k})
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT src, dst FROM m{k}" for k in range(1, greedy_rounds + 1)
    )
    parts.append(
        f""",
mate0 AS MATERIALIZED (
  SELECT g.src, g.dst, e.w FROM ({union}) g JOIN edges e USING (src, dst)
)"""
    )
    for t in range(1, cycle_iters + 1):
        parts.append(
            f""",
cand{t} AS MATERIALIZED (
  SELECT e.src AS i, e.dst AS j, e.w AS w,
         mr.dst AS mi, mr.w AS wi, mc.src AS mj, mc.w AS wj, b.w AS wback,
         e.w + b.w - mr.w - mc.w AS gain
  FROM edges e
  JOIN mate{t-1} mr ON mr.src = e.src
  JOIN mate{t-1} mc ON mc.dst = e.dst
  JOIN edges b ON b.src = mc.src AND b.dst = mr.dst
  WHERE e.src > mc.src AND e.w + b.w - mr.w - mc.w > 0
),
w3_{t} AS MATERIALIZED (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY j ORDER BY gain DESC, i, mi) AS rn
    FROM cand{t} c
  ) WHERE rn = 1
),
wn{t} AS MATERIALIZED (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY mi ORDER BY gain DESC, i, j) AS rn2
    FROM w3_{t} c
    WHERE NOT EXISTS (SELECT 1 FROM w3_{t} x WHERE x.j = c.mi)
  ) WHERE rn2 = 1
),
mate{t} AS MATERIALIZED (
  SELECT m.src, m.dst, m.w FROM mate{t-1} m
  WHERE NOT EXISTS (SELECT 1 FROM wn{t} x WHERE x.i = m.src)
    AND NOT EXISTS (SELECT 1 FROM wn{t} x WHERE x.mj = m.src)
  UNION ALL SELECT i AS src, j AS dst, w FROM wn{t}
  UNION ALL SELECT mj AS src, mi AS dst, wback AS w FROM wn{t}
)"""
        )
    parts.append(f"\nSELECT src, dst FROM mate{cycle_iters}")
    return "\n".join(parts)


RCM_LEVELS = 8  # ≥ BFS eccentricity from the RCM source at sf0.01
                # (measured 4; extra levels are empty CTEs)


def _rcm_sql(levels: int) -> str:
    """Reverse Cuthill-McKee unrolled (Ordering/RCM.cpp semantics,
    algos/matching.rcm_ordering): min-(degree, id) source, BFS levels
    over the symmetrized pattern, rank by (level, degree, id), order
    reversed.  Unreached vertices sort after the reached ones via the
    1<<30 level sentinel, exactly as the Spark side."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        """deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM sedges GROUP BY src),
srcv AS MATERIALIZED (SELECT v FROM deg ORDER BY deg, v LIMIT 1),
p0 AS MATERIALIZED (SELECT v, 0 AS level FROM srcv),
f0 AS MATERIALIZED (SELECT v FROM p0)""",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f""",
n{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS v FROM sedges e JOIN f{k-1} f ON e.src = f.v
  WHERE NOT EXISTS (SELECT 1 FROM p{k-1} p WHERE p.v = e.dst)
),
p{k} AS MATERIALIZED (
  SELECT * FROM p{k-1} UNION ALL SELECT v, {k} AS level FROM n{k}
),
f{k} AS MATERIALIZED (SELECT v FROM n{k})"""
        )
    parts.append(
        f""",
keyed AS MATERIALIZED (
  SELECT d.v, coalesce(p.level, 1073741824) AS lvl, d.deg
  FROM deg d LEFT JOIN p{levels} p ON d.v = p.v
),
nv AS MATERIALIZED (SELECT count(*) AS n FROM deg)
SELECT v,
       (SELECT n FROM nv) - CAST(row_number() OVER (ORDER BY lvl, deg, v) AS BIGINT)
       AS new_id
FROM keyed"""
    )
    return "\n".join(parts)


# maximum-matching gate slice: per-src 2 smallest suppliers over the
# first 61 customers — the smallest deterministic slice of the link
# graph where GREEDY IS NOT MAXIMUM (measured greedy 16 < maximum 18
# at sf0.01), so the gate exercises a real MS-BFS augmentation phase
MATCH_SLICE_SRC = 60
MATCH_SLICE_K = 2
MATCHMAX_GREEDY_ROUNDS = 4  # measured 2 to convergence; extras empty
MATCHMAX_BFS_DEPTH = 4      # measured 2
MATCHMAX_WALK_STEPS = 4     # measured 2


def _matching_max_sql(
    greedy_rounds: int = MATCHMAX_GREEDY_ROUNDS,
    bfs_depth: int = MATCHMAX_BFS_DEPTH,
    walk_steps: int = MATCHMAX_WALK_STEPS,
) -> str:
    """Maximum-cardinality bipartite matching unrolled
    (BPMaximumMatching.h:231-420 / algos/matching.maximum_bipartite_matching):
    greedy maximal init, ONE MS-BFS phase from all unmatched columns
    through alternating edges (min-(pc, root) row adoption, min
    unmatched row per root as the augmenting-path leaf), then the
    leaf→root pointer-flip walk.  The measured sf0.01 slice needs one
    phase (the second finds no augmenting path), so a single unrolled
    phase reproduces the converged Spark result exactly."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        f"""sl AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
    FROM edges WHERE src <= {MATCH_SLICE_SRC}
  ) WHERE rn <= {MATCH_SLICE_K}
),
u0 AS MATERIALIZED (SELECT src, dst FROM sl)""",
    ]
    for k in range(1, greedy_rounds + 1):
        parts.append(
            f""",
gp{k} AS MATERIALIZED (SELECT dst, min(src) AS src FROM u{k-1} GROUP BY dst),
gm{k} AS MATERIALIZED (SELECT src, min(dst) AS dst FROM gp{k} GROUP BY src),
u{k} AS MATERIALIZED (
  SELECT u.src, u.dst FROM u{k-1} u
  WHERE NOT EXISTS (SELECT 1 FROM gm{k} m WHERE m.src = u.src)
    AND NOT EXISTS (SELECT 1 FROM gm{k} m WHERE m.dst = u.dst)
)"""
        )
    greedy_union = " UNION ALL ".join(
        f"SELECT src, dst FROM gm{k}" for k in range(1, greedy_rounds + 1)
    )
    parts.append(
        f""",
mate0 AS MATERIALIZED ({greedy_union}),
fr0 AS MATERIALIZED (
  SELECT c.dst AS c, c.dst AS root FROM (SELECT DISTINCT dst FROM sl) c
  WHERE NOT EXISTS (SELECT 1 FROM mate0 m WHERE m.dst = c.dst)
),
par0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS r, CAST(NULL AS BIGINT) AS pc,
         CAST(NULL AS BIGINT) AS root WHERE 1 = 0
),
lv0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS root, CAST(NULL AS BIGINT) AS leaf WHERE 1 = 0
)"""
    )
    for d in range(1, bfs_depth + 1):
        parts.append(
            f""",
cand{d} AS MATERIALIZED (
  SELECT r, pc, root FROM (
    SELECT e.src AS r, f.c AS pc, f.root AS root,
           row_number() OVER (PARTITION BY e.src ORDER BY f.c, f.root) AS rn
    FROM sl e JOIN fr{d-1} f ON e.dst = f.c
  ) WHERE rn = 1
),
new{d} AS MATERIALIZED (
  SELECT c.* FROM cand{d} c
  WHERE NOT EXISTS (SELECT 1 FROM par{d-1} p WHERE p.r = c.r)
),
par{d} AS MATERIALIZED (SELECT * FROM par{d-1} UNION ALL SELECT * FROM new{d}),
nl{d} AS MATERIALIZED (
  SELECT root, min(r) AS leaf FROM new{d} n
  WHERE NOT EXISTS (SELECT 1 FROM mate0 m WHERE m.src = n.r)
    AND NOT EXISTS (SELECT 1 FROM lv{d-1} l WHERE l.root = n.root)
  GROUP BY root
),
lv{d} AS MATERIALIZED (SELECT * FROM lv{d-1} UNION ALL SELECT * FROM nl{d}),
fr{d} AS MATERIALIZED (
  SELECT m.dst AS c, min(n.root) AS root
  FROM new{d} n JOIN mate0 m ON m.src = n.r
  WHERE NOT EXISTS (SELECT 1 FROM lv{d} l WHERE l.root = n.root)
  GROUP BY m.dst
)"""
        )
    parts.append(
        f""",
cur0 AS MATERIALIZED (SELECT root, leaf AS r FROM lv{bfs_depth})"""
    )
    for s in range(1, walk_steps + 1):
        parts.append(
            f""",
st{s} AS MATERIALIZED (
  SELECT c.r, p.pc, c.root FROM cur{s-1} c JOIN par{bfs_depth} p ON p.r = c.r
),
cur{s} AS MATERIALIZED (
  SELECT s.root, m.src AS r FROM st{s} s JOIN mate0 m ON m.dst = s.pc
)"""
        )
    flips_union = " UNION ALL ".join(
        f"SELECT r AS src, pc AS dst FROM st{s}" for s in range(1, walk_steps + 1)
    )
    parts.append(
        f""",
flips AS MATERIALIZED ({flips_union})
SELECT src, dst FROM (
  SELECT m.src, m.dst FROM mate0 m
  WHERE NOT EXISTS (SELECT 1 FROM flips f WHERE f.src = m.src)
    AND NOT EXISTS (SELECT 1 FROM flips f WHERE f.dst = m.dst)
  UNION ALL
  SELECT src, dst FROM flips
)"""
    )
    return "\n".join(parts)


AUCTION_ROUNDS = 6       # measured 4 to convergence at sf0.01; extras no-op
AUCTION_EPS = 0.125      # dyadic literal -> bit-exact in both engines
AUCTION_FALLBACK = 2_000_000  # private fallback-object id offset


def _auction_sql(rounds: int = AUCTION_ROUNDS) -> str:
    """Bertsekas auction matching unrolled (algos/auction.py; the
    reference's one-round sketch is auction.cpp:60-438).  Same slice as
    matching_max plus one private weight-0.5 fallback object per bidder
    (the standard feasibility trick: the row side becomes perfectly
    matchable, so the auction terminates, while bidders still fight
    real price wars over the shared suppliers).  Every arithmetic step
    (profit = w − p; bid = p + v1 − v2 + ε, dyadic ε) is elementary
    per-row IEEE with identical operand order in both engines, so the
    round-by-round state is bit-identical and the fixed unroll
    reproduces the Spark loop's converged matching exactly."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        f"""asl AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT src, dst, w, row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
    FROM edges WHERE src <= {MATCH_SLICE_SRC}
  ) WHERE rn <= {MATCH_SLICE_K}
),
ae AS MATERIALIZED (
  SELECT src, dst, w FROM asl
  UNION ALL
  SELECT DISTINCT src, src + {AUCTION_FALLBACK} AS dst, 0.5 AS w FROM asl
),
pr0 AS MATERIALIZED (SELECT DISTINCT dst, 0.0 AS p FROM ae),
mt0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS src, CAST(NULL AS BIGINT) AS dst WHERE 1 = 0
)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
rk{k} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w - p.p AS profit, p.p,
         row_number() OVER (PARTITION BY e.src
                            ORDER BY (e.w - p.p) DESC, e.dst ASC) AS rn
  FROM ae e JOIN pr{k-1} p ON p.dst = e.dst
  WHERE NOT EXISTS (SELECT 1 FROM mt{k-1} m WHERE m.src = e.src)
),
bid{k} AS MATERIALIZED (
  SELECT b.src, b.dst,
         b.p + b.profit - coalesce(s.profit, b.profit - 1.0)
           + {AUCTION_EPS} AS bid
  FROM (SELECT * FROM rk{k} WHERE rn = 1) b
  LEFT JOIN (SELECT * FROM rk{k} WHERE rn = 2) s ON s.src = b.src
),
win{k} AS MATERIALIZED (
  SELECT src, dst, bid FROM (
    SELECT *, row_number() OVER (PARTITION BY dst
                                 ORDER BY bid DESC, src ASC) AS rn
    FROM bid{k}
  ) WHERE rn = 1
),
pr{k} AS MATERIALIZED (
  SELECT p.dst, p.p FROM pr{k-1} p
  WHERE NOT EXISTS (SELECT 1 FROM win{k} w WHERE w.dst = p.dst)
  UNION ALL SELECT dst, bid AS p FROM win{k}
),
mt{k} AS MATERIALIZED (
  SELECT m.src, m.dst FROM mt{k-1} m
  WHERE NOT EXISTS (SELECT 1 FROM win{k} w WHERE w.dst = m.dst)
  UNION ALL SELECT src, dst FROM win{k}
)"""
        )
    parts.append(f"\nSELECT src, dst FROM mt{rounds}")
    return "\n".join(parts)


MCL_ITERS = 2
MCL_K = 50
MCL_PRUNE = 1e-4
MCL_INFLATION = 2.0
MCL_QUANT = 12
# gate is fixture-bounded (spgemm_rows pattern): the full link graph's
# Σdeg² explodes quadratically through supplier hubs as sf grows — the
# slice keeps the CORRECTNESS gate constant-cost at any sf (MCL-at-scale
# memory behavior is spgemm_phased's job, pytest-covered)
MCL_MAX_SRC = 300


def _mcl_sql(n_iter: int) -> str:
    """Fixed-iteration MCL state, unrolled (MCL.cpp:563-620 with
    convergence + recovery disabled): expansion = self-join,
    prune/top-k = window, inflate+normalize = pow + per-column sum.
    Both engines quantize to MCL_QUANT decimals after expansion and
    after each normalize so summation noise cannot flip the top-k
    boundary (see algos/mcl.mcl_fixed)."""
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        f"""msel AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE src <= {MCL_MAX_SRC}
),
sedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM msel UNION ALL SELECT dst AS src, src AS dst FROM msel
  )
),
verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM sedges),
loops AS MATERIALIZED (
  SELECT src, dst, 1.0 AS w FROM sedges
  UNION ALL
  SELECT v AS src, v AS dst, 1.0 AS w FROM verts
),
a0 AS MATERIALIZED (
  SELECT src, dst, round(w / sum(w) OVER (PARTITION BY dst), {MCL_QUANT}) AS w
  FROM loops
)""",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
x{k} AS MATERIALIZED (
  SELECT a.src, b.dst, round(sum(a.w * b.w), {MCL_QUANT}) AS w
  FROM a{k-1} a JOIN a{k-1} b ON a.dst = b.src
  GROUP BY a.src, b.dst
),
p{k} AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           row_number() OVER (PARTITION BY dst ORDER BY w DESC, src ASC) AS rn
    FROM x{k} WHERE w >= {MCL_PRUNE}
  ) WHERE rn <= {MCL_K}
),
a{k} AS MATERIALIZED (
  SELECT src, dst,
         round(pow(w, {MCL_INFLATION})
               / sum(pow(w, {MCL_INFLATION})) OVER (PARTITION BY dst),
               {MCL_QUANT}) AS w
  FROM p{k}
)"""
        )
    parts.append(f"\nSELECT src, dst, round(w, 6) AS w FROM a{n_iter}")
    return "\n".join(parts)


def _mcl_inc_sql(n_iter: int = MCL_ITERS) -> str:
    """Incremental-MCL step unrolled (IncClust.h:610-900 /
    algos/incremental.assemble_minc + algos/mcl.mcl_fixed): reassemble
    the Minc block matrix from the pinned summary + new-batch INPUT
    fixtures — per-block column-stochastic rescale by row dimension
    (normalizedAssign, IncClust.h:1127-1143) — then run the same
    fixed-iteration MCL unroll as the mcl2 gate.  Fixture weights are
    dyadic so every block column sum is exact; quantization at
    MCL_QUANT kills expansion summation noise as in _mcl_sql."""
    summ = _fixture("mcl_inc_summary.parquet")
    newe = _fixture("mcl_inc_new_edges.parquet")
    parts = [
        f"""WITH summ AS MATERIALIZED (
  SELECT src, dst, w FROM read_parquet('{summ}')
),
ne0 AS MATERIALIZED (
  SELECT src, dst, w FROM read_parquet('{newe}')
),
oldv AS MATERIALIZED (
  SELECT DISTINCT v FROM (
    SELECT src AS v FROM summ UNION ALL SELECT dst AS v FROM summ
  )
),
ne AS MATERIALIZED (
  SELECT * FROM ne0
  WHERE NOT (src IN (SELECT v FROM oldv) AND dst IN (SELECT v FROM oldv))
),
dims AS MATERIALIZED (
  SELECT (SELECT count(*) FROM oldv) AS n_old,
         (SELECT count(DISTINCT v) FROM (
            SELECT src AS v FROM ne UNION ALL SELECT dst AS v FROM ne
          ) WHERE v NOT IN (SELECT v FROM oldv)) AS n_new
),
asm AS MATERIALIZED (
  SELECT src, dst,
         round(w / sum(w) OVER (PARTITION BY dst)
               * (SELECT n_old FROM dims), {MCL_QUANT}) AS w
  FROM summ
  UNION ALL
  SELECT src, dst,
         round(w / sum(w) OVER (PARTITION BY dst)
               * (SELECT n_old FROM dims), {MCL_QUANT}) AS w
  FROM ne WHERE src IN (SELECT v FROM oldv) AND dst NOT IN (SELECT v FROM oldv)
  UNION ALL
  SELECT src, dst,
         round(w / sum(w) OVER (PARTITION BY dst)
               * (SELECT n_new FROM dims), {MCL_QUANT}) AS w
  FROM ne WHERE src NOT IN (SELECT v FROM oldv) AND dst IN (SELECT v FROM oldv)
  UNION ALL
  SELECT src, dst,
         round(w / sum(w) OVER (PARTITION BY dst)
               * (SELECT n_new FROM dims), {MCL_QUANT}) AS w
  FROM ne WHERE src NOT IN (SELECT v FROM oldv) AND dst NOT IN (SELECT v FROM oldv)
),
iverts AS MATERIALIZED (
  SELECT DISTINCT v FROM (
    SELECT src AS v FROM asm UNION ALL SELECT dst AS v FROM asm
  )
),
iloops AS MATERIALIZED (
  SELECT src, dst, w FROM asm WHERE src <> dst
  UNION ALL
  SELECT v AS src, v AS dst, 1.0 AS w FROM iverts
),
a0 AS MATERIALIZED (
  SELECT src, dst, round(w / sum(w) OVER (PARTITION BY dst), {MCL_QUANT}) AS w
  FROM iloops
)""",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
x{k} AS MATERIALIZED (
  SELECT a.src, b.dst, round(sum(a.w * b.w), {MCL_QUANT}) AS w
  FROM a{k-1} a JOIN a{k-1} b ON a.dst = b.src
  GROUP BY a.src, b.dst
),
p{k} AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           row_number() OVER (PARTITION BY dst ORDER BY w DESC, src ASC) AS rn
    FROM x{k} WHERE w >= {MCL_PRUNE}
  ) WHERE rn <= {MCL_K}
),
a{k} AS MATERIALIZED (
  SELECT src, dst,
         round(pow(w, {MCL_INFLATION})
               / sum(pow(w, {MCL_INFLATION})) OVER (PARTITION BY dst),
               {MCL_QUANT}) AS w
  FROM p{k}
)"""
        )
    parts.append(f"\nSELECT src, dst, round(w, 6) AS w FROM a{n_iter}")
    return "\n".join(parts)


BC_SOURCES = [1, 2, 3]
BC_DEPTH = 4


def _betweenness_sql(sources: list[int], depth: int) -> str:
    """Batched Brandes, fixed sources + fixed BFS depth, unrolled
    (BetwCent.cpp:126-220): forward sigma CTEs (level-synchronous
    shortest-path counting) then backward delta CTEs (dependency
    accumulation deepest-first); undirected halving as in the Spark
    path."""
    src_rows = ", ".join(f"({s}, {s}, 0, 1.0)" for s in sources)
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        f"sp0 AS MATERIALIZED (SELECT * FROM (VALUES {src_rows})"
        " AS t(s, v, depth, sigma))",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f""",
f{d} AS MATERIALIZED (
  SELECT * FROM (
    SELECT fr.s, e.dst AS v, {d} AS depth, sum(fr.sigma) AS sigma
    FROM sp{d-1} fr JOIN sedges e ON fr.v = e.src
    WHERE fr.depth = {d-1}
    GROUP BY fr.s, e.dst
  ) t
  WHERE NOT EXISTS (SELECT 1 FROM sp{d-1} p WHERE p.s = t.s AND p.v = t.v)
),
sp{d} AS MATERIALIZED (
  SELECT * FROM sp{d-1} UNION ALL SELECT * FROM f{d}
)"""
        )
    # backward: delta = 0 at the deepest level, accumulate upward
    parts.append(
        f""",
lvl{depth} AS MATERIALIZED (
  SELECT s, v, depth, sigma, 0.0 AS delta FROM sp{depth} WHERE depth = {depth}
)"""
    )
    for d in range(depth - 1, 0, -1):
        parts.append(
            f""",
c{d} AS MATERIALIZED (
  SELECT l.s, l.v,
         sum((l.sigma / w.sigma) * (1.0 + w.delta)) AS dsum
  FROM sp{depth} l
  JOIN sedges e ON l.v = e.src
  JOIN lvl{d+1} w ON e.dst = w.v AND w.s = l.s
  WHERE l.depth = {d}
  GROUP BY l.s, l.v
),
lvl{d} AS MATERIALIZED (
  SELECT l.s, l.v, l.depth, l.sigma, coalesce(c.dsum, 0.0) AS delta
  FROM sp{depth} l LEFT JOIN c{d} c ON l.s = c.s AND l.v = c.v
  WHERE l.depth = {d}
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT v, delta FROM lvl{d}" for d in range(1, depth + 1)
    )
    parts.append(
        f"""
SELECT v, round(sum(delta) / 2.0, 6) AS bc
FROM ({union})
GROUP BY v"""
    )
    return "\n".join(parts)


INDUCED_EDGES_SQL = (
    _cc_sql(CC_ROUNDS).rpartition("\nSELECT")[0]
    + f"""
SELECT a.comp AS comp, count(*) AS n_edges
FROM edges e
JOIN j{CC_ROUNDS} a ON e.src = a.v
JOIN j{CC_ROUNDS} b ON e.dst = b.v
WHERE a.comp = b.comp
GROUP BY a.comp
"""
)

LARGEST_CC_SQL = (
    _cc_sql(CC_ROUNDS).rpartition("\nSELECT")[0]
    + f""",
top AS (
  SELECT comp FROM j{CC_ROUNDS}
  GROUP BY comp ORDER BY count(*) DESC, comp ASC LIMIT 1
),
members AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS new_id
  FROM j{CC_ROUNDS} JOIN top USING (comp)
)
SELECT ms.new_id AS src, md.new_id AS dst, e.w AS w
FROM edges e
JOIN members ms ON e.src = ms.v
JOIN members md ON e.dst = md.v
"""
)

GRAPH_METRICS_SQL = (
    "WITH " + EDGES_CTE.strip()
    + """,
mx AS (SELECT max(greatest(src, dst)) + 1 AS n FROM edges),
up AS (SELECT dst, min(src) AS f FROM edges WHERE src <= dst GROUP BY dst)
SELECT CAST((SELECT max(abs(src - dst)) FROM edges) AS BIGINT) AS bandwidth,
       CAST((SELECT coalesce(sum(dst - f), 0) + (SELECT n FROM mx) - count(*)
             FROM up) AS BIGINT) AS profile
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

MIS_ROUNDS = 10  # ≥ the Luby convergence round count at sf0.01 (extra
                 # rounds are empty CTEs — the unroll is convergence-safe)


def _coloring_sql(rounds: int, cap: int) -> str:
    """Speculative greedy-coloring unroll (algos/coloring.py): per
    round every uncolored vertex picks the (min(r, cap)+1)-th color
    absent from its colored neighborhood (r = higher-priority active
    neighbors — the rank offset that de-serializes dense cores);
    adjacent same-candidate vertices resolve by (pri, id) with the
    loser retrying.  Priorities come from the pinned mis_priorities
    fixture (the same pure-Python XXH64 chain the Spark side computes
    live via F.xxhash64)."""
    pri = _fixture("mis_priorities.parquet")
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        f"""a0 AS MATERIALIZED (SELECT v, pri FROM read_parquet('{pri}')),
c0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS v, CAST(NULL AS INTEGER) AS color WHERE FALSE
)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
us{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS v, c.color
  FROM sedges e JOIN c{k-1} c ON e.src = c.v JOIN a{k-1} a ON e.dst = a.v
),
rk{k} AS MATERIALIZED (
  SELECT e.dst AS v, count(*) AS r
  FROM sedges e JOIN a{k-1} s ON e.src = s.v JOIN a{k-1} t ON e.dst = t.v
  WHERE s.pri > t.pri OR (s.pri = t.pri AND s.v > t.v)
  GROUP BY e.dst
),
bb{k} AS MATERIALIZED (
  SELECT a.v, a.pri,
         least(coalesce(r.r, 0), {cap}) AS r,
         coalesce(u.u, 0) AS u
  FROM a{k-1} a
  LEFT JOIN rk{k} r ON r.v = a.v
  LEFT JOIN (SELECT v, count(*) AS u FROM us{k} GROUP BY v) u ON u.v = a.v
),
cn{k} AS MATERIALIZED (
  SELECT v, pri, c AS cand FROM (
    SELECT g.v, g.pri, g.r, g.c,
           row_number() OVER (PARTITION BY g.v ORDER BY g.c) AS rn
    FROM (
      SELECT b.v, b.pri, b.r, gs.c
      FROM bb{k} b, UNNEST(range(0, b.r + b.u + 1)) AS gs(c)
    ) g
    WHERE NOT EXISTS (SELECT 1 FROM us{k} u WHERE u.v = g.v AND u.color = g.c)
  ) WHERE rn = r + 1
),
lo{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS v
  FROM sedges e JOIN cn{k} s ON e.src = s.v JOIN cn{k} t ON e.dst = t.v
  WHERE s.cand = t.cand
    AND (s.pri > t.pri OR (s.pri = t.pri AND s.v > t.v))
),
w{k} AS MATERIALIZED (
  SELECT c.v, CAST(c.cand AS INTEGER) AS color FROM cn{k} c
  WHERE NOT EXISTS (SELECT 1 FROM lo{k} l WHERE l.v = c.v)
),
c{k} AS MATERIALIZED (
  SELECT v, color FROM c{k-1} UNION ALL SELECT v, color FROM w{k}
),
a{k} AS MATERIALIZED (
  SELECT a.v, a.pri FROM a{k-1} a
  WHERE NOT EXISTS (SELECT 1 FROM w{k} w WHERE w.v = a.v)
)"""
        )
    parts.append(f"\nSELECT v, color FROM c{rounds}")
    return "\n".join(parts)


def _mis_sql(rounds: int) -> str:
    """Luby MIS unrolled (FilteredMIS.cpp semantics, algos/mis.py):
    per round, a still-active vertex wins when its (pri, id) beats the
    min over its still-active neighbors; winners' neighborhoods
    deactivate.  Priorities come from the pinned fixture (pure-Python
    XXH64 of the seeded chain — not SQL-expressible, so it is
    materialized; the Spark side computes them live via F.xxhash64 and
    matches iff the JVM hash chain equals the pinned reference)."""
    pri = _fixture("mis_priorities.parquet")
    parts = [
        "WITH " + EDGES_CTE.strip() + ",",
        SYM_EDGES_CTE.strip() + ",",
        f"a0 AS MATERIALIZED (SELECT v, pri FROM read_parquet('{pri}'))",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
nb{k} AS MATERIALIZED (
  SELECT v, pri, nv FROM (
    SELECT e.dst AS v, s.pri AS pri, s.v AS nv,
           row_number() OVER (PARTITION BY e.dst ORDER BY s.pri, s.v) AS rn
    FROM sedges e JOIN a{k-1} s ON e.src = s.v JOIN a{k-1} t ON e.dst = t.v
  ) WHERE rn = 1
),
w{k} AS MATERIALIZED (
  SELECT a.v FROM a{k-1} a LEFT JOIN nb{k} m ON a.v = m.v
  WHERE m.v IS NULL OR (a.pri < m.pri) OR (a.pri = m.pri AND a.v < m.nv)
),
rm{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS v FROM sedges e JOIN w{k} w ON e.src = w.v
),
a{k} AS MATERIALIZED (
  SELECT a.v, a.pri FROM a{k-1} a
  WHERE NOT EXISTS (SELECT 1 FROM w{k} w WHERE w.v = a.v)
    AND NOT EXISTS (SELECT 1 FROM rm{k} r WHERE r.v = a.v)
)"""
        )
    union = " UNION ALL ".join(f"SELECT v FROM w{k}" for k in range(1, rounds + 1))
    parts.append("\n" + union)
    return "\n".join(parts)


MINHASH_HASHES = 64
MINHASH_BANDS = 16


def _minhash_lsh_sql(
    n_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS,
    threshold: float = JACCARD_T,
) -> str:
    """MinHash+LSH over the pinned signature fixture: banding is a
    slice-equality self-join (exactly the Spark side's array-key join),
    verification is exact distinct-gram Jaccard recomputed from the
    documents table in SQL.  A green row certifies both the JVM
    signature computation (vs the pure-Python pinned fixture) and the
    banding/verification pipeline."""
    r = n_hashes // bands
    sig = _fixture("minhash_sigs.parquet")
    return f"""
WITH sig AS MATERIALIZED (
  SELECT doc_id, sig FROM read_parquet('{sig}')
),
bkeys AS MATERIALIZED (
  SELECT doc_id, b, sig[b*{r}+1 : b*{r}+{r}] AS key
  FROM sig, UNNEST(range(0, {bands})) AS u(b)
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bkeys x JOIN bkeys y
    ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS MATERIALIZED (
  SELECT DISTINCT doc_id, list_aggregate(t[i:i+{JACCARD_N-1}], 'string_agg', ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {JACCARD_N - 2})) AS u(i)
),
sz AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.a
  JOIN grams gb ON gb.doc_id = c.b AND ga.gram = gb.gram
  GROUP BY c.a, c.b
)
SELECT i.a, i.b, round(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
"""


def _media_features_sql() -> str:
    """Pinned-decoder oracle: the Spark side runs the Arrow-batched
    numpy decode live; the fixture holds the band means recomputed by
    a pure-Python scalar splitmix64 chain (make_oracle_fixtures.
    make_media_features).  Both sides round the identical float32
    value at 4 decimals, so equal rows iff the vectorized kernel is
    value-exact."""
    return (
        "SELECT media_id, kind, decoded_w, decoded_h, band, "
        "round(feat, 4) AS feat "
        f"FROM read_parquet('{_fixture('media_features.parquet')}')"
    )


def _simhash_sql() -> str:
    """Pinned-signature oracle: the Spark side computes the 64-bit
    SimHash live (100% JVM); the fixture holds the pinned scalar
    reference (pipeline/dedup.simhash_py semantics) — equal row sets
    iff the JVM computation is byte-exact (the mtx_degrees round-trip
    pattern)."""
    return f"SELECT doc_id, simhash FROM read_parquet('{_fixture('simhash_sigs.parquet')}')"


SIMHASH_MAX_HAMMING = 3


def _simhash_pairs_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    """SimHash block-LSH retrieval over the pinned signatures: 4×16-bit
    block keys (pigeonhole for distance ≤ 3), integer bit ops for the
    exact Hamming verify — the SQL mirror of dedup.simhash_near_pairs."""
    sig = _fixture("simhash_sigs.parquet")
    return f"""
WITH sig AS MATERIALIZED (
  SELECT doc_id, simhash FROM read_parquet('{sig}')
),
keyed AS MATERIALIZED (
  SELECT doc_id, simhash, b, (simhash >> (b * 16)) & 65535 AS key
  FROM sig, UNNEST(range(0, 4)) AS u(b)
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM keyed x JOIN keyed y
  ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""


WEBGRAPH_EDGES_CTE_TEMPLATE = """
edges AS MATERIALIZED (
  SELECT src, dst, w FROM read_parquet('{path}')
)"""


def _hostrank_sql(n_iter: int) -> str:
    """HostRank unroll over the pinned host-edge fixture: the Spark
    side rolls the live crawl up to distinct host→host edges with the
    JVM parse_url; the fixture holds the same rollup built from the
    pure link rule + urllib host parsing (independent of parse_url),
    so a green row certifies extraction, host parse, rollup, dictionary
    round trip and the PageRank kernel.  The unroll template is
    key-type-agnostic (no arithmetic on v), so host strings flow
    through it unchanged."""
    cte = WEBGRAPH_EDGES_CTE_TEMPLATE.format(path=_fixture("host_edges.parquet"))
    return _pagerank_sql(n_iter, edges_cte=cte)


def _host_curation_sql(n_iter: int, k: int) -> str:
    """Rank-weighted corpus curation oracle: the HostRank unroll over
    the pinned host-edge fixture joined to the pinned pages_meta
    fixture (url, host, n_tokens from the PURE rules — reference
    extractor + urllib host parse + python tokenization), scored
    rank·sqrt(n_tokens) and top-k selected.  sqrt (not log) because
    IEEE-754 requires sqrt correctly rounded, so Spark and DuckDB
    produce bit-identical scores; ln is not so guaranteed."""
    cte = WEBGRAPH_EDGES_CTE_TEMPLATE.format(path=_fixture("host_edges.parquet"))
    final = f""",
ranks AS MATERIALIZED (SELECT v, round(rank, 6) AS rank FROM r{n_iter}),
meta AS MATERIALIZED (
  SELECT url, host, n_tokens FROM read_parquet('{_fixture("pages_meta.parquet")}')
)
SELECT m.url, m.host, m.n_tokens,
       r.rank,
       round(r.rank * sqrt(m.n_tokens), 6) AS score
FROM meta m JOIN ranks r ON r.v = m.host
ORDER BY score DESC, m.url
LIMIT {k}"""
    return _pagerank_sql(n_iter, edges_cte=cte, final_sql=final)


def _webgraph_pagerank_sql(n_iter: int) -> str:
    """PageRank unroll over the pinned extracted-edge fixture: the
    Spark side runs the full live ingest (synthetic pages → Arrow-UDF
    link extraction → url→id dictionary → graph → PageRank); the
    oracle runs the same PageRank recursion on edges produced by the
    PURE link rule + lexicographic dictionary (make_oracle_fixtures) —
    a green row certifies extraction, dictionary, graph assembly and
    the PageRank kernel end to end."""
    cte = WEBGRAPH_EDGES_CTE_TEMPLATE.format(path=_fixture("webgraph_edges.parquet"))
    return _pagerank_sql(n_iter, edges_cte=cte)


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


def q_pagerank_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PageRank gate (algos/pagerank.py pagerank_warm):
    rank the base graph (a deterministic edge split), land the delta,
    warm-start from the prior vector with new vertices at 1/n, and run
    the few update iterations — the crawl-refresh shape."""
    from combblas_spark.algos.pagerank import pagerank_fixed, pagerank_warm
    from combblas_spark.graph import Graph

    g = _graph(spark, sf_dir)
    base = Graph(
        edges=g.edges.filter(
            (F.col("src") + F.col("dst")) % PR_INC_SPLIT != 0
        ),
        n_partitions=g.n_partitions,
    )
    prev = pagerank_fixed(spark, base, n_iter=PR_ITERS, alpha=ALPHA)
    warm = pagerank_warm(spark, g, prev, n_iter=PR_INC_ITERS, alpha=ALPHA)
    return warm.select("v", F.round("rank", 6).alias("rank"))


def q_wpagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.wpagerank import wpagerank_fixed

    return wpagerank_fixed(spark, _graph(spark, sf_dir), n_iter=PR_ITERS, alpha=ALPHA)


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.ppr import ppr_fixed

    return ppr_fixed(
        spark, _graph(spark, sf_dir), seeds=PPR_SEEDS, n_iter=PR_ITERS, alpha=ALPHA
    )


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.hits import hits_fixed

    return hits_fixed(spark, _graph(spark, sf_dir), n_iter=PR_ITERS)


def q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA gate: degree-normalized alternating hub/authority walk —
    the same two-SpMV superstep as q_hits with the random-surfer vote
    split (algos/hits.py::salsa_fixed)."""
    from combblas_spark.algos.hits import salsa_fixed

    return salsa_fixed(spark, _graph(spark, sf_dir), n_iter=PR_ITERS)


def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-Katz gate: 5 affine weighted-SpMV updates
    (algos/katz.py) — the third classic algebraic-path centrality next
    to pagerank5/hits5, exercising the beta-shift + alpha-scale
    semiring variant of the cached-edge superstep."""
    from combblas_spark.algos.katz import katz_fixed

    return katz_fixed(
        spark, _graph(spark, sf_dir), n_iter=PR_ITERS,
        alpha=KATZ_ALPHA, beta=KATZ_BETA,
    )


def q_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-spanning-forest gate (algos/mst.py): Borůvka rounds on
    the weighted link graph.  At small SF most multiplicities are 1,
    so the gate primarily certifies the deterministic (w, u, v)
    total-order selection and the hook/contract machinery; weight
    ordering itself is pinned by pytest on distinct-weight fixtures."""
    from combblas_spark.algos.mst import boruvka_mst

    return boruvka_mst(spark, _graph(spark, sf_dir))


def q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bowtie decomposition (algos/bowtie.py) of the thinned
    directed user-event graph: per-vertex CORE/IN/OUT/OTHER labels
    relative to the max-out-degree root.  At sf0.01 all four regions
    are populated (87/19/14/26 over 146 vertices), so the gate is
    non-vacuous for both sweeps and the label case-split."""
    from combblas_spark.algos.bowtie import bowtie_decompose
    from combblas_spark.sources.tables import event_link_edges

    edges = event_link_edges(spark, sf_dir)
    root = (
        edges.groupBy("src")
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), F.asc("src"))
        .first()[0]
    )  # single-row seed collect, same precedent as the BFS/MD gates
    return bowtie_decompose(spark, edges, int(root))


def q_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-corpus gate (algos/walks.py): one deterministic length-6
    walk per vertex of the symmetrized link graph — the embedding-
    training input materialization (DeepWalk corpus)."""
    from combblas_spark.algos.walks import random_walks

    return random_walks(
        spark, _graph(spark, sf_dir), walk_len=WALK_LEN, seed=WALK_SEED
    )


def q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic-centrality gate (algos/harmonic.py): Σ 1/d(s, v) over a
    fixed 4-source batch to depth 4 — the sampled estimator web-scale
    closeness runs (same batching shape as the betweenness gate)."""
    from combblas_spark.algos.harmonic import harmonic_centrality

    return harmonic_centrality(
        spark, _graph(spark, sf_dir), sources=HARM_SOURCES, max_depth=HARM_DEPTH
    )


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss gate (algos/truss.py): 2 support-peel rounds toward the
    12-truss of the co-purchase graph — the edge-analogue of kcore and
    the iterated consumer of the masked-SpGEMM wedge pipeline."""
    from combblas_spark.algos.truss import ktruss_rounds

    return ktruss_rounds(
        spark, _copurchase_graph(spark, sf_dir), k=KTRUSS_K, rounds=KTRUSS_ROUNDS
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf term-salience gate (pipeline/text.py::tfidf_topk): top-3
    tf×ln(N/df) tokens per document."""
    from combblas_spark.pipeline.text import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), k=TFIDF_K)


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.kcore import kcore

    return kcore(spark, _graph(spark, sf_dir), k=KCORE_K)


def q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.components import connected_components

    return connected_components(spark, _graph(spark, sf_dir))


def q_cc_as(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Awerbuch–Shiloach hooking variant (CC.h:1194-1341) — converges
    to the same (v, comp=min-member-id) labels as FastSV, so it shares
    the CC oracle; gating both paths makes the cross-path consistency
    check a driver-level gate, not just a pytest."""
    from combblas_spark.algos.components import connected_components_as

    return connected_components_as(spark, _graph(spark, sf_dir))


def q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.labelprop import label_propagation

    return label_propagation(spark, _graph(spark, sf_dir), n_iter=LP_ITERS)


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.triangles import triangle_count

    # same input graph as q_triangles_pv BY CONSTRUCTION — both gates
    # must run on one definition or a tweak to one silently diverges them
    n = triangle_count(spark, _copurchase_graph(spark, sf_dir))
    return spark.createDataFrame([(n,)], schema="n_triangles long")


def _copurchase_graph(spark, sf_dir):
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
    return Graph(edges=und, n_partitions=32)


def q_triangles_pv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle credit (each triangle to all 3 corners) —
    the per-vertex output of the masked-SpGEMM pattern the reference
    reduces in MaximalIndependentSet/clustering-coefficient uses."""
    from combblas_spark.algos.triangles import per_vertex_triangles

    return per_vertex_triangles(spark, _copurchase_graph(spark, sf_dir))


def q_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient gate — the canonical consumer of
    the masked-SpGEMM triangle kernel (the reference's README names
    clustering coefficients as the Square/EWiseMult use case); same
    co-purchase input graph as the triangle gates BY CONSTRUCTION."""
    from combblas_spark.algos.triangles import local_clustering

    return local_clustering(spark, _copurchase_graph(spark, sf_dir))


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link-prediction gate (algos/linkpred.py): top-3
    related vertices per query vertex on the co-purchase graph — the
    complement-masked SpGEMM row with 1/ln-degree votes."""
    from combblas_spark.algos.linkpred import adamic_adar_topk

    return adamic_adar_topk(
        spark, _copurchase_graph(spark, sf_dir), k=AA_K, max_src=AA_MAX_SRC
    )


def q_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link-prediction gate (algos/linkpred.py jaccard_topk):
    top-3 related vertices per query vertex — the constant-1 wedge
    semiring normalized by neighborhood-union size."""
    from combblas_spark.algos.linkpred import jaccard_topk

    return jaccard_topk(
        spark, _copurchase_graph(spark, sf_dir), k=AA_K, max_src=AA_MAX_SRC
    )


def q_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF / neighborhood-function gate (algos/anf.py): N(0)..N(4) via
    OR-semiring Flajolet-Martin sketch SpMV — deterministic affine
    hash, so the approximate estimator is bit-exact vs the oracle."""
    from combblas_spark.algos.anf import neighborhood_function

    return neighborhood_function(spark, _copurchase_graph(spark, sf_dir), h=ANF_H)


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + recrawl-dedup gate (pipeline/web.py):
    the synthetic crawl (sources/pages.py) plus two deterministic
    variant families (uppercase www + tracking-query recrawl, http
    mirror with fragment) collapsed to one row per canonical URL,
    latest capture winning."""
    from combblas_spark.pipeline.web import crawl_dedup
    from combblas_spark.sources.pages import synth_pages

    pages = synth_pages(spark, URL_N, seed=42, n_partitions=4)
    pid = F.regexp_extract(F.col("url"), "p([0-9]+)$", 1).cast("long")
    base = pages.select("url", pid.alias("ver"))
    stripped = F.regexp_replace(F.col("url"), "^https://", "")
    recrawl = base.filter(F.col("ver") % 3 == 0).select(
        F.concat(
            F.lit("HTTPS://WWW."), F.upper(stripped), F.lit("/?utm_source=rss#frag")
        ).alias("url"),
        (F.col("ver") + 1000000).alias("ver"),
    )
    mirror = base.filter(F.col("ver") % 7 == 0).select(
        F.concat(F.lit("http://"), stripped, F.lit("#top")).alias("url"),
        (F.col("ver") + 2000000).alias("ver"),
    )
    return crawl_dedup(base.unionByName(recrawl).unionByName(mirror), "ver")


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document span-dedup gate (pipeline/web.py):
    per-document survivorship after corpus-wide first-occurrence
    filtering of 5-token spans."""
    from combblas_spark.pipeline.web import span_dedup

    return span_dedup(_docs(spark, sf_dir), span_tokens=SPAN_TOKENS)


def q_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids gate (pipeline/text.py tokenize_ids): top-15
    corpus vocabulary, OOV→0, per-doc id sequences — the encode step
    between vocabulary building (vocab15) and sequence packing
    (pack_seqs)."""
    from combblas_spark.pipeline.text import tokenize_ids

    return tokenize_ids(_docs(spark, sf_dir), vocab_size=VOCAB_IDS_V)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing gate (pipeline/web.py): deterministic doc_id-
    derived PII injection (emails / IPv4s / phone numbers with varying
    multiplicity), JVM regexp counting + typed-placeholder replacement;
    scrubbed text compared via md5."""
    from combblas_spark.pipeline.web import pii_scrub

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    txt = F.concat(
        F.col("text"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" contact user"),
                (did % 50).cast("string"),
                F.lit("@mail"),
                (did % 7).cast("string"),
                F.lit(".example"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 > 0,
            F.concat(
                F.lit(" ip 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.concat(F.lit(" call +1-555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" or +1-555-"),
                F.lpad(((did + 1) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    inj = docs.select("doc_id", txt.alias("text"))
    out = pii_scrub(inj)
    return out.select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.md5("scrubbed").alias("scrub_md5"),
    )


def _anchors_sql(n_pages: int) -> str:
    """Anchor-text index (sources/extract.py anchor_index): the synth
    crawl's anchor for link (src→dst) is 'to {dst}' by construction
    (sources/pages.py _render_page), so the oracle re-derives the term
    stream from the pinned pure-link-rule edge fixture — the same
    fixture the webgraph_pagerank gate proves byte-equivalent to the
    live html extraction."""
    return f"""
WITH dict AS MATERIALIZED (
  -- the fixture's vertex ids are the url-dictionary's dense rank over
  -- the SORTED url list (make_oracle_fixtures.make_webgraph_edges);
  -- rebuild it and map ids back to urls / page numbers
  SELECT url, row_number() OVER (ORDER BY url) - 1 AS id,
         CAST(regexp_extract(url, 'p([0-9]+)$', 1) AS BIGINT) AS page
  FROM (SELECT 'https://site' || (i % 97) || '.example/p' || i AS url
        FROM generate_series(0, {n_pages - 1}) t(i))
),
e AS MATERIALIZED (
  SELECT d.url AS dst_url, d.page AS dst_page
  FROM read_parquet('{_fixture("webgraph_edges.parquet")}') f
  JOIN dict d ON d.id = f.dst
),
toks AS MATERIALIZED (
  SELECT dst_url, 'to' AS term FROM e
  UNION ALL
  SELECT dst_url, CAST(dst_page AS VARCHAR) FROM e
),
counts AS MATERIALIZED (
  SELECT dst_url, term, count(*) AS cnt FROM toks GROUP BY dst_url, term
),
per AS MATERIALIZED (
  SELECT dst_url, count(DISTINCT term) AS n_terms, sum(cnt) AS n_anchor_terms
  FROM counts GROUP BY dst_url
),
top AS MATERIALIZED (
  SELECT dst_url, term AS top_term FROM (
    SELECT dst_url, term,
           row_number() OVER (PARTITION BY dst_url ORDER BY cnt DESC, term ASC) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT p.dst_url, p.n_terms, p.n_anchor_terms, t.top_term
FROM per p JOIN top t USING (dst_url)
"""


def q_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index gate (sources/extract.py): live html →
    Arrow-batched (src, dst, anchor) extraction → per-target term
    counts, distinct-term count, and dominant term."""
    from combblas_spark.sources.extract import anchor_index
    from combblas_spark.sources.pages import synth_pages

    return anchor_index(synth_pages(spark, URL_N, seed=42, n_partitions=4))


def q_neigh_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style neighbor-sampling gate (algos/sampling.py):
    deterministic (3, 2)-fanout message-flow blocks from a capped root
    set on the co-purchase graph."""
    from combblas_spark.algos.sampling import neighbor_sample

    return neighbor_sample(
        spark,
        _copurchase_graph(spark, sf_dir),
        fanouts=NS_FANOUTS,
        max_root=NS_MAX_ROOT,
        seed=NS_SEED,
    )


def q_recip_assort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digraph shape-metrics gate (reciprocity + degree assortativity,
    operators/reduce.py) on the line-number-ordered co-purchase
    digraph — non-bipartite and non-symmetric, so both metrics are
    non-vacuous (reciprocity strictly between 0 and 1)."""
    from combblas_spark.operators.reduce import reciprocity_assortativity
    from combblas_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    a, b = li.alias("a"), li.alias("b")
    de = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    return reciprocity_assortativity(de)


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


def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.bfs import bfs

    return bfs(spark, _graph(spark, sf_dir), source=BFS_SRC, max_iter=BFS_LEVELS)


def q_dobfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direction-optimizing BFS (DirOptBFS.cpp:364-440) — must agree
    with the top-down oracle exactly (cross-path consistency)."""
    from combblas_spark.algos.bfs import bfs_dir_opt

    return bfs_dir_opt(
        spark, _graph(spark, sf_dir), source=BFS_SRC, max_iter=BFS_LEVELS
    )


def q_bfs_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-parent BFS (RandomParentBFS.cpp:92-117): level sets match
    bfs4 exactly; the parent choice is the min seeded-XXH64 priority
    among eligible parents, gated against the pinned priority fixture."""
    from combblas_spark.algos.bfs import random_parent_bfs

    return random_parent_bfs(
        spark, _graph(spark, sf_dir), source=BFS_SRC, seed=42,
        max_iter=BFS_LEVELS,
    )


def q_bfs_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-child BFS (SingleChildBFS.cpp:280-281): bfs4's parent
    assignment plus the one-representative-child-per-parent frontier
    flag (fringe.Uniq analogue)."""
    from combblas_spark.algos.bfs import single_child_bfs

    return single_child_bfs(
        spark, _graph(spark, sf_dir), source=BFS_SRC, max_iter=BFS_LEVELS
    )


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.algos.sssp import sssp_rounds

    d = sssp_rounds(spark, _graph(spark, sf_dir), source=BFS_SRC, n_rounds=SSSP_ROUNDS)
    return d.select("v", F.round("dist", 6).alias("dist"))


def q_spgemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataclasses import replace

    from combblas_spark.operators.spgemm import spgemm

    g = _graph(spark, sf_dir).symmetrize()
    ga = replace(g, edges=g.edges.filter(F.col("src") <= SPGEMM_MAX_SRC))
    c = spgemm(ga, g)
    return c.edges.select("src", "dst", F.round("w", 6).alias("w"))


def q_masked_colsums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaskedReduce: column sums fed only by odd-customer rows — the
    mask indexes the non-reduced (src) dimension per the reference."""
    from combblas_spark.operators.reduce import masked_reduce
    from combblas_spark.sources.tables import load_table

    g = _graph(spark, sf_dir)
    mask = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 1)
        .select(F.col("c_custkey").alias("v"))
    )
    out = masked_reduce(g, mask, dim="dst")
    return out.select("v", F.round("val", 6).alias("colsum"))


def _docs(spark, sf_dir):
    from combblas_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.dedup import contamination_screen

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    return contamination_screen(docs, bench, n=CONTAM_N, threshold=CONTAM_T)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=JACCARD_N, threshold=JACCARD_T)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.dedup import dedup_survivors, ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=JACCARD_N, threshold=JACCARD_T)
    return dedup_survivors(spark, docs, pairs)


def q_doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import split_assign

    return split_assign(_docs(spark, sf_dir))


BUDGET_TOKENS = 15_000  # ~55% of the sf0.01 corpus: exercises full buckets,
# the boundary bucket, and dropped buckets all at once


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import budget_select

    return budget_select(_docs(spark, sf_dir), BUDGET_TOKENS)


def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import mixture_sample

    return mixture_sample(_docs(spark, sf_dir), MIX_RATES, default_rate=MIX_DEFAULT)


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import top_tokens

    return top_tokens(_docs(spark, sf_dir), VOCAB_K)


REP_N = 2  # repetition-stats shingle width


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import repetition_stats

    return repetition_stats(_docs(spark, sf_dir), n=REP_N)


SEQ_LEN = 128  # tokens per packed training sequence at oracle scale


def q_pack_seqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), SEQ_LEN)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import language_id

    return language_id(_docs(spark, sf_dir))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import quality_score

    return quality_score(_docs(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.text import token_stats

    return token_stats(_docs(spark, sf_dir))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from combblas_spark.pipeline.similarity import cosine_topk_brute
    from combblas_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_NQ)
    return cosine_topk_brute(emb, queries, k=ANN_K)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN in exact mode: the coarse k-means inverted lists
    PARTITION the corpus, so probing every list (nprobe = n_clusters)
    short-lists every vector and the re-rank is byte-identical to the
    brute top-k — COSINE_TOPK_SQL gates the whole index/probe/re-rank
    path regardless of what the quantizer learned.  Recall at
    nprobe < n_clusters is pytest-gated (tests/test_pipeline.py)."""
    from combblas_spark.pipeline.ivf import ivf_topk
    from combblas_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_NQ)
    return ivf_topk(
        emb, queries, k=ANN_K, n_clusters=8, nprobe=8, kmeans_iters=2
    )


def q_embed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the block-grid matmul
    join: exact (recall 1.0, same oracle), but candidate pairs never
    materialize as Spark rows — each upper-triangle block-pair task
    runs one BLAS matmul and emits survivors only.  Sign-LSH cannot
    prune at τ=0.4 on near-random vectors (recall-1.0 configs generate
    ≥ all-pairs candidates — measured, see similarity.py); the LSH path
    remains the scale plan for the high-threshold dedup regime and is
    pytest recall-gated."""
    from combblas_spark.pipeline.similarity import cosine_near_pairs_blocked
    from combblas_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_pairs_blocked(emb, threshold=EMBED_T, block_size=1024)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full oracle gate: JVM signatures + slice-equality banding +
    exact-Jaccard verification vs the pinned pure-Python signature
    fixture banded/verified in SQL (_minhash_lsh_sql)."""
    from combblas_spark.pipeline.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=JACCARD_T)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full oracle gate: the live JVM signature computation must equal
    the pinned scalar-reference fixture row for row (byte-exactness,
    previously pytest-only — now driver-visible)."""
    from combblas_spark.pipeline.dedup import simhash_signatures

    return simhash_signatures(_docs(spark, sf_dir))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 retrieval via 16-bit block LSH; the oracle
    reruns the block retrieval with integer bit ops over the pinned
    signatures (_simhash_pairs_sql)."""
    from combblas_spark.pipeline.dedup import simhash_near_pairs

    return simhash_near_pairs(
        _docs(spark, sf_dir), max_hamming=SIMHASH_MAX_HAMMING
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/featurize plumbing over the deterministic
    synthetic media table (stubbed codec), oracle-gated against the
    pinned ``media_features.parquet`` fixture — an INDEPENDENT
    pure-Python scalar reimplementation of the splitmix64 pixel chain
    (scripts/make_oracle_fixtures.make_media_features), so the
    Arrow-batched numpy kernel is genuinely cross-validated.

    Output is exploded to one row per (media, band) with the float32
    band mean rounded at 4 decimals as a double — the value-hashable
    form the driver's canonicalizer handles."""
    from combblas_spark.pipeline.multimodal import decode_and_featurize, synth_media

    feats = decode_and_featurize(synth_media(spark, 200, seed=42), feat_dim=8)
    return feats.select(
        "media_id",
        "kind",
        "decoded_w",
        "decoded_h",
        F.posexplode("features").alias("band", "_f"),
    ).select(
        "media_id",
        "kind",
        "decoded_w",
        "decoded_h",
        "band",
        F.round(F.col("_f").cast("double"), 4).alias("feat"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: 30-min-gap sessionization of the
    events table (lag + cumulative sum session ids)."""
    from combblas_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
    )


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame coverage: 7-day moving average of daily event
    counts per event type (ROWS BETWEEN 6 PRECEDING AND CURRENT)."""
    from combblas_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n",
        F.round(F.avg("n").over(w), 6).alias("ma7"),
    )


def q_cc_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram (HistCC, CC.h:1576-1617)."""
    from combblas_spark.algos.components import connected_components
    from combblas_spark.operators.reduce import histogram

    labels = connected_components(spark, _graph(spark, sf_dir))
    return histogram(labels, key="comp").select("size", "n")


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full oracle gate: Luby rounds unrolled in SQL over the pinned
    priority fixture (seeded xxhash64 priorities are materialized, not
    recomputed, on the DuckDB side); independence+maximality invariants
    stay in tests."""
    from combblas_spark.algos.mis import maximal_independent_set

    return maximal_independent_set(spark, _graph(spark, sf_dir), seed=42)


def q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy distance-1 coloring gate (algos/coloring.py): speculative
    mex + priority conflict resolution over the same pinned-priority
    chain as the mis gate; validity/palette invariants stay in tests."""
    from combblas_spark.algos.coloring import greedy_coloring

    return greedy_coloring(
        spark, _graph(spark, sf_dir), seed=COLOR_SEED, offset_cap=COLOR_CAP
    )


MATCH_ROUNDS = 3


def q_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy bipartite maximal matching, 3 fixed rounds
    (BPMaximalMatching.h:84-130) — deterministic min-min choices, so
    the unrolled SQL oracle reproduces it exactly."""
    from combblas_spark.algos.matching import maximal_bipartite_matching

    return maximal_bipartite_matching(
        spark, _graph(spark, sf_dir), max_iter=MATCH_ROUNDS, allow_partial=True
    )


def q_awpm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AWPM weight-improvement gate (ApproxWeightPerfectMatching.h:
    791-1120): two fixed TwoThirdApprox rounds on the link graph
    starting from the matching3 greedy matching — each round applies
    every vertex-disjoint positive-gain alternating 4-cycle the
    Phase3/Phase4 winner selection admits."""
    from combblas_spark.algos.awpm import two_third_approx
    from combblas_spark.algos.matching import maximal_bipartite_matching

    g = _graph(spark, sf_dir)
    mate = maximal_bipartite_matching(
        spark, g, max_iter=MATCH_ROUNDS, allow_partial=True
    )
    return two_third_approx(spark, g, mate, fixed_iters=AWPM_ITERS)


def q_rcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse Cuthill-McKee permutation gate (Ordering/RCM.cpp):
    min-degree source, symmetrized BFS levels, (level, degree, id)
    rank reversed — fully deterministic, unrolled in _rcm_sql."""
    from combblas_spark.algos.matching import rcm_ordering

    return rcm_ordering(spark, _graph(spark, sf_dir))


def q_matching_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-cardinality matching gate (BPMaximumMatching.h:231-420)
    on the deterministic slice where greedy is NOT maximum (per-src
    2 smallest suppliers, src <= MATCH_SLICE_SRC: greedy 16 < max 18
    at sf0.01) — the oracle unrolls greedy init + one MS-BFS phase +
    the augmentation walk; the Spark side runs the real convergence
    loop (phases until no augmenting path, Berge certificate)."""
    from combblas_spark.algos.matching import maximum_bipartite_matching
    from combblas_spark.graph import Graph

    g = _graph(spark, sf_dir)
    w = Window.partitionBy("src").orderBy("dst")
    e = (
        g.edges.filter(F.col("src") <= MATCH_SLICE_SRC)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= MATCH_SLICE_K)
        .select("src", "dst", "w")
    )
    return maximum_bipartite_matching(spark, Graph(edges=e, n_partitions=8))


def q_auction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auction-matching gate (algos/auction.py — the COMPLETE Bertsekas
    loop the reference's auction.cpp:60-438 sketches one round of).
    Same deterministic slice as matching_max plus one private
    weight-0.5 fallback object per bidder so the row side is perfectly
    matchable and the auction terminates; eps = 0.125 (dyadic) keeps
    the round-by-round price state bit-identical to the SQL unroll.
    The Spark side runs the real convergence loop (measured 4 rounds at
    sf0.01; the unroll carries {AUCTION_ROUNDS} with trailing no-ops)."""
    from combblas_spark.algos.auction import auction_matching
    from combblas_spark.graph import Graph

    g = _graph(spark, sf_dir)
    w = Window.partitionBy("src").orderBy("dst")
    e = (
        g.edges.filter(F.col("src") <= MATCH_SLICE_SRC)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= MATCH_SLICE_K)
        .select("src", "dst", "w")
    )
    fb = e.select("src").distinct().select(
        "src",
        (F.col("src") + AUCTION_FALLBACK).alias("dst"),
        F.lit(0.5).alias("w"),
    )
    return auction_matching(
        spark, Graph(edges=e.unionByName(fb), n_partitions=8), eps=AUCTION_EPS
    )


def q_mcl_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-MCL step gate (IncClust.h:610-900): the REAL
    assemble_minc block assembly (normalizedAssign rescale included)
    over the pinned summary + new-batch input fixtures, then the same
    fixed-iteration MCL engine the mcl2 gate runs — the oracle
    recomputes the whole assemble→expand→prune→inflate pipeline in
    unrolled SQL from the same inputs."""
    from combblas_spark.algos.incremental import assemble_minc
    from combblas_spark.algos.mcl import mcl_fixed
    from combblas_spark.graph import Graph

    summary = spark.read.parquet(_fixture("mcl_inc_summary.parquet"))
    ne = spark.read.parquet(_fixture("mcl_inc_new_edges.parquet"))
    old = (
        summary.select(F.col("src").alias("v"))
        .unionByName(summary.select(F.col("dst").alias("v")))
        .distinct()
    )
    assembled = assemble_minc(old, summary, ne, normalized_assign=True)
    assembled = assembled.withColumn("w", F.round("w", MCL_QUANT))
    m = mcl_fixed(
        spark,
        Graph(edges=assembled, n_partitions=4),
        n_iter=MCL_ITERS,
        inflation=MCL_INFLATION,
        prune_below=MCL_PRUNE,
        select_k=MCL_K,
        quantize=MCL_QUANT,
    )
    return m.select("src", "dst", F.round("w", 6).alias("w"))


def _sym_unit_graph(spark: SparkSession, sf_dir: str, max_src: int | None = None):
    """Symmetrized 0/1-weight view of the link graph (SYM_EDGES_CTE);
    ``max_src`` bounds it to the deterministic src-slice subgraph."""
    from combblas_spark.graph import Graph

    g = _graph(spark, sf_dir)
    e = g.edges.select("src", "dst")
    if max_src is not None:
        e = e.filter(F.col("src") <= max_src)
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .withColumn("w", F.lit(1.0))
        # pin: downstream DAGs (loops ∪ sym, per-column sums ⋈ sym, …)
        # reference this subtree many times — without the checkpoint the
        # orders⋈lineitem base join re-executes once per reference
        .localCheckpoint(eager=True)
    )
    return Graph(edges=sym, n_partitions=g.n_partitions)


def q_mcl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCL flagship gate (MCL.cpp:563-620): 2 fixed expansion→prune/
    top-k→inflate→normalize iterations on the symmetrized link graph,
    recovery and convergence disabled so the unrolled SQL oracle
    reproduces the exact matrix state."""
    from combblas_spark.algos.mcl import mcl_fixed

    m = mcl_fixed(
        spark,
        _sym_unit_graph(spark, sf_dir, max_src=MCL_MAX_SRC),
        n_iter=MCL_ITERS,
        inflation=MCL_INFLATION,
        prune_below=MCL_PRUNE,
        select_k=MCL_K,
        quantize=MCL_QUANT,
    )
    return m.select("src", "dst", F.round("w", 6).alias("w"))


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched-Brandes gate (BetwCent.cpp:126-220): fixed source batch,
    fixed BFS depth (k-hop betweenness) — deterministic, so the forward
    sigma + backward delta recursion unrolls to SQL exactly."""
    from combblas_spark.algos.betweenness import betweenness_centrality

    bc = betweenness_centrality(
        spark,
        _graph(spark, sf_dir),
        sources=BC_SOURCES,
        symmetrize=True,
        max_depth=BC_DEPTH,
    )
    return bc.select("v", F.round("bc", 6).alias("bc"))


def q_induced_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InducedSubgraphs coverage (SpParMat.h:108): per-component edge
    counts of the label-induced subgraphs."""
    from combblas_spark.algos.components import connected_components
    from combblas_spark.operators.indexing import induced_subgraphs

    g = _graph(spark, sf_dir)
    labels = connected_components(spark, g)
    sub = induced_subgraphs(g, labels, label_col="comp")
    return sub.groupBy("comp").agg(F.count("*").alias("n_edges"))


def q_largest_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LargestCC.cpp:164-214 driver: extract the largest connected
    component and relabel its vertices densely 0..n'-1 (the SubsRef
    compaction); returns the induced edge list."""
    from combblas_spark.algos.incpipeline import largest_cc

    sub, _comp, _size = largest_cc(spark, _graph(spark, sf_dir))
    return sub.edges.select("src", "dst", "w")


def q_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandwidth + Profile metrics (SpParMat.h:139-140) as one row,
    computed in a single fused aggregate (one driver action)."""
    from combblas_spark.operators.reduce import bandwidth_profile

    g = _graph(spark, sf_dir)
    bw, prof = bandwidth_profile(g)
    return spark.createDataFrame(
        [(bw, prof)], schema="bandwidth long, profile long"
    )


def q_mtx_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ParallelWriteMM / ParallelReadMM coverage (SpParMat.cpp:3987,
    4127): the link graph round-trips through the sharded MatrixMarket
    writer + distributed reader, then reduces to out-degrees — the
    oracle row set matches iff the round-trip is lossless."""
    import tempfile

    from combblas_spark.sources.matrixmarket import (
        read_matrix_market,
        write_matrix_market,
    )

    g = _graph(spark, sf_dir)
    # mkdtemp: unique per invocation — concurrent runs in one sandbox
    # can no longer interleave writes into the same round-trip dir
    path = os.path.join(tempfile.mkdtemp(prefix="combblas-mtx-"), "mm")
    write_matrix_market(g, path, gathered=False)
    mm = read_matrix_market(spark, path)
    return mm.graph.out_degrees()


def q_hostrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level rank on the live ingest path: synthetic pages →
    link extraction → host rollup (parse_url) → PageRank on the host
    graph → ranks joined back to host names."""
    from combblas_spark.algos.pagerank import pagerank_fixed
    from combblas_spark.sources.pages import synth_pages
    from combblas_spark.sources.webgraph import host_graph

    pages = synth_pages(spark, 256, seed=42, n_partitions=4)
    hg = host_graph(pages, n_partitions=8)
    ranks = pagerank_fixed(spark, hg.graph, n_iter=PR_ITERS, alpha=ALPHA)
    return ranks.join(hg.dictionary, ranks["v"] == hg.dictionary["id"]).select(
        F.col("label").alias("v"), F.round("rank", 6).alias("rank")
    )


CURATE_K = 40  # pages kept by the rank-weighted curation gate


def q_host_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-signal-driven corpus curation — the cross-component
    flagship tying the link-graph half to the training-pipeline half:
    pages → Arrow-UDF text extraction → JVM host rollup → PageRank on
    the host graph → each page scored rank(host)·sqrt(n_tokens) → the
    top-K pages selected for the training corpus.

    100 TB shape: host ranks are tiny (hosts ≪ urls) and broadcast
    onto the page scan; per-page metadata is one narrow column-pruned
    pass over html; the selection is orderBy().limit() — Spark's
    distributed TakeOrderedAndProject, per-partition top-K then a
    driver merge of K·P candidate rows, never a global sort."""
    from combblas_spark.algos.pagerank import pagerank_fixed
    from combblas_spark.sources.extract import extract_text
    from combblas_spark.sources.pages import synth_pages
    from combblas_spark.sources.webgraph import host_graph

    pages = synth_pages(spark, 256, seed=42, n_partitions=4)
    hg = host_graph(pages, n_partitions=8)
    ranks = pagerank_fixed(spark, hg.graph, n_iter=PR_ITERS, alpha=ALPHA)
    host_rank = ranks.join(hg.dictionary, ranks["v"] == hg.dictionary["id"]).select(
        F.col("label").alias("host"), F.round("rank", 6).alias("rank")
    )
    meta = pages.select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.size(F.split(extract_text(F.col("html")), " ", -1))
        .cast("long")
        .alias("n_tokens"),
    )
    scored = meta.join(F.broadcast(host_rank), "host").select(
        "url",
        "host",
        "n_tokens",
        "rank",
        F.round(F.col("rank") * F.sqrt(F.col("n_tokens")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("url")).limit(CURATE_K)


def q_webgraph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full oracle gate for the north-star ingest path — synthetic
    Common-Crawl-style pages → Arrow-UDF text/link extraction → url→id
    dictionary → PageRank; the oracle unrolls PageRank over the pinned
    pure-link-rule edge fixture (html parsing itself is not
    SQL-expressible, so the extracted edges are materialized)."""
    from combblas_spark.algos.pagerank import pagerank_fixed
    from combblas_spark.sources.webgraph import synth_web_graph

    wg = synth_web_graph(spark, 256, seed=42, n_partitions=8)
    ranks = pagerank_fixed(spark, wg.graph, n_iter=PR_ITERS, alpha=ALPHA)
    return ranks.select("v", F.round("rank", 6).alias("rank"))


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
        "kcore": q_kcore,
        "hits5": q_hits,
        "salsa5": q_salsa,
        "katz5": q_katz,
        "clustering_coeff": q_clustering,
        "adamic_adar3": q_adamic_adar,
        "jaccard_lp3": q_jaccard_links,
        "anf4": q_anf,
        "eff_diam": q_eff_diam,
        "heavy10": q_heavy_hitters,
        "wsample20": q_wsample,
        "neigh_sample": q_neigh_sample,
        "recip_assort": q_recip_assort,
        "harmonic4": q_harmonic,
        "walks6": q_walks,
        "mst": q_mst,
        "bowtie": q_bowtie,
        "ktruss12": q_ktruss,
        "tfidf3": q_tfidf,
        "ppr5": q_ppr,
        "pagerank_inc": q_pagerank_inc,
        "wpagerank5": q_wpagerank,
        "cc_as": q_cc_as,
        "labelprop2": q_labelprop,
        "triangles": q_triangles,
        "triangles_pv": q_triangles_pv,
        "degrees": q_degrees,
        "colsums": q_colsums,
        "kselect_top2": q_kselect,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "bfs4": q_bfs,
        "dobfs4": q_dobfs,
        "bfs_rand4": q_bfs_rand,
        "bfs_child4": q_bfs_child,
        "sssp4": q_sssp,
        "spgemm_rows": q_spgemm,
        "masked_colsums": q_masked_colsums,
        "ngram_jaccard": q_ngram_jaccard,
        "contamination": q_contamination,
        "dedup_survivors": q_dedup_survivors,
        "doc_split": q_doc_split,
        "budget_select": q_budget_select,
        "pack_seqs": q_pack_seqs,
        "repetition": q_repetition,
        "mixture": q_mixture,
        "vocab15": q_vocab,
        "lang_id": q_lang_id,
        "url_dedup": q_url_dedup,
        "anchors": q_anchors,
        "span_dedup": q_span_dedup,
        "pii_scrub": q_pii_scrub,
        "token_ids15": q_token_ids,
        "quality": q_quality,
        "fingerprint": q_fingerprint,
        "token_stats": q_token_stats,
        "cosine_topk5": q_cosine_topk,
        "ivf_topk5": q_ivf_topk,
        "embed_pairs": q_embed_pairs,
        "minhash_lsh": q_minhash_lsh,
        "simhash64": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "media_features": q_media_features,
        "matching3": q_matching,
        "matching_max": q_matching_max,
        "auction2": q_auction,
        "awpm2": q_awpm,
        "rcm": q_rcm,
        "mcl2": q_mcl,
        "mcl_inc": q_mcl_inc,
        "betweenness": q_betweenness,
        "induced_edges": q_induced_edges,
        "largest_cc": q_largest_cc,
        "graph_metrics": q_graph_metrics,
        "mtx_degrees": q_mtx_degrees,
        "webgraph_pagerank": q_webgraph_pagerank,
        "hostrank": q_hostrank,
        "host_curation": q_host_curation,
        "sessionize": q_sessionize,
        "moving_avg7": q_moving_avg,
        "cc_hist": q_cc_hist,
        "mis": q_mis,
        "coloring": q_coloring,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank5": _pagerank_sql(PR_ITERS),
        "cc": _cc_sql(CC_ROUNDS),
        "kcore": _kcore_sql(KCORE_K, KCORE_ROUNDS),
        "hits5": _hits_sql(PR_ITERS),
        "salsa5": _salsa_sql(PR_ITERS),
        "katz5": _katz_sql(PR_ITERS, KATZ_ALPHA, KATZ_BETA),
        "clustering_coeff": CLUSTERING_SQL,
        "adamic_adar3": _adamic_adar_sql(AA_K, AA_MAX_SRC),
        "jaccard_lp3": _jaccard_links_sql(AA_K, AA_MAX_SRC),
        "anf4": _anf_sql(ANF_H),
        "eff_diam": _eff_diam_sql(ANF_H, 0.9),
        "heavy10": _heavy_hitters_sql(CMS_W, CMS_K),
        "wsample20": _wsample_sql(WSAMPLE_K),
        "neigh_sample": _neigh_sample_sql(NS_FANOUTS, NS_MAX_ROOT, NS_SEED),
        "recip_assort": RECIP_ASSORT_SQL,
        "harmonic4": _harmonic_sql(HARM_SOURCES, HARM_DEPTH),
        "walks6": _walks_sql(WALK_LEN, WALK_SEED),
        "mst": _mst_sql(MST_ROUNDS, MST_JUMPS),
        "bowtie": _bowtie_sql(BOWTIE_LEVELS),
        "ktruss12": _ktruss_sql(KTRUSS_K, KTRUSS_ROUNDS),
        "tfidf3": _tfidf_sql(TFIDF_K),
        "ppr5": _ppr_sql(PR_ITERS, PPR_SEEDS),
        "pagerank_inc": _pagerank_inc_sql(PR_ITERS, PR_INC_ITERS, PR_INC_SPLIT),
        "wpagerank5": _wpagerank_sql(PR_ITERS),
        "cc_as": _cc_sql(CC_ROUNDS),
        "labelprop2": _labelprop_sql(LP_ITERS),
        "triangles": TRIANGLES_SQL,
        "triangles_pv": TRIANGLES_PV_SQL,
        "degrees": DEGREES_SQL,
        "colsums": COLSUMS_SQL,
        "kselect_top2": KSELECT_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "text_stats": TEXT_STATS_SQL,
        "bfs4": _bfs_sql(BFS_LEVELS, BFS_SRC),
        "dobfs4": _bfs_sql(BFS_LEVELS, BFS_SRC),
        "bfs_child4": _bfs_child_sql(BFS_LEVELS, BFS_SRC),
        "sssp4": _sssp_sql(SSSP_ROUNDS, BFS_SRC),
        "spgemm_rows": SPGEMM_SQL,
        "masked_colsums": MASKED_COLSUMS_SQL,
        "ngram_jaccard": NGRAM_JACCARD_SQL,
        "contamination": CONTAMINATION_SQL,
        "dedup_survivors": _dedup_survivors_sql(),
        "doc_split": _doc_split_sql(),
        "budget_select": _budget_select_sql(),
        "pack_seqs": _pack_seqs_sql(),
        "repetition": _repetition_sql(),
        "mixture": _mixture_sql(),
        "vocab15": VOCAB_SQL,
        "lang_id": _lang_id_sql(),
        "url_dedup": _url_dedup_sql(URL_N),
        "anchors": _anchors_sql(URL_N),
        "span_dedup": _span_dedup_sql(SPAN_TOKENS),
        "pii_scrub": _pii_scrub_sql(),
        "token_ids15": _token_ids_sql(VOCAB_IDS_V),
        "quality": _quality_sql(),
        "fingerprint": FINGERPRINT_SQL,
        "token_stats": TOKEN_STATS_SQL,
        "cosine_topk5": COSINE_TOPK_SQL,
        "ivf_topk5": COSINE_TOPK_SQL,
        "embed_pairs": EMBED_PAIRS_SQL,
        "matching3": _matching_sql(MATCH_ROUNDS),
        "matching_max": _matching_max_sql(),
        "auction2": _auction_sql(AUCTION_ROUNDS),
        "awpm2": _awpm_sql(MATCH_ROUNDS, AWPM_ITERS),
        "rcm": _rcm_sql(RCM_LEVELS),
        "mcl2": _mcl_sql(MCL_ITERS),
        "mcl_inc": _mcl_inc_sql(MCL_ITERS),
        "betweenness": _betweenness_sql(BC_SOURCES, BC_DEPTH),
        "induced_edges": INDUCED_EDGES_SQL,
        "largest_cc": LARGEST_CC_SQL,
        "graph_metrics": GRAPH_METRICS_SQL,
        "mtx_degrees": DEGREES_SQL,
        "sessionize": SESSIONIZE_SQL,
        "moving_avg7": MOVING_AVG_SQL,
        "cc_hist": _cc_hist_sql(CC_ROUNDS),
        # pinned-fixture oracles (dist/oracle_fixtures, generated by the
        # independent pure-Python references in make_oracle_fixtures.py)
        "mis": _mis_sql(MIS_ROUNDS),
        "coloring": _coloring_sql(COLOR_ROUNDS, COLOR_CAP),
        "bfs_rand4": _bfs_rand_sql(BFS_LEVELS, BFS_SRC),
        "minhash_lsh": _minhash_lsh_sql(),
        "simhash64": _simhash_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "webgraph_pagerank": _webgraph_pagerank_sql(PR_ITERS),
        "hostrank": _hostrank_sql(PR_ITERS),
        "host_curation": _host_curation_sql(PR_ITERS, CURATE_K),
        "media_features": _media_features_sql(),
    }
