"""Golden tests for speculative greedy coloring (algos/coloring.py):
round-exact comparison against a pure-Python simulation of the same
speculate/resolve semantics, validity + palette invariants, and the
offset-cap behavior (one-round cliques under full rank offset)."""

from collections import defaultdict

from pyspark.sql import functions as F

from combblas_spark.sources import fixtures as FX


def _sym_adj(triples):
    adj = defaultdict(set)
    for s, d, *_ in triples:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def py_greedy_color(triples, pris, cap):
    """Pure-Python simulation of the speculative rounds: candidate =
    (min(r, cap)+1)-th free color (r = higher-priority active
    neighbors), adjacent equal candidates resolve by (pri, id)."""
    adj = _sym_adj(triples)
    color = {}
    active = set(adj)
    while active:
        cand = {}
        for v in active:
            used = {color[u] for u in adj[v] if u in color}
            r = sum(
                1
                for u in adj[v]
                if u in active and (pris[u], u) > (pris[v], v)
            )
            if cap is not None:
                r = min(r, cap)
            free = [c for c in range(0, r + len(used) + 1) if c not in used]
            cand[v] = free[r]
        losers = {
            v
            for v in active
            for u in adj[v]
            if u in active and cand[u] == cand[v] and (pris[u], u) > (pris[v], v)
        }
        winners = {v: cand[v] for v in active if v not in losers}
        color.update(winners)
        active -= set(winners)
    return color


def _spark_pris(spark, g, seed):
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .withColumn("pri", F.xxhash64(F.col("v"), F.lit(seed).cast("long")))
    )
    return {r["v"]: r["pri"] for r in verts.collect()}


def _assert_valid(triples, got):
    adj = _sym_adj(triples)
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        for u in nbrs:
            assert got[u] != got[v], f"conflict on edge ({u}, {v})"
        assert 0 <= got[v] <= len(nbrs), "palette exceeds deg+1 bound"


def test_coloring_matches_python_rounds(spark):
    from combblas_spark.algos.coloring import greedy_coloring

    g = FX.graph(spark, FX.SEVEN)
    for cap in (0, 2, None):
        got = {
            r["v"]: r["color"]
            for r in greedy_coloring(spark, g, seed=7, offset_cap=cap).collect()
        }
        want = py_greedy_color(FX.SEVEN, _spark_pris(spark, g, 7), cap)
        assert got == want, f"cap={cap}"
        _assert_valid(FX.SEVEN, got)


def test_coloring_clique_one_round_under_full_offset(spark):
    """K6 with full rank offset: the 6 ranks are distinct, so the whole
    clique colors with 6 distinct colors in the FIRST round (max_iter=1
    must not raise) — the behavior that de-serializes dense cores."""
    from combblas_spark.algos.coloring import greedy_coloring

    k6 = [(i, j, 1.0) for i in range(6) for j in range(i + 1, 6)]
    g = FX.graph(spark, k6)
    got = {
        r["v"]: r["color"]
        for r in greedy_coloring(
            spark, g, seed=3, max_iter=1, offset_cap=None
        ).collect()
    }
    assert sorted(got.values()) == [0, 1, 2, 3, 4, 5]
    _assert_valid(k6, got)


def test_coloring_mex_palette_is_tight_on_bipartite(spark):
    """Pure mex (cap=0) on an even cycle: exactly 2 colors — the
    speculative loop reproduces sequential greedy's optimum here."""
    from combblas_spark.algos.coloring import greedy_coloring

    cycle = [(i, (i + 1) % 8, 1.0) for i in range(8)]
    g = FX.graph(spark, cycle)
    got = {
        r["v"]: r["color"]
        for r in greedy_coloring(spark, g, seed=11, offset_cap=0).collect()
    }
    assert set(got.values()) == {0, 1}
    _assert_valid(cycle, got)
    want = py_greedy_color(cycle, _spark_pris(spark, g, 11), 0)
    assert got == want


def test_coloring_deterministic_across_runs(spark):
    from combblas_spark.algos.coloring import greedy_coloring

    g = FX.graph(spark, FX.SEVEN)
    a = sorted(
        (r["v"], r["color"])
        for r in greedy_coloring(spark, g, seed=42, offset_cap=0).collect()
    )
    b = sorted(
        (r["v"], r["color"])
        for r in greedy_coloring(spark, g, seed=42, offset_cap=0).collect()
    )
    assert a == b
