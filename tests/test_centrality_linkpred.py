"""Golden tests for the round-5 centrality/link-prediction additions:
truncated Katz, SALSA, local clustering coefficient, Adamic-Adar
top-k, and the reciprocity/assortativity shape metrics — each checked
against an independent dense numpy / pure-Python reference on the
SEVEN fixture graph (FIXTURES.md §2), mirroring the reference's
golden-output strategy (SURVEY.md §5)."""

import math

import numpy as np
import pytest

from combblas_spark.sources import fixtures as FX


def _seven_graph(spark):
    return FX.graph(spark, FX.SEVEN)


# ---------------------------------------------------------------------------
# Katz
# ---------------------------------------------------------------------------


def numpy_katz(triples, n, n_iter, alpha, beta):
    A = np.zeros((n, n))
    for s, d, w in triples:
        A[s, d] += w
    x = np.full(n, beta)
    for _ in range(n_iter):
        x = beta + alpha * (A.T @ x)
    return x


def test_katz_matches_numpy(spark):
    from combblas_spark.algos.katz import katz_fixed

    got = katz_fixed(spark, _seven_graph(spark), n_iter=4, alpha=0.1, beta=1.0)
    rows = {r["v"]: r["katz"] for r in got.collect()}
    want = numpy_katz(FX.SEVEN, 7, n_iter=4, alpha=0.1, beta=1.0)
    assert sorted(rows) == list(range(7))
    for v in range(7):
        assert rows[v] == pytest.approx(want[v], abs=1e-6)


def test_katz_zero_alpha_is_beta(spark):
    from combblas_spark.algos.katz import katz_fixed

    got = katz_fixed(spark, _seven_graph(spark), n_iter=3, alpha=0.0, beta=2.5)
    assert {r["katz"] for r in got.collect()} == {2.5}


# ---------------------------------------------------------------------------
# SALSA
# ---------------------------------------------------------------------------


def numpy_salsa(triples, n, n_iter):
    """Dense transcription of the salsa_fixed recursion: votes split by
    sender degree, each half-step L1-normalized."""
    A = np.zeros((n, n))
    for s, d, _ in triples:
        A[s, d] = 1.0  # distinct edges
    od = A.sum(axis=1)
    idg = A.sum(axis=0)
    hub = np.ones(n)
    auth = None
    for _ in range(n_iter):
        contrib = np.where(od > 0, hub / np.maximum(od, 1), 0.0)
        auth = A.T @ contrib
        auth = auth / auth.sum()
        back = np.where(idg > 0, auth / np.maximum(idg, 1), 0.0)
        hub = A @ back
        hub = hub / hub.sum()
    return hub, auth


def test_salsa_matches_numpy(spark):
    from combblas_spark.algos.hits import salsa_fixed

    got = salsa_fixed(spark, _seven_graph(spark), n_iter=3)
    rows = {r["v"]: (r["hub"], r["auth"]) for r in got.collect()}
    hub, auth = numpy_salsa(FX.SEVEN, 7, n_iter=3)
    for v in range(7):
        assert rows[v][0] == pytest.approx(hub[v], abs=1e-6)
        assert rows[v][1] == pytest.approx(auth[v], abs=1e-6)


def test_salsa_half_steps_l1_normalized(spark):
    from combblas_spark.algos.hits import salsa_fixed

    got = salsa_fixed(spark, _seven_graph(spark), n_iter=2).collect()
    assert sum(r["hub"] for r in got) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["auth"] for r in got) == pytest.approx(1.0, abs=1e-4)


# ---------------------------------------------------------------------------
# Local clustering coefficient
# ---------------------------------------------------------------------------


def test_local_clustering_known_graph(spark):
    """K3 (a,b,c) plus pendant d-a: cc(a)=2*1/(3*2)=1/3, cc(b)=cc(c)=1,
    cc(d)=0 (degree 1)."""
    from combblas_spark.algos.triangles import local_clustering

    triples = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (3, 0, 1.0)]
    got = local_clustering(spark, FX.graph(spark, triples))
    rows = {r["v"]: r["coeff"] for r in got.collect()}
    assert rows == {
        0: pytest.approx(1.0 / 3.0, abs=1e-6),
        1: 1.0,
        2: 1.0,
        3: 0.0,
    }


def test_local_clustering_triangle_free(spark):
    from combblas_spark.algos.triangles import local_clustering

    got = local_clustering(spark, FX.graph(spark, FX.chain(6)))
    assert {r["coeff"] for r in got.collect()} == {0.0}


# ---------------------------------------------------------------------------
# Adamic-Adar
# ---------------------------------------------------------------------------


def brute_adamic_adar(triples, k, max_src=None, max_deg=None):
    adj: dict[int, set[int]] = {}
    for s, d, _ in triples:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = []
    for u in sorted(adj):
        if max_src is not None and u > max_src:
            continue
        scores = {}
        for z in adj[u]:
            if max_deg is not None and len(adj[z]) > max_deg:
                continue
            for v in adj[z]:
                if v == u or v in adj[u]:
                    continue
                scores[v] = scores.get(v, 0.0) + 1.0 / math.log(len(adj[z]))
        ranked = sorted(
            ((round(s, 6), v) for v, s in scores.items()),
            key=lambda t: (-t[0], t[1]),
        )
        out.extend((u, v, s) for s, v in ranked[:k])
    return sorted(out)


def test_adamic_adar_matches_bruteforce(spark):
    from combblas_spark.algos.linkpred import adamic_adar_topk

    got = adamic_adar_topk(spark, _seven_graph(spark), k=2)
    rows = sorted((r["u"], r["v"], r["score"]) for r in got.collect())
    want = brute_adamic_adar(FX.SEVEN, k=2)
    assert len(rows) == len(want)
    for g, w in zip(rows, want):
        assert g[:2] == w[:2]
        assert g[2] == pytest.approx(w[2], abs=1e-6)


def test_adamic_adar_excludes_existing_edges(spark):
    from combblas_spark.algos.linkpred import adamic_adar_topk

    got = adamic_adar_topk(spark, _seven_graph(spark), k=10).collect()
    sym = set()
    for s, d, _ in FX.SEVEN:
        sym.add((s, d))
        sym.add((d, s))
    assert all((r["u"], r["v"]) not in sym for r in got)


def test_adamic_adar_hub_cap(spark):
    """max_neighbor_degree drops hub intermediaries: on a star graph
    every candidate pair routes through the hub, so capping below the
    hub degree yields zero candidates."""
    from combblas_spark.algos.linkpred import adamic_adar_topk

    g = FX.graph(spark, FX.star_hub(5))
    assert adamic_adar_topk(spark, g, k=3).count() > 0
    assert adamic_adar_topk(spark, g, k=3, max_neighbor_degree=4).count() == 0


# ---------------------------------------------------------------------------
# Jaccard link prediction
# ---------------------------------------------------------------------------


def brute_jaccard(triples, k, max_src=None):
    adj: dict[int, set[int]] = {}
    for s, d, _ in triples:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = []
    for u in sorted(adj):
        if max_src is not None and u > max_src:
            continue
        scores = {}
        for z in adj[u]:
            for v in adj[z]:
                if v == u or v in adj[u]:
                    continue
                scores[v] = scores.get(v, 0) + 1
        ranked = sorted(
            (
                (round(c / len(adj[u] | adj[v]), 6), v)
                for v, c in scores.items()
            ),
            key=lambda t: (-t[0], t[1]),
        )
        out.extend((u, v, s) for s, v in ranked[:k])
    return sorted(out)


def test_jaccard_matches_bruteforce(spark):
    from combblas_spark.algos.linkpred import jaccard_topk

    got = jaccard_topk(spark, _seven_graph(spark), k=2)
    rows = sorted((r["u"], r["v"], r["score"]) for r in got.collect())
    want = brute_jaccard(FX.SEVEN, k=2)
    assert len(rows) == len(want)
    for g, w in zip(rows, want):
        assert g[:2] == w[:2]
        assert g[2] == pytest.approx(w[2], abs=1e-6)


def test_jaccard_score_bounds_and_mask(spark):
    from combblas_spark.algos.linkpred import jaccard_topk

    got = jaccard_topk(spark, _seven_graph(spark), k=10).collect()
    sym = set()
    for s, d, _ in FX.SEVEN:
        sym.add((s, d))
        sym.add((d, s))
    assert got
    for r in got:
        assert 0.0 < r["score"] <= 1.0
        assert (r["u"], r["v"]) not in sym


# ---------------------------------------------------------------------------
# Reciprocity / assortativity
# ---------------------------------------------------------------------------


def test_reciprocity_assortativity(spark):
    """5 distinct edges, exactly one mutual pair (0<->1):
    reciprocity = 2/5; assortativity checked against numpy corr over
    the per-edge (outdeg(src), indeg(dst)) samples."""
    from combblas_spark.operators.reduce import reciprocity_assortativity

    triples = [(0, 1, 1.0), (1, 0, 1.0), (0, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0)]
    de = FX.edges_df(spark, triples).select("src", "dst")
    row = reciprocity_assortativity(de).collect()[0]
    assert row["reciprocity"] == pytest.approx(0.4, abs=1e-6)
    od = {0: 2, 1: 2, 2: 1}
    idg = {1: 1, 0: 1, 2: 1, 3: 2}
    xs = [od[s] for s, d, _ in triples]
    ys = [idg[d] for s, d, _ in triples]
    want = np.corrcoef(xs, ys)[0, 1]
    assert row["assortativity"] == pytest.approx(want, abs=1e-6)


def test_assortativity_zero_variance_is_null(spark):
    """Degenerate input (every indegree 1) has no defined correlation:
    the guard returns NULL instead of ANSI-mode DIVIDE_BY_ZERO."""
    from combblas_spark.operators.reduce import reciprocity_assortativity

    triples = [(0, 1, 1.0), (1, 0, 1.0), (0, 2, 1.0), (2, 3, 1.0)]
    row = reciprocity_assortativity(
        FX.edges_df(spark, triples).select("src", "dst")
    ).collect()[0]
    assert row["reciprocity"] == pytest.approx(0.5, abs=1e-6)
    assert row["assortativity"] is None


def test_reciprocity_bounds(spark):
    from combblas_spark.operators.reduce import reciprocity_assortativity

    sym = [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0)]
    row = reciprocity_assortativity(
        FX.edges_df(spark, sym).select("src", "dst")
    ).collect()[0]
    assert row["reciprocity"] == 1.0
    oneway = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    row = reciprocity_assortativity(
        FX.edges_df(spark, oneway).select("src", "dst")
    ).collect()[0]
    assert row["reciprocity"] == 0.0
