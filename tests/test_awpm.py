"""AWPM / TwoThirdApprox tests (ApproxWeightPerfectMatching.h).

Strategy mirrors the reference's matching checkers (Utility.h
isMatching/isMaximalmatching) plus golden optima: brute-force
maximum-weight perfect matchings on small fixtures (no scipy in the
container) gate the 2/3-approximation bound and exact convergence on
single-swap cases.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from combblas_spark.algos.awpm import (
    awpm,
    transform_weight,
    two_third_approx,
    weighted_greedy_matching,
)
from combblas_spark.sources import fixtures as FX


def _brute_opt(triples, n):
    """Max-weight perfect matching weight over rows/cols 0..n-1."""
    w = {}
    for s, d, x in triples:
        w[(s, d)] = x
    best = None
    for perm in itertools.permutations(range(n)):
        if all((i, perm[i]) in w for i in range(n)):
            tot = sum(w[(i, perm[i])] for i in range(n))
            best = tot if best is None else max(best, tot)
    return best


def _mate_weight(mate_rows, triples):
    w = {(s, d): x for s, d, x in triples}
    return sum(w[(r["src"], r["dst"])] for r in mate_rows)


def _assert_valid_matching(rows):
    srcs = [r["src"] for r in rows]
    dsts = [r["dst"] for r in rows]
    assert len(set(srcs)) == len(srcs)
    assert len(set(dsts)) == len(dsts)


def test_two_third_single_swap_reaches_optimum(spark):
    # identity matching is suboptimal; one 4-cycle (rows 0,1 / cols 0,1)
    # swap reaches the optimum
    triples = [
        (0, 0, 1.0), (0, 1, 10.0), (0, 2, 1.0),
        (1, 0, 10.0), (1, 1, 1.0), (1, 2, 1.0),
        (2, 0, 1.0), (2, 1, 1.0), (2, 2, 5.0),
    ]
    g = FX.graph(spark, triples, n_partitions=2)
    mate0 = spark.createDataFrame([(0, 0), (1, 1), (2, 2)], "src long, dst long")
    out = two_third_approx(spark, g, mate0).collect()
    _assert_valid_matching(out)
    assert len(out) == 3
    assert _mate_weight(out, triples) == _brute_opt(triples, 3) == 25.0


def test_two_third_bound_random(spark):
    import numpy as np

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = 6
        triples = [
            (i, j, float(1 + rng.integers(1, 50)))
            for i in range(n)
            for j in range(n)
            if rng.random() < 0.7 or i == j  # keep a perfect matching easy
        ]
        opt = _brute_opt(triples, n)
        g = FX.graph(spark, triples, n_partitions=2)
        mate0 = spark.createDataFrame(
            [(i, i) for i in range(n)], "src long, dst long"
        )
        out = two_third_approx(spark, g, mate0).collect()
        _assert_valid_matching(out)
        assert len(out) == n  # perfect matching preserved
        got = _mate_weight(out, triples)
        assert got >= (2.0 / 3.0) * opt - 1e-9, (seed, got, opt)


def test_two_third_weight_never_decreases(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n = 5
    triples = [(i, j, float(rng.integers(1, 20))) for i in range(n) for j in range(n)]
    g = FX.graph(spark, triples, n_partitions=2)
    mate0 = spark.createDataFrame([(i, i) for i in range(n)], "src long, dst long")
    prev = _mate_weight(
        [{"src": i, "dst": i} for i in range(n)], triples
    )
    for k in (1, 2, 3):
        out = two_third_approx(spark, g, mate0, fixed_iters=k).collect()
        cur = _mate_weight(out, triples)
        assert cur >= prev - 1e-9
        prev = cur


def test_weighted_greedy_is_maximal_and_valid(spark):
    triples = [
        (0, 0, 10.0), (0, 1, 9.0), (1, 0, 9.0),
        (2, 2, 3.0), (3, 2, 4.0), (3, 3, 1.0),
    ]
    g = FX.graph(spark, triples, n_partitions=2)
    out = weighted_greedy_matching(spark, g).collect()
    _assert_valid_matching(out)
    ms = {r["src"] for r in out}
    md = {r["dst"] for r in out}
    for s, d, _ in triples:  # maximality
        assert s in ms or d in md, (s, d)
    # row 0 takes its max-weight col (10 beats 9)
    assert {(r["src"], r["dst"]) for r in out} >= {(0, 0)}


def test_transform_weight_scales_to_unit(spark):
    triples = [(0, 0, -8.0), (0, 1, 2.0), (1, 1, 4.0)]
    g = FX.graph(spark, triples, n_partitions=2)
    t = transform_weight(g, apply_log=False)
    rows = {(r["src"], r["dst"]): r["w"] for r in t.edges.collect()}
    # |w| -> row max 1: row0 = (1, .25), row1 = (1,)
    # col max over scaled: col0 max 1, col1 max 1 -> (1, .25), (1)
    assert rows[(0, 0)] == pytest.approx(1.0)
    assert rows[(1, 1)] == pytest.approx(1.0)
    assert rows[(0, 1)] == pytest.approx(0.25)
    tl = transform_weight(g, apply_log=True)
    logs = {(r["src"], r["dst"]): r["w"] for r in tl.edges.collect()}
    assert logs[(0, 0)] == pytest.approx(0.0)
    assert logs[(0, 1)] < 0


def test_awpm_end_to_end_completes_and_improves(spark):
    # greedy alone strands row 1 (both rows prefer col 0); AWPM must
    # complete cardinality then improve weight
    triples = [
        (0, 0, 10.0), (0, 1, 9.0), (1, 0, 9.0), (1, 1, 1.0),
        (2, 2, 5.0),
    ]
    g = FX.graph(spark, triples, n_partitions=2)
    out = awpm(spark, g).collect()
    _assert_valid_matching(out)
    assert len(out) == 3  # perfect
    got = _mate_weight(out, triples)
    # optimum is (0,1)+(1,0)+(2,2) = 9+9+5 = 23 in raw weight; the
    # product objective (optimizeProd) picks the same support here
    assert got == 23.0


# ---------------------------------------------------------------------------
# auction algorithm (auction.cpp — full Bertsekas loop of the sketch)
# ---------------------------------------------------------------------------

def test_auction_reaches_brute_force_optimum(spark):
    import numpy as np

    from combblas_spark.algos.auction import auction_matching

    for seed, n, density in ((11, 5, 1.0), (12, 6, 0.7), (13, 6, 0.5)):
        rng = np.random.default_rng(seed)
        triples = [
            (i, j, float(rng.integers(1, 30)))
            for i in range(n)
            for j in range(n)
            if rng.random() < density or i == j
        ]
        opt = _brute_opt(triples, n)
        g = FX.graph(spark, triples, n_partitions=2)
        out = auction_matching(spark, g).collect()
        _assert_valid_matching(out)
        assert len(out) == n
        got = _mate_weight(out, triples)
        # eps < 1/n + integer weights => exactly optimal
        assert got == pytest.approx(opt, abs=1e-6), (seed, got, opt)


def test_auction_revokes_and_rebids(spark):
    from combblas_spark.algos.auction import auction_matching

    # both rows want col 0; row 1's alternative is terrible, so row 1
    # must outbid and revoke row 0, which re-bids onto col 1
    triples = [(0, 0, 10.0), (0, 1, 9.0), (1, 0, 10.0), (1, 1, 1.0)]
    g = FX.graph(spark, triples, n_partitions=2)
    out = {(r["src"], r["dst"]) for r in auction_matching(spark, g).collect()}
    assert out == {(0, 1), (1, 0)}  # weight 19, the optimum


def test_auction_raises_on_infeasible_side(spark):
    from combblas_spark.algos.auction import auction_matching

    # 3 bidders, 1 object: never terminates — must raise, not spin
    triples = [(0, 0, 1.0), (1, 0, 2.0), (2, 0, 3.0)]
    g = FX.graph(spark, triples, n_partitions=2)
    with pytest.raises(RuntimeError):
        auction_matching(spark, g, max_rounds=12)
