"""Golden tests for the deterministic walk corpus (algos/walks.py):
step-exact comparison against a pure-Python replay of the same
Carter–Wegman choice rule, plus validity (every hop is an edge),
truncation at dead ends, and seed sensitivity."""

from collections import defaultdict

from combblas_spark.sources import fixtures as FX

_P = 2_147_483_647
_B = 12_345
_C = 1_013_904_223


_A = 1_103_515_245


def py_walks(triples, walk_len, seed, symmetrize=True):
    adj = defaultdict(set)
    for s, d, *_ in triples:
        if s == d:
            continue
        adj[s].add(d)
        if symmetrize:
            adj[d].add(s)
    rows = set()
    for start in sorted(adj):
        at = start
        rows.add((start, 0, start))
        m1 = (_A * start + seed) % _P
        for t in range(1, walk_len + 1):
            if not adj[at]:
                break
            at = min(
                adj[at], key=lambda d: ((m1 * ((_C * d + _B * t) % _P)) % _P, d)
            )
            rows.add((start, t, at))
    return rows


def _collect(df):
    return {(r["walk"], r["step"], r["v"]) for r in df.collect()}


def test_walks_match_python_replay(spark):
    from combblas_spark.algos.walks import random_walks

    g = FX.graph(spark, FX.SEVEN)
    got = _collect(random_walks(spark, g, walk_len=5, seed=3))
    assert got == py_walks(FX.SEVEN, 5, 3)


def test_walks_hops_are_edges(spark):
    from combblas_spark.algos.walks import random_walks

    g = FX.graph(spark, FX.SEVEN)
    rows = random_walks(spark, g, walk_len=4, seed=1).collect()
    sym = set()
    for s, d, _w in FX.SEVEN:
        sym.add((s, d))
        sym.add((d, s))
    pos = {(r["walk"], r["step"]): r["v"] for r in rows}
    for (w, t), v in pos.items():
        if t > 0:
            assert (pos[(w, t - 1)], v) in sym, f"walk {w} step {t}"


def test_walks_truncate_at_dead_ends(spark):
    """Directed path 0→1→2: unsymmetrized walks stop at vertex 2."""
    from combblas_spark.algos.walks import random_walks

    g = FX.graph(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    got = _collect(random_walks(spark, g, walk_len=5, seed=1, symmetrize=False))
    assert got == {(0, 0, 0), (0, 1, 1), (0, 2, 2), (1, 0, 1), (1, 1, 2)}


def test_walks_seed_changes_corpus(spark):
    from combblas_spark.algos.walks import random_walks

    g = FX.graph(spark, FX.SEVEN)
    a = _collect(random_walks(spark, g, walk_len=5, seed=1))
    b = _collect(random_walks(spark, g, walk_len=5, seed=2))
    assert a != b
    assert a == py_walks(FX.SEVEN, 5, 1)
    assert b == py_walks(FX.SEVEN, 5, 2)
