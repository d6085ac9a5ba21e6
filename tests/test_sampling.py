"""Tests for deterministic GraphSAGE-style neighbor sampling
(algos/sampling.py) — step-exact vs a pure-Python replay of the
multiplicative pairwise hash, plus structural invariants."""

from combblas_spark.algos.sampling import A, B, C, P
from combblas_spark.sources import fixtures as FX


def python_sampled_adj(triples, fanout, hop_seed):
    edges = sorted({(s, d) for s, d, _ in triples})
    by_src: dict[int, list[int]] = {}
    for s, d in edges:
        by_src.setdefault(s, []).append(d)
    out = {}
    for s, ds in by_src.items():
        pr = sorted(
            ds, key=lambda d: ((((A * s + B * hop_seed) % P) * ((C * d) % P)) % P, d)
        )
        out[s] = pr[:fanout]
    return out


def python_blocks(triples, fanouts, max_root, seed):
    roots = sorted(
        {s for s, _, _ in triples if max_root is None or s <= max_root}
    )
    blocks = set()
    frontier = {r: {r} for r in roots}
    for k, f in enumerate(fanouts, start=1):
        adj = python_sampled_adj(triples, f, seed + k)
        nxt: dict[int, set[int]] = {r: set() for r in roots}
        for r in roots:
            for u in frontier[r]:
                for d in adj.get(u, []):
                    blocks.add((r, k, u, d))
                    nxt[r].add(d)
        frontier = nxt
    return blocks


def test_neighbor_sample_matches_python_replay(spark):
    from combblas_spark.algos.sampling import neighbor_sample

    got = {
        (r["root"], r["hop"], r["src"], r["dst"])
        for r in neighbor_sample(
            spark, FX.graph(spark, FX.SEVEN), fanouts=(2, 2), max_root=3, seed=1
        ).collect()
    }
    want = python_blocks(FX.SEVEN, (2, 2), 3, 1)
    assert got == want


def test_sampled_adjacency_fanout_and_subset(spark):
    from combblas_spark.algos.sampling import sampled_adjacency

    g = FX.graph(spark, FX.SEVEN)
    adj = sampled_adjacency(g, fanout=2, hop_seed=7).collect()
    true_edges = {(s, d) for s, d, _ in FX.SEVEN}
    per_src: dict[int, int] = {}
    for r in adj:
        assert (r["src"], r["dst"]) in true_edges
        per_src[r["src"]] = per_src.get(r["src"], 0) + 1
    assert per_src and max(per_src.values()) <= 2


def test_neighbor_sample_deterministic_and_chained(spark):
    """Two runs agree; every hop-2 src is some hop-1 dst of the same
    root (message-flow blocks chain)."""
    from combblas_spark.algos.sampling import neighbor_sample

    g = FX.graph(spark, FX.SEVEN)
    a = sorted(
        map(tuple, neighbor_sample(spark, g, fanouts=(3, 2), seed=5).collect())
    )
    b = sorted(
        map(tuple, neighbor_sample(spark, g, fanouts=(3, 2), seed=5).collect())
    )
    assert a == b
    h1 = {(r, s) for r, h, s, d in a if h == 1}
    h1_dst = {(r, d) for r, h, s, d in a if h == 1}
    for r, h, s, d in a:
        if h == 2:
            assert (r, s) in h1_dst
        if h == 1:
            assert (r, s) in h1 and r == s
