"""CC golden tests: exact match vs a pure-Python union-find,
labels normalized to min-member id (SURVEY.md §7c), plus
cross-path consistency FastSV vs Awerbuch-Shiloach (SURVEY.md §5)."""

import pytest

from combblas_spark.algos.components import (
    component_sizes,
    connected_components,
    connected_components_as,
)
from combblas_spark.sources import fixtures as FX


def union_find_cc(triples, extra_vertices=()):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d, _ in triples:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        union(s, d)
    for v in extra_vertices:
        parent.setdefault(v, v)
    # normalize: component label = min member id
    comp_min = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in parent}


def labels_dict(df):
    return {r["v"]: r["comp"] for r in df.collect()}


CASES = [
    ("seven", FX.SEVEN),
    ("nine", FX.NINE),
    ("two_cliques", FX.TWO_CLIQUES),
    ("chain_255", FX.chain(255)),
    ("star_200", FX.star_hub(200)),
]


@pytest.mark.parametrize("name,triples", CASES)
def test_fastsv_matches_union_find(spark, name, triples):
    g = FX.graph(spark, triples)
    got = labels_dict(connected_components(spark, g))
    want = union_find_cc(triples)
    assert got == want, f"{name}"


@pytest.mark.parametrize("name,triples", [("seven", FX.SEVEN), ("nine", FX.NINE), ("chain_100", FX.chain(100))])
def test_as_variant_agrees_with_fastsv(spark, name, triples):
    g = FX.graph(spark, triples)
    a = labels_dict(connected_components(spark, g))
    b = labels_dict(connected_components_as(spark, g))
    assert a == b, f"{name}"


def test_nine_component_count(spark):
    # small_nonsym: vertices 0..8; edges link {0..8}\{6,7,8}... compute expected
    g = FX.graph(spark, FX.NINE)
    labels = labels_dict(connected_components(spark, g))
    want = union_find_cc(FX.NINE)
    assert labels == want
    assert len(set(labels.values())) == len(set(want.values()))


def test_component_sizes_histogram(spark):
    g = FX.graph(spark, FX.TWO_CLIQUES)
    labels = connected_components(spark, g)
    hist = {r["size"]: r["n_components"] for r in component_sizes(labels).collect()}
    # two K5s and one isolate (self-loop vertex 10)
    assert hist == {1: 1, 5: 2}


def test_chain_converges_in_log_supersteps(spark):
    """chain_1k fixture: pointer jumping must converge in O(log n)."""
    g = FX.graph(spark, FX.chain(1000))
    labels = labels_dict(connected_components(spark, g, max_iter=25))
    assert set(labels.values()) == {0}
    assert len(labels) == 1000


def test_kcore_cascading_peel(spark):
    """K4 clique + a tail chain: with k=3 the chain peels away over
    multiple cascading rounds (each removal exposes the next), and the
    clique survives with within-core degree 3; k above the max degree
    yields an empty core."""
    from combblas_spark.algos.kcore import kcore

    clique = [(a, b, 1.0) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    tail = [(13, 20, 1.0), (20, 21, 1.0), (21, 22, 1.0)]
    g = FX.graph(spark, clique + tail)
    got = {r["v"]: r["deg"] for r in kcore(spark, g, k=3).collect()}
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}
    assert kcore(spark, g, k=5).count() == 0
    with pytest.raises(ValueError):
        kcore(spark, g, k=0)
