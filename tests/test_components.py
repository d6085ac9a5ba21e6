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
