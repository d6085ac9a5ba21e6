"""Golden tests for Borůvka MST (algos/mst.py): exact edge-set
equality with Kruskal on distinct-weight fixtures (where the MST is
unique), spanning-forest invariants on ties and disconnected inputs,
and convergence-stats bounds backing the oracle unroll depth."""

from collections import defaultdict

from combblas_spark.sources import fixtures as FX


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.p[ra] = rb
        return True


def _canon(triples):
    best = {}
    for s, d, w in triples:
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        best[k] = min(best.get(k, w), w)
    return [(u, v, w) for (u, v), w in best.items()]


def kruskal(triples):
    uf = UF()
    out = set()
    for u, v, w in sorted(_canon(triples), key=lambda e: (e[2], e[0], e[1])):
        if uf.union(u, v):
            out.add((u, v, w))
    return out


def _collect(df):
    return {(r["u"], r["v"], r["w"]) for r in df.collect()}


def _assert_spanning_forest(triples, got):
    """Acyclic + same connectivity as the input graph."""
    uf = UF()
    for u, v, _w in got:
        assert uf.union(u, v), f"cycle via ({u}, {v})"
    full = UF()
    verts = set()
    for u, v, _w in _canon(triples):
        full.union(u, v)
        verts.update((u, v))
    n_comp = len({full.find(x) for x in verts})
    assert len(got) == len(verts) - n_comp


def test_mst_matches_kruskal_on_seven(spark):
    """SEVEN's 12 weights are pairwise distinct → the MST is unique,
    so any correct algorithm must produce exactly Kruskal's edges."""
    from combblas_spark.algos.mst import boruvka_mst

    g = FX.graph(spark, FX.SEVEN)
    got = _collect(boruvka_mst(spark, g))
    assert got == kruskal(FX.SEVEN)
    _assert_spanning_forest(FX.SEVEN, got)


def test_mst_distinct_weights_grid(spark):
    """4x3 grid with injective weights vs Kruskal."""
    from combblas_spark.algos.mst import boruvka_mst

    tri = []
    for r in range(3):
        for c in range(4):
            v = r * 4 + c
            if c < 3:
                tri.append((v, v + 1, float((v * 7 + 3) % 29) + 0.5))
            if r < 2:
                tri.append((v, v + 4, float((v * 11 + 5) % 31) + 0.25))
    g = FX.graph(spark, tri)
    got = _collect(boruvka_mst(spark, g))
    assert got == kruskal(tri)


def test_mst_disconnected_forest_and_ties(spark):
    """Two components, all weights equal: the output is a spanning
    forest (sizes 3+2 edges) and deterministic across runs — the
    (w, u, v) total order stands in for distinct weights."""
    from combblas_spark.algos.mst import boruvka_mst

    tri = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0),
           (10, 11, 1.0), (11, 12, 1.0), (12, 10, 1.0)]
    g = FX.graph(spark, tri)
    a = _collect(boruvka_mst(spark, g))
    _assert_spanning_forest(tri, a)
    b = _collect(boruvka_mst(spark, g))
    assert a == b


def test_mst_parallel_edges_keep_min(spark):
    from combblas_spark.algos.mst import boruvka_mst

    tri = [(0, 1, 5.0), (1, 0, 2.0), (1, 2, 1.0)]
    g = FX.graph(spark, tri)
    got = _collect(boruvka_mst(spark, g))
    assert got == {(0, 1, 2.0), (1, 2, 1.0)}


def test_mst_stats_bound_oracle_unroll(spark):
    """Round/jump counts must stay under the oracle's unroll constants
    (MST_ROUNDS=4, MST_JUMPS=6) on the fixture."""
    from combblas_spark.algos.mst import boruvka_mst

    st = {}
    boruvka_mst(spark, FX.graph(spark, FX.SEVEN), stats=st).count()
    assert st["rounds"] <= 4
    assert all(j <= 6 for j in st["jumps"])
