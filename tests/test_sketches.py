"""Tests for the frequency-sketch family (algos/sketches.py):
Count-Min heavy hitters and Efraimidis-Spirakis weighted sampling."""

from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F


def _keys_df(spark, counts):
    rows = [Row(key=k) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows)


def test_cms_overestimates_never_under(spark):
    """CMS error is one-sided: est >= true for every key."""
    from combblas_spark.algos.sketches import cms_heavy_hitters

    counts = {k: (k % 7) + 1 for k in range(200)}
    counts[42] = 500  # one heavy key
    got = {
        r["key"]: r["est"]
        for r in cms_heavy_hitters(
            spark, _keys_df(spark, counts), width=32, k=200
        ).collect()
    }
    assert got[42] >= 500
    for k, est in got.items():
        assert est >= counts[k], (k, est, counts[k])


def test_cms_finds_the_hub(spark):
    """The heavy key tops the estimate ranking despite collisions."""
    from combblas_spark.algos.sketches import cms_heavy_hitters

    counts = {k: 2 for k in range(300)}
    counts[7] = 1000
    top = cms_heavy_hitters(spark, _keys_df(spark, counts), width=64, k=1)
    assert [r["key"] for r in top.collect()] == [7]


def test_cms_deterministic(spark):
    from combblas_spark.algos.sketches import cms_heavy_hitters

    counts = {k: (k * 13) % 11 + 1 for k in range(100)}
    df = _keys_df(spark, counts)
    a = sorted(map(tuple, cms_heavy_hitters(spark, df, k=5).collect()))
    b = sorted(map(tuple, cms_heavy_hitters(spark, df, k=5).collect()))
    assert a == b


def test_weighted_sample_basics(spark):
    """k rows, all from the input, deterministic, and a weight 10^6
    outlier is always drawn."""
    from combblas_spark.algos.sketches import weighted_sample

    items = spark.createDataFrame(
        [Row(key=k, w=1.0) for k in range(100)]
        + [Row(key=999, w=1_000_000.0)]
    )
    got = weighted_sample(spark, items, k=5).collect()
    assert len(got) == 5
    keys = {r["key"] for r in got}
    assert keys <= set(range(100)) | {999}
    assert 999 in keys
    again = {r["key"] for r in weighted_sample(spark, items, k=5).collect()}
    assert keys == again


def test_weighted_sample_inclusion_tracks_weight(spark):
    """Across disjoint key blocks with weights 1 vs 20, the
    heavy block dominates the sample (deterministic draws, so this is
    a property of the pinned chain — asserted loosely)."""
    from combblas_spark.algos.sketches import weighted_sample

    items = spark.createDataFrame(
        [Row(key=k, w=1.0) for k in range(200)]
        + [Row(key=1000 + k, w=20.0) for k in range(200)]
    )
    got = {r["key"] for r in weighted_sample(spark, items, k=40).collect()}
    heavy = sum(1 for k in got if k >= 1000)
    assert heavy >= 30  # expected ~38 of 40
