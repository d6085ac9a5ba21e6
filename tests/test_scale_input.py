"""Invariants of the deterministic K× scale-up (scripts/make_scale_input.py):
key-disjoint copies, replicated (not exploding) near-dup structure,
orthogonally-transformed embeddings."""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def msi():
    spec = importlib.util.spec_from_file_location(
        "make_scale_input", os.path.join(REPO, "scripts", "make_scale_input.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _base(spark, table):
    return spark.read.parquet(f"/root/testdata/sf0.001/{table}.parquet")


def test_keys_disjoint_and_counts_scale(spark, msi):
    k = 3
    for table in ("orders", "lineitem", "documents", "embeddings"):
        base = _base(spark, table)
        scaled = msi.scaled_copy(base, table, 0)
        for i in range(1, k):
            scaled = scaled.unionByName(msi.scaled_copy(base, table, i))
        key = next(iter(msi.OFFSETS[table]))
        assert scaled.count() == k * base.count()
        # every copy's key range is disjoint
        assert scaled.select(key).distinct().count() == k * base.select(
            key
        ).distinct().count()


def test_referential_integrity_within_copy(spark, msi):
    orders = msi.scaled_copy(_base(spark, "orders"), "orders", 2)
    lineitem = msi.scaled_copy(_base(spark, "lineitem"), "lineitem", 2)
    dangling = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
    ).count()
    assert dangling == 0


def test_documents_cross_copy_jaccard_zero(spark, msi):
    base = _base(spark, "documents").limit(5)
    c0 = msi.scaled_copy(base, "documents", 0).collect()
    c1 = msi.scaled_copy(base, "documents", 1).collect()

    def grams(t, n=3):
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    for r0, r1 in zip(sorted(c0, key=lambda r: r["doc_id"]),
                      sorted(c1, key=lambda r: r["doc_id"])):
        g0, g1 = grams(r0["text"]), grams(r1["text"])
        assert g0 and g1 and not (g0 & g1)   # zero cross-copy overlap
        assert len(g0) == len(g1)            # identical per-doc work


def test_embeddings_orthogonal_transform(spark, msi):
    base = _base(spark, "embeddings").limit(10)
    v0 = {r["vec_id"]: np.array(r["embedding"]) for r in
          msi.scaled_copy(base, "embeddings", 0).collect()}
    v1 = {r["vec_id"] - msi.OFFSETS["embeddings"]["vec_id"]: np.array(r["embedding"])
          for r in msi.scaled_copy(base, "embeddings", 1).collect()}
    ids = sorted(v0)
    # norms preserved exactly; within-copy pairwise dot products preserved
    for i in ids:
        assert np.linalg.norm(v1[i]) == pytest.approx(np.linalg.norm(v0[i]), rel=1e-6)
    a, b = ids[0], ids[1]
    assert float(v1[a] @ v1[b]) == pytest.approx(float(v0[a] @ v0[b]), rel=1e-5, abs=1e-5)
    # the transform actually changed the vectors (some sign flipped)
    assert any(not np.allclose(v0[i], v1[i]) for i in ids)
