"""Resumability tests (north rule): iteration snapshots with lineage +
metrics, and kill/resume equivalence for PageRank.

Mirrors the reference's batch-incremental restartability
(Applications/Incremental/) re-expressed as snapshot-per-iteration
(plans/checkpoint.py): a run killed mid-convergence resumes from the
latest complete snapshot and produces ranks identical to an
uninterrupted run.
"""

from __future__ import annotations

import numpy as np
import pytest

from combblas_spark.algos.pagerank import pagerank
from combblas_spark.plans.checkpoint import Checkpointer
from combblas_spark.sources import fixtures as FX


@pytest.fixture()
def g(spark):
    return FX.graph(spark, FX.SEVEN, n_partitions=4)


def _ranks_dict(df):
    return {r["v"]: r["rank"] for r in df.collect()}


def test_snapshot_lineage_and_metrics(spark, g, tmp_path):
    ck = Checkpointer(str(tmp_path), run_id="lineage")
    res = pagerank(spark, g, tol=-1.0, max_iter=3, checkpointer=ck)
    assert res.iterations == 3
    assert ck.latest_iteration() == 2
    lin = ck.lineage(2)
    assert lin["iteration"] == 2
    assert lin["rows"] == 7
    assert lin["metrics"]["n"] == 7
    assert sum(p["rows"] for p in lin["partitions"]) == 7


def test_kill_and_resume_identical(spark, g, tmp_path):
    # uninterrupted 6-iteration run (no checkpointer)
    full = _ranks_dict(pagerank(spark, g, tol=-1.0, max_iter=6).ranks)

    # run 3 iterations durably, "die", then resume to 6 total
    ck = Checkpointer(str(tmp_path), run_id="resume")
    pagerank(spark, g, tol=-1.0, max_iter=3, checkpointer=ck)
    assert ck.latest_iteration() == 2
    res2 = pagerank(spark, g, tol=-1.0, max_iter=6, checkpointer=ck)
    assert res2.iterations == 6
    resumed = _ranks_dict(res2.ranks)

    assert set(resumed) == set(full)
    for v in full:
        assert resumed[v] == pytest.approx(full[v], abs=1e-12), v


def test_resume_converged_matches_dense_reference(spark, g, tmp_path):
    ck = Checkpointer(str(tmp_path), run_id="conv")
    pagerank(spark, g, tol=-1.0, max_iter=2, checkpointer=ck)
    res = pagerank(spark, g, tol=1e-6, max_iter=100, checkpointer=ck)
    assert res.delta <= 1e-6

    # dense reference (same semantics as tests/test_pagerank.py)
    n = 7
    A = np.zeros((n, n))
    for s, d, _ in FX.SEVEN:
        A[s, d] += 1.0
    outdeg = A.sum(axis=1)
    pr = np.full(n, 1.0 / n)
    for _ in range(200):
        contrib = np.where(outdeg > 0, pr / np.maximum(outdeg, 1), 0.0)
        dangling = pr[outdeg == 0].sum()
        new = 0.15 / n + 0.85 * (A.T @ contrib + dangling / n)
        if np.abs(new - pr).max() < 1e-6:
            pr = new
            break
        pr = new
    got = _ranks_dict(res.ranks)
    for v in range(n):
        assert got[v] == pytest.approx(pr[v], abs=1e-5), v
