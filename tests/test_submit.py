"""Automated spark-submit --py-files smoke (north rule: the job ships
to a cluster as a zip; this runs the REAL spark-submit binary end to
end — packaging, checkpointed iteration, parquet output — previously
only manually smoked)."""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_pyfiles_zip.py")],
        check=True,
        cwd=REPO,
    )
    out_dir = str(tmp_path / "ranks")
    ck_dir = str(tmp_path / "ck")
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", os.path.join(REPO, "dist", "combblas_spark.zip"),
            os.path.join(REPO, "scripts", "submit_pagerank.py"),
            "--edges", "rmat:10",
            "--output", out_dir,
            "--checkpoint-dir", ck_dir,
            "--tol", "1e-6",
            "--max-iter", "60",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    tbl = pq.read_table(out_dir)
    assert tbl.num_rows > 0
    ranks = tbl.column("rank").to_pylist()
    assert abs(sum(ranks) - 1.0) < 1e-6
    assert min(ranks) > 0
    # the checkpointer persisted per-iteration snapshots
    assert os.path.exists(ck_dir) and os.listdir(ck_dir)
