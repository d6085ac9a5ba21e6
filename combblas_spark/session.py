"""SparkSession factory for the CombBLAS-on-Spark engine.

Local-mode defaults are tuned for the sandbox (single JVM, local[N]);
on a real cluster every knob here is overridable through ``extra_conf``
or ``spark-submit --conf``.  The partitioning philosophy mirrors the
reference's 2D process grid (CommGrid, include/CombBLAS/CommGrid.h:44-166):
we hash-partition edge and vertex tables on vertex id into ``n_blocks``
shuffle partitions and keep that number stable across iterations so
iterative joins reuse the same exchange layout.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "combblas-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` resolves from (in order): explicit arg, $SPARK_GRAFT_MASTER,
    local[$SPARK_GRAFT_CPUS], local[*].
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # AQE broadcast threshold doubles as our sparse-vs-dense SpMV switch
        # (reference: CC.h:1256 `nNonStars*50 < nv` → dense path).
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
