#!/usr/bin/env python
"""spark-submit entry point for the flagship PageRank job.

Cluster usage (north rule: ship via --py-files to N / 4N executors)::

    python scripts/make_pyfiles_zip.py                      # -> dist/combblas_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/combblas_spark.zip \
        --conf spark.sql.shuffle.partitions=<4x total cores> \
        scripts/submit_pagerank.py \
        --edges <parquet dir or 'rmat:20'> \
        --output /path/ranks --checkpoint-dir /path/ck --tol 1e-6

Local smoke::

    python scripts/submit_pagerank.py --edges rmat:16 --output /tmp/ranks
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True,
                    help="parquet dir with (src,dst[,w]) or 'rmat:<scale>'")
    ap.add_argument("--output", required=True, help="output dir for (v, rank) parquet")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="durable per-iteration snapshots (resumable run)")
    ap.add_argument("--run-id", default="pagerank")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--norm", choices=("max", "l1"), default="max",
                    help="convergence norm; use l1 at corpus scale — "
                    "max-norm deltas shrink like 1/n (algos/pagerank.py)")
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--partitions", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from combblas_spark.algos.pagerank import pagerank
    from combblas_spark.graph import Graph
    from combblas_spark.plans.checkpoint import Checkpointer

    spark = SparkSession.builder.appName("combblas-pagerank").getOrCreate()
    nparts = args.partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )

    if args.edges.startswith("rmat:"):
        from combblas_spark.sources.generators import rmat_graph

        g = rmat_graph(spark, scale=int(args.edges.split(":")[1]), n_partitions=nparts)
    else:
        df = spark.read.parquet(args.edges)
        w = "w" if "w" in df.columns else None
        g = Graph.from_edge_list(df, w=w, n_partitions=nparts)

    ck = (
        Checkpointer(args.checkpoint_dir, run_id=args.run_id)
        if args.checkpoint_dir
        else None
    )
    res = pagerank(
        spark, g, alpha=args.alpha, tol=args.tol, max_iter=args.max_iter,
        checkpointer=ck, norm=args.norm,
    )
    res.ranks.write.mode("overwrite").parquet(args.output)
    print(
        json.dumps(
            {
                "iterations": res.iterations,
                "delta": res.delta,
                "edges_processed": res.edges_processed,
                "loop_seconds": round(res.loop_seconds, 3),
                "edges_per_sec_per_iter": round(
                    res.edges_processed / res.loop_seconds, 1
                )
                if res.loop_seconds
                else None,
                "output": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
