#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The north metric (BASELINE.json) is **edges/sec per SpMV iteration**
for PageRank run to 1e-6 convergence; it is reported alongside the
per-query wall times as ``edges_per_sec_per_iter``.

Scaling evidence (north rule: >=0.8 efficiency from N to 4N executors)
is produced by ``scripts/bench_scaling.py``, which invokes this file at
two parallelism levels (``--cpus 8`` / ``--cpus 32``) on the same input
and computes throughput efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def build_spark(cpus: int, shuffle: int):
    from combblas_spark.session import get_spark

    return get_spark(
        app_name=f"combblas-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )


def bench_pagerank(spark, sf_dir: str, n_partitions: int):
    """The flagship kernel: PageRank to 1e-6 on the derived link graph.

    Returns (wall_s, iterations, edges, edges_per_sec_per_iter).
    """
    from combblas_spark.algos.pagerank import pagerank
    from combblas_spark.sources.tables import link_graph

    g = link_graph(spark, sf_dir, n_partitions=n_partitions)
    t0 = time.time()
    res = pagerank(spark, g, tol=1e-6, max_iter=60)
    res.ranks.count()  # materialize
    wall = time.time() - t0
    m = res.edges_processed // max(res.iterations, 1)
    eps = res.edges_processed / wall
    return wall, res.iterations, m, eps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--shuffle", type=int, default=0, help="shuffle partitions (0 = 2*cpus)")
    ap.add_argument("--kernel-only", action="store_true", help="only the PageRank north-metric kernel")
    ap.add_argument("--skip", default="", help="comma-separated query names to skip")
    args = ap.parse_args()
    shuffle = args.shuffle or max(2 * args.cpus, 8)

    spark = build_spark(args.cpus, shuffle)
    sf = args.sf_dir.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}

    # --- north-metric kernel -------------------------------------------
    pr_wall, pr_iters, n_edges, eps = bench_pagerank(spark, args.sf_dir, shuffle)
    timings["pagerank_converged"] = round(pr_wall, 3)

    extras = {
        "pagerank_iterations": pr_iters,
        "graph_edges": n_edges,
        "edges_per_sec_per_iter": round(eps, 1),
        "cpus": args.cpus,
        "shuffle_partitions": shuffle,
    }

    # --- remaining headline queries ------------------------------------
    if not args.kernel_only:
        import __spark_entry__ as entrymod

        skip = {s for s in args.skip.split(",") if s}
        skip.add("pagerank5")  # covered by the converged kernel above
        for name, fn in entrymod.queries().items():
            if name in skip:
                continue
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.count()
            timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total headline-query wall time (north metric in edges_per_sec_per_iter)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
