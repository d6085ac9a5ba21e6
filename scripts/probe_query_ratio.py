#!/usr/bin/env python
"""Standalone warm-ratio probe for individual driver queries.

The in-sweep scale-curve timings charge whatever JVM/codegen/scan
warm-up happens to land on a query to that query — fatal for the
sub-second text queries whose true cost is a single parquet scan of
column expressions.  This probe answers "is the query actually
super-linear?" the way round 4 settled masked_colsums: one session per
input size, WARMUPS throwaway runs, then REPS timed runs, median
reported, plus the ratio.

Usage: python scripts/probe_query_ratio.py QUERY [QUERY ...]
Env: PROBE_BIG_DIR (/dev/shm/combblas-sfscale10), PROBE_K (10),
     PROBE_CPUS (32), PROBE_SHUFFLE (32), PROBE_REPS (3).
Writes/updates BENCH_PROBE_RATIOS.json {query: {sf0.1_sec, sf10x_sec,
ratio, reps}} — medians of warm runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMUPS = 1


def time_queries(sf_dir: str, names: list[str], cpus: int, shuffle: int,
                 reps: int) -> dict[str, float]:
    from combblas_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="probe-ratio", master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        samples = []
        for r in range(WARMUPS + reps):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            if r >= WARMUPS:
                samples.append(dt)
        out[name] = round(statistics.median(samples), 3)
    spark.stop()
    return out


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: probe_query_ratio.py QUERY [QUERY ...]")
    big_dir = os.environ.get("PROBE_BIG_DIR", "/dev/shm/combblas-sfscale10")
    k = int(os.environ.get("PROBE_K", "10"))
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    shuffle = int(os.environ.get("PROBE_SHUFFLE", "32"))
    reps = int(os.environ.get("PROBE_REPS", "3"))

    small = time_queries("/root/testdata/sf0.1", names, cpus, shuffle, reps)
    big = time_queries(big_dir, names, cpus, shuffle, reps)

    path = os.path.join(REPO, "BENCH_PROBE_RATIOS.json")
    result = json.load(open(path)) if os.path.exists(path) else {}
    for name in names:
        result[name] = {
            "sf0.1_sec": small[name],
            f"sf{k}x_sec": big[name],
            "ratio": round(big[name] / small[name], 2) if small[name] else None,
            "reps": reps,
            "protocol": "standalone, 1 warm-up discarded, median of reps, "
                        "clearCache between runs, fresh session per size",
        }
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
