#!/usr/bin/env python
"""Pure-superstep scaling decomposition (north-rule evidence, part 2).

Isolates the components of one PageRank iteration at two pinned
parallelism levels so the full-loop efficiency number can be decomposed
Amdahl-style:

* ``full superstep``  — broadcast-build + edges ⋈ contrib → groupBy(dst)
  partial+final aggregate, materialized to a noop sink (no driver
  collect of the result rows);
* ``broadcast build`` — the same broadcast relation built against a
  one-row probe side (the build job runs in full; the stream side is a
  LocalRelation), isolating the per-iteration serial driver component;
* ``pure superstep``  = full − build, the distributed join+agg compute.

Run by scripts/run_scaling_evidence.sh with taskset pinning; writes
BENCH_SUPERSTEP.json with per-level sample series and the efficiency of
each component between the two levels.

Env knobs: SUPERSTEP_LEVELS ("2,8"), SUPERSTEP_PIN ("0,1|0-7"),
SUPERSTEP_RMAT_SCALE (20), SUPERSTEP_EDGE_FACTOR (48), SUPERSTEP_REPS
(7), SUPERSTEP_ITERS (8), SUPERSTEP_SHUFFLE (16), SUPERSTEP_MEM (48g).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(cpus: int, shuffle: int, iters: int, parquet: str) -> None:
    """Single-JVM measurement; prints one JSON line."""
    import time

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from bench import build_spark

    spark = build_spark(cpus, shuffle)
    edges = (
        spark.read.parquet(parquet)
        .select("src", "dst")
        .repartition(shuffle, "dst")
        .cache()
    )
    m = edges.count()
    vd = (
        edges.select(F.col("src").alias("v"), F.lit(1).alias("_c"))
        .unionByName(edges.select(F.col("dst").alias("v"), F.lit(0).alias("_c")))
        .groupBy("v")
        .agg(F.sum("_c").alias("deg"))
        .repartition(8, "v")
        .cache()
    )
    n = vd.count()
    ranks = vd.select(
        "v", "deg", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    contrib = ranks.filter(F.col("deg") > 0).select(
        "v", (F.col("rank") / F.col("deg")).alias("val")
    )
    probe = spark.createDataFrame([(0, 0)], "src long, dst long")

    def superstep():
        return (
            edges.join(F.broadcast(contrib), edges["src"] == contrib["v"], "inner")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("val").alias("s"))
        )

    def build_only():
        return (
            probe.join(F.broadcast(contrib), probe["src"] == contrib["v"], "left")
            .select(probe["src"])
        )

    def run(df_fn, k):
        out = []
        for _ in range(k):
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            out.append(time.time() - t0)
        return out

    run(superstep, 2)  # JIT / cache warmup, untimed
    full = run(superstep, iters)
    build = run(build_only, iters)
    print(json.dumps({"cpus": cpus, "edges": m, "n": n,
                      "full": full, "build": build}))
    spark.stop()


def main() -> None:
    levels = [int(x) for x in os.environ.get("SUPERSTEP_LEVELS", "2,8").split(",")]
    pins = os.environ.get("SUPERSTEP_PIN", "0,1|0-7").split("|")
    scale = os.environ.get("SUPERSTEP_RMAT_SCALE", "20")
    ef = os.environ.get("SUPERSTEP_EDGE_FACTOR", "48")
    reps = int(os.environ.get("SUPERSTEP_REPS", "7"))
    iters = os.environ.get("SUPERSTEP_ITERS", "8")
    shuffle = os.environ.get("SUPERSTEP_SHUFFLE", "16")
    mem = os.environ.get("SUPERSTEP_MEM", "48g")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    parquet = os.path.join(base, f"combblas-rmat-s{scale}-ef{ef}.parquet")

    samples: dict[int, list[dict]] = {c: [] for c in levels}
    for r in range(reps):
        for cpus, pin in zip(levels, pins):  # interleaved
            cmd = ["taskset", "-c", pin, sys.executable, __file__,
                   "--worker", str(cpus), shuffle, iters, parquet]
            env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 cwd=REPO, env=env, check=True)
            line = [l for l in out.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            res = json.loads(line)
            samples[cpus].append(res)
            med_full = statistics.median(res["full"])
            med_build = statistics.median(res["build"])
            print(f"rep {r+1}/{reps} local[{cpus}] pin={pin}: "
                  f"full {med_full:.2f}s build {med_build:.2f}s "
                  f"pure {med_full - med_build:.2f}s",
                  file=sys.stderr, flush=True)

    lo, hi = levels[0], levels[-1]
    ratio = hi / lo

    def level_stats(c):
        fulls = [statistics.median(s["full"]) for s in samples[c]]
        builds = [statistics.median(s["build"]) for s in samples[c]]
        pures = [f - b for f, b in zip(fulls, builds)]
        return {
            "full_superstep_sec_samples": [round(x, 3) for x in fulls],
            "broadcast_build_sec_samples": [round(x, 3) for x in builds],
            "pure_superstep_sec_samples": [round(x, 3) for x in pures],
            "median_full_sec": round(statistics.median(fulls), 3),
            "median_build_sec": round(statistics.median(builds), 3),
            "median_pure_sec": round(statistics.median(pures), 3),
        }

    stats = {f"local[{c}]": level_stats(c) for c in levels}
    m = samples[lo][0]["edges"]
    lo_s, hi_s = stats[f"local[{lo}]"], stats[f"local[{hi}]"]
    eff_full = (lo_s["median_full_sec"] / hi_s["median_full_sec"]) / ratio
    eff_pure = (lo_s["median_pure_sec"] / hi_s["median_pure_sec"]) / ratio
    result = {
        "protocol": (
            f"isolated PageRank superstep components, seeded R-MAT scale {scale} "
            f"(ef {ef}, {m} edges), taskset-pinned local[{lo}] vs local[{hi}] "
            f"(cores {pins[0]} vs {pins[-1]}), {reps} interleaved fresh-JVM runs "
            f"per level, {iters} timed repetitions per run (2 warmup dropped), "
            f"shuffle={shuffle}; full = bcast build + join + groupBy agg to noop "
            "sink; build = same broadcast vs 1-row probe; pure = full - build"
        ),
        "graph_edges": m,
        "levels": stats,
        "core_ratio": ratio,
        "pure_superstep_efficiency": round(eff_pure, 3),
        "full_superstep_efficiency": round(eff_full, 3),
        "pure_superstep_edges_per_sec": {
            f"local[{c}]": round(m / stats[f"local[{c}]"]["median_pure_sec"], 1)
            for c in levels
        },
    }
    out_name = os.environ.get("SUPERSTEP_OUT", "BENCH_SUPERSTEP.json")
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        main()
