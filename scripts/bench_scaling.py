#!/usr/bin/env python
"""Two-parallelism-level scaling evidence (north rule).

No real multi-node cluster exists in the sandbox, so the N -> 4N
executor criterion is evidenced by running the SAME PageRank job on
the SAME input (seeded R-MAT graph) at two parallelism levels
(default 2 and 8 cores = N and 4N) in separate JVMs.

Measurement protocol — the sandbox host's wall-clock drifts by minutes
-scale windows, so the two levels run **simultaneously, pinned to
disjoint physical cores** with ``taskset`` (local[2] on cores 0-1,
local[8] on cores 8-15 by default): host noise hits both measurements
in the same instant and cancels in the ratio.  Each JVM reports
steady-state per-superstep throughput (median per-iteration wall after
JIT warmup; graph construction excluded, Graph500-style).  REPS
simultaneous rounds, per-level median across rounds.

    efficiency = (tput_4N / tput_N) / (4N/N)

Writes BENCH_SCALING.json at the repo root and prints it.

Env knobs: SCALING_N (2), SCALING_4N (8), SCALING_RMAT_SCALE (20),
SCALING_ITERS (15), SCALING_REPS (3), SCALING_MEM (24g).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def start_run(cpus: int, cores: str, scale: str, iters: str, mem: str):
    cmd = [
        "taskset", "-c", cores,
        sys.executable,
        os.path.join(REPO, "bench.py"),
        "--kernel-only",
        "--cpus", str(cpus),
        "--shuffle", "64",
        "--rmat-scale", scale,
        "--fixed-iters", iters,
    ]
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO, env=env,
    )


def main() -> None:
    lo = int(os.environ.get("SCALING_N", "2"))
    hi = int(os.environ.get("SCALING_4N", "8"))
    scale = os.environ.get("SCALING_RMAT_SCALE", "20")
    iters = os.environ.get("SCALING_ITERS", "15")
    reps = int(os.environ.get("SCALING_REPS", "3"))
    mem = os.environ.get("SCALING_MEM", "24g")
    lo_cores = os.environ.get("SCALING_N_CORES", f"0-{lo - 1}")
    hi_cores = os.environ.get("SCALING_4N_CORES", f"8-{8 + hi - 1}")

    samples: dict[int, list[dict]] = {lo: [], hi: []}
    for r in range(reps):
        procs = {
            lo: start_run(lo, lo_cores, scale, iters, mem),
            hi: start_run(hi, hi_cores, scale, iters, mem),
        }
        for cpus, p in procs.items():
            out, _ = p.communicate(timeout=3600)
            line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
            res = json.loads(line)
            samples[cpus].append(res)
            print(
                f"round {r+1}/{reps} local[{cpus}]@cores: "
                f"{res['edges_per_sec_per_iter']:.0f} edges/s/iter "
                f"(loop {res['value']}s)",
                file=sys.stderr,
            )

    tput = {
        c: statistics.median(s["edges_per_sec_per_iter"] for s in samples[c])
        for c in (lo, hi)
    }
    ratio = hi / lo
    eff = (tput[hi] / tput[lo]) / ratio
    result = {
        "protocol": (
            f"seeded R-MAT scale {scale} (edgefactor 16), {iters} fixed PageRank "
            f"iterations; the two levels run SIMULTANEOUSLY pinned to disjoint "
            f"cores (taskset {lo_cores} vs {hi_cores}) so host noise cancels in "
            f"the ratio; {reps} rounds; steady-state median per-superstep "
            "throughput per run; level value = median across rounds"
        ),
        "graph_edges": samples[lo][0]["graph_edges"],
        "levels": {
            f"local[{c}]": {
                "throughput_samples": [s["edges_per_sec_per_iter"] for s in samples[c]],
                "loop_seconds_samples": [s["value"] for s in samples[c]],
                "median_edges_per_sec_per_iter": tput[c],
            }
            for c in (lo, hi)
        },
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "north_rule_pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
