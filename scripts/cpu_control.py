#!/usr/bin/env python
"""Host control experiment for the scaling artifact.

The N -> 4N sandbox evidence divides per-iteration throughput measured
with 1 active core by throughput with 4 active cores.  On a shared
host two confounds make that ratio UNDERSTATE real-cluster scaling,
where per-node clocks and memory systems are identical at both sizes:

* frequency/turbo: a single busy core may be clocked higher than four;
* shared-resource contention: L3/memory controller pressure grows with
  active cores.

This script quantifies both with two microbenchmarks, each run pinned
to one otherwise-idle core alone and then on four cores concurrently:

* ``alu``  — a register/L1-bound integer loop (no memory traffic):
  its 4-core/1-core per-core slowdown isolates the clock effect;
* ``stream`` — a DRAM-streaming numpy sum over a buffer far larger
  than L3: its slowdown adds the bandwidth-sharing effect.

Writes CPU_CONTROL.json: per-core times and the slowdown factors.  A
factor f means per-core speed with 4 active cores is 1/f of the
1-active-core speed, so a measured same-socket efficiency E
corresponds to ~E*f per-core-normalized (the cross-node analogue).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def alu(n: int = 60_000_000) -> float:
    t0 = time.perf_counter()
    x = 1469598103934665603
    for _ in range(n // 10):
        x = (x * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
    return time.perf_counter() - t0


def stream(mb: int = 1024, reps: int = 6) -> float:
    import numpy as np

    a = np.ones(mb * 131072, dtype=np.float64)  # mb MiB
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(reps):
        s += float(a.sum())
    dt = time.perf_counter() - t0
    assert s > 0
    return dt


def worker(kind: str) -> None:
    fn = alu if kind == "alu" else stream
    fn()  # warmup
    print(json.dumps({"t": statistics.median(fn() for _ in range(3))}))


def run_pinned(kind: str, cores: list[str]) -> list[float]:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", c, sys.executable, __file__, "--worker", kind],
            stdout=subprocess.PIPE, text=True,
        )
        for c in cores
    ]
    out = []
    for p in procs:
        stdout, _ = p.communicate()
        out.append(json.loads(stdout.strip().splitlines()[-1])["t"])
    return out


def main() -> None:
    base = int(os.environ.get("CONTROL_BASE_CORE", "16"))
    cores4 = [str(base + i) for i in range(4)]
    result = {}
    for kind in ("alu", "stream"):
        one = run_pinned(kind, [str(base)])
        four = run_pinned(kind, cores4)
        f = statistics.median(four) / one[0]
        result[kind] = {
            "t_1core_active": round(one[0], 3),
            "t_4cores_active_each": [round(x, 3) for x in four],
            "per_core_slowdown_factor": round(f, 3),
        }
    result["note"] = (
        "per_core_slowdown_factor f: with 4 active cores each core runs "
        "1/f as fast as a lone core on this host; same-socket N->4N "
        "efficiency E therefore corresponds to ~min(1, E*f) once per-core "
        "conditions are equalized, as they are between the equal-sized "
        "nodes of a real N vs 4N cluster"
    )
    with open(os.path.join(REPO, "CPU_CONTROL.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        main()
