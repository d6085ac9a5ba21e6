#!/usr/bin/env python
"""Two-parallelism-level scaling evidence (north rule).

No real multi-node cluster exists in the sandbox, so the N -> 4N
executor criterion is evidenced by running the SAME PageRank kernel on
the SAME input at two local parallelism levels (default local[8] and
local[32], i.e. N and 4N cores) in separate JVMs, and reporting
throughput (edges/sec per SpMV iteration) at both plus

    efficiency = (tput_4N / tput_N) / 4

Writes BENCH_SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench.py"),
        "--kernel-only",
        "--cpus",
        str(cpus),
        "--sf-dir",
        sf_dir,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    lo_cpus = int(os.environ.get("SCALING_N", "8"))
    hi_cpus = int(os.environ.get("SCALING_4N", "32"))

    lo = run_level(lo_cpus, sf_dir)
    hi = run_level(hi_cpus, sf_dir)
    ratio = hi_cpus / lo_cpus
    eff = (hi["edges_per_sec_per_iter"] / lo["edges_per_sec_per_iter"]) / ratio
    result = {
        "sf_dir": sf_dir,
        "levels": {f"local[{lo_cpus}]": lo, f"local[{hi_cpus}]": hi},
        "throughput_edges_per_sec_per_iter": {
            f"local[{lo_cpus}]": lo["edges_per_sec_per_iter"],
            f"local[{hi_cpus}]": hi["edges_per_sec_per_iter"],
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
