#!/usr/bin/env python
"""Two-point per-query scale curve (VERDICT r4 next-round #4).

Runs the full headline-query sweep (bench.py) at sf0.1 and at the
deterministic K× input from make_scale_input.py (key-disjoint copies:
per-copy structure identical, cross-copy interactions null — see that
script's docstring), then records time(Kx)/time(1x) per query and flags
super-linear growers (ratio > FLAG_SLACK * K).

For a linear-work operator the expected ratio is ≤ K (usually well
below K at this size: fixed per-query constants — session, planning,
stage launch — amortize).  A ratio beyond K means the operator's work
grew faster than its input: exactly the queries to re-plan before a
real 100 TB run.

Writes BENCH_SCALE_CURVE.json at the repo root.

Env knobs: CURVE_K (10), CURVE_DIR (/dev/shm/combblas-sfscale10),
CURVE_CPUS (32), CURVE_SHUFFLE (32), FLAG_SLACK (1.25),
CURVE_OUT (BENCH_SCALE_CURVE.json — write elsewhere to trial-run
without clobbering the recorded artifact).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, shuffle: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "bench.py"),
            "--sf-dir", sf_dir, "--cpus", str(cpus), "--shuffle", str(shuffle),
        ],
        capture_output=True, text=True, cwd=REPO, check=True,
        env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM="48g"),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def read_steal() -> int:
    """Cumulative host-steal jiffies — this VM's shared host delivers
    steal in multi-minute bursts (BASELINE.md, round-5 loop notes), so
    the artifact records the per-sweep delta: a curve taken inside a
    burst shows inflated walls at BOTH sizes and must not be read as a
    plan property."""
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    k = int(os.environ.get("CURVE_K", "10"))
    big_dir = os.environ.get("CURVE_DIR", "/dev/shm/combblas-sfscale10")
    cpus = int(os.environ.get("CURVE_CPUS", "32"))
    shuffle = int(os.environ.get("CURVE_SHUFFLE", "32"))
    slack = float(os.environ.get("FLAG_SLACK", "1.25"))

    if not os.path.exists(os.path.join(big_dir, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/make_scale_input.py"),
             big_dir, str(k)],
            cwd=REPO, check=True,
            env=dict(os.environ, SPARK_GRAFT_CPUS=str(cpus)),
        )

    s0 = read_steal()
    small = run_bench("/root/testdata/sf0.1", cpus, shuffle)
    s1 = read_steal()
    big = run_bench(big_dir, cpus, shuffle)
    s2 = read_steal()

    curve = {}
    for q, t1 in small["queries"].items():
        tk = big["queries"].get(q)
        if tk is None:
            continue
        curve[q] = {
            "sf0.1_sec": t1,
            f"sf{k}x_sec": tk,
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
        }
    flagged = sorted(
        (q for q, c in curve.items() if c["ratio"] and c["ratio"] > slack * k),
        key=lambda q: -curve[q]["ratio"],
    )
    result = {
        "protocol": (
            f"full headline sweep at sf0.1 and at the deterministic {k}x "
            f"key-disjoint input (scripts/make_scale_input.py), local[{cpus}] "
            f"shuffle={shuffle}, one run each; ratio = time({k}x)/time(1x), "
            f"flag threshold {slack}*K"
        ),
        "k": k,
        "totals": {
            "sf0.1_sec": small["value"],
            f"sf{k}x_sec": big["value"],
            "ratio": round(big["value"] / small["value"], 2),
        },
        "north_metric_edges_per_sec_per_iter": {
            "sf0.1": small.get("edges_per_sec_per_iter"),
            f"sf{k}x": big.get("edges_per_sec_per_iter"),
        },
        "pagerank_iterations": {
            "sf0.1": small.get("pagerank_iterations"),
            f"sf{k}x": big.get("pagerank_iterations"),
        },
        "per_query": curve,
        "flagged_superlinear": flagged,
        "steal_sec": {
            "sf0.1_sweep": round((s1 - s0) / os.sysconf("SC_CLK_TCK"), 1),
            f"sf{k}x_sweep": round((s2 - s1) / os.sysconf("SC_CLK_TCK"), 1),
        },
    }
    out_name = os.environ.get("CURVE_OUT", "BENCH_SCALE_CURVE.json")
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
