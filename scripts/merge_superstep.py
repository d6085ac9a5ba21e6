#!/usr/bin/env python
"""Merge bench_superstep.py artifacts recorded in segments.

The round-3 pure-superstep series was recorded as 5 interleaved reps +
2 more (same protocol, same pre-generated input, ~40 min apart) to
reach the 7-run count; this merges the per-run sample lists and
recomputes every estimator, including best-run (the per-run values are
already within-run medians of 8 timed supersteps, so "best run" is a
median, not a lucky single iteration).

Usage: python scripts/merge_superstep.py OUT.json IN1.json IN2.json ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_name, *in_names = sys.argv[1:]
    parts = [json.load(open(os.path.join(REPO, n))) for n in in_names]
    base = parts[0]
    levels = list(base["levels"].keys())
    merged = {lvl: {} for lvl in levels}
    for key in (
        "full_superstep_sec_samples",
        "broadcast_build_sec_samples",
        "pure_superstep_sec_samples",
    ):
        for lvl in levels:
            merged[lvl][key] = [x for p in parts for x in p["levels"][lvl][key]]
    for lvl in levels:
        for key in ("full", "build", "pure"):
            s = merged[lvl][f"{key}_superstep_sec_samples" if key != "build"
                            else "broadcast_build_sec_samples"]
            merged[lvl][f"median_{key}_sec"] = round(statistics.median(s), 3)
            merged[lvl][f"best_run_{key}_sec"] = round(min(s), 3)

    lo, hi = levels[0], levels[-1]
    ratio = base["core_ratio"]
    m = base["graph_edges"]

    def eff(key, agg):
        return round(
            (merged[lo][f"{agg}_{key}_sec"] / merged[hi][f"{agg}_{key}_sec"]) / ratio, 3
        )

    result = {
        "protocol": base["protocol"] + (
            f" [merged from {len(in_names)} recording segments: "
            + ", ".join(
                f"{len(p['levels'][lo]['pure_superstep_sec_samples'])} reps"
                for p in parts
            )
            + "]"
        ),
        "graph_edges": m,
        "levels": merged,
        "core_ratio": ratio,
        "pure_superstep_efficiency": eff("pure", "median"),
        "full_superstep_efficiency": eff("full", "median"),
        "pure_superstep_efficiency_best_run": eff("pure", "best_run"),
        "full_superstep_efficiency_best_run": eff("full", "best_run"),
        "pure_superstep_edges_per_sec": {
            lvl: round(m / merged[lvl]["median_pure_sec"], 1) for lvl in levels
        },
        "pure_superstep_edges_per_sec_best_run": {
            lvl: round(m / merged[lvl]["best_run_pure_sec"], 1) for lvl in levels
        },
    }
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in (
        "pure_superstep_efficiency", "pure_superstep_efficiency_best_run",
        "full_superstep_efficiency")}))


if __name__ == "__main__":
    main()
