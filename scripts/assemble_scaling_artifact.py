#!/usr/bin/env python
"""Assemble the final BENCH_SCALING.json north-rule artifact.

Inputs (repo root, produced by bench_scaling.py / bench_superstep.py):
  * a HEADLINE series json (the recorded (scale, levels) pair the pass
    claim rests on),
  * zero or more SECONDARY series jsons (other level pairs / paths,
    recorded for full disclosure),
  * optionally a superstep decomposition json (pure compute vs
    broadcast-build isolation, the Amdahl evidence).

The headline series' fields stay at the top level (so readers of the
round-2 artifact shape find the same keys); secondary series and the
decomposition ride under their own keys.

Usage:
  python scripts/assemble_scaling_artifact.py HEADLINE.json \
      [--secondary name=FILE ...] [--superstep FILE] [--note TEXT] \
      [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name: str) -> dict:
    with open(os.path.join(REPO, name)) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("headline")
    ap.add_argument("--secondary", action="append", default=[],
                    help="name=file of an additional recorded series")
    ap.add_argument("--superstep", default="")
    ap.add_argument("--note", default="")
    ap.add_argument("--out", default="BENCH_SCALING.json")
    args = ap.parse_args()

    art = load(args.headline)
    if args.secondary:
        art["secondary_series"] = {}
        for spec in args.secondary:
            name, fname = spec.split("=", 1)
            art["secondary_series"][name] = load(fname)
    if args.superstep:
        art["superstep_decomposition"] = load(args.superstep)
    if args.note:
        art["note"] = args.note

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(art, f, indent=2)
    print(json.dumps({k: art.get(k) for k in (
        "scaling_efficiency", "scaling_efficiency_best_run",
        "scaling_efficiency_best_iter_median",
        "north_rule_pass", "north_rule_pass_best_run",
        "north_rule_pass_best_iter_median")}))


if __name__ == "__main__":
    main()
