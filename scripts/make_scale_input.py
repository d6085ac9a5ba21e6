#!/usr/bin/env python
"""Deterministic K× scale-up of the driver testdata (two-point scale curve).

VERDICT r4 next-round #4: the 2×-of-baseline bar was evidenced at sf0.1
only; the scale curve needs a second, larger point.  /root/testdata is
read-only, so this script derives an sf1-equivalent (default K=10) from
sf0.1 WITHOUT inventing a new generator: each scaled table is K
key-disjoint copies of the original, so per-copy structure (degree
distributions, join fan-outs, text statistics) is exactly the sf0.1
structure and expected output sizes scale ~K-fold.

Copy-disjointness rules (the part that keeps the scale-up honest):

* dimension tables (region, nation) stay fixed — TPC-H semantics;
* fact tables get per-copy key offsets chosen to keep every id space
  disjoint AND below the engine's SUPPLIER_OFFSET bipartite split
  (sources/tables.py:29);
* documents: copy i>0 suffixes every TOKEN with ``_i`` — gram counts
  and doc lengths are preserved (equal per-doc work) while cross-copy
  Jaccard is exactly 0, so near-dup structure replicates instead of
  exploding quadratically as verbatim duplication would;
* embeddings: copy i>0 applies a deterministic ±1 diagonal transform
  (sign from xxhash64(pos, i)) — an orthogonal map, so within-copy
  cosines are preserved exactly while cross-copy cosines scramble
  below any near-dup threshold.

Usage: python scripts/make_scale_input.py [out_dir] [K]
Defaults: /dev/shm/combblas-sfscale10 10
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from combblas_spark.session import get_spark  # noqa: E402

SRC_DIR = "/root/testdata/sf0.1"

#: per-copy id offsets — chosen so K*offset stays inside each table's
#: disjoint range (custkeys < 1e6 = SUPPLIER_OFFSET; suppkey+1e6 ids
#: stay above every custkey)
OFFSETS = {
    "customer": {"c_custkey": 50_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 50_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 100_000,
        "l_suppkey": 10_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 10_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

FIXED = ("region", "nation")

#: absolute ceilings the scaled key space must stay under — customer
#: vertex ids must stay below the engine's bipartite split
#: (sources/tables.py SUPPLIER_OFFSET = 1e6: suppliers map to
#: suppkey + 1e6, so a scaled custkey crossing 1e6 would COLLIDE with
#: the supplier id space and silently corrupt every graph query)
BUDGETS = {
    ("customer", "c_custkey"): 1_000_000,
    ("orders", "o_custkey"): 1_000_000,
}


def check_budgets(base, table: str, k: int) -> None:
    """Fail loudly if K copies would overlap each other or cross an
    absolute id budget — the key-disjointness invariant the whole
    scale-curve protocol rests on."""
    cols = list(OFFSETS[table])
    maxes = base.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
    for col in cols:
        off, mx = OFFSETS[table][col], int(maxes[col])
        if mx >= off:
            raise SystemExit(
                f"{table}.{col}: base max {mx} >= per-copy offset {off} — "
                f"adjacent copies overlap"
            )
        budget = BUDGETS.get((table, col))
        if budget is not None and (k - 1) * off + mx >= budget:
            raise SystemExit(
                f"{table}.{col}: copy {k - 1} reaches "
                f"{(k - 1) * off + mx} >= budget {budget} "
                f"(SUPPLIER_OFFSET collision) — K={k} is too large for "
                f"this offset table"
            )


def scaled_copy(df, table: str, i: int):
    out = df
    for col, off in OFFSETS[table].items():
        out = out.withColumn(col, (F.col(col) + F.lit(i * off)).cast("long"))
    if table == "documents" and i > 0:
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " ", -1),
                lambda t: F.concat(t, F.lit(f"_{i}")),
            ),
            " ",
        )
        out = out.withColumn("text", suffixed).withColumn(
            "n_chars", F.length("text").cast("long")
        )
    if table == "embeddings" and i > 0:
        flipped = F.transform(
            F.col("embedding"),
            lambda x, pos: (
                x
                * F.when(
                    F.pmod(F.xxhash64(pos.cast("long"), F.lit(i)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).cast("float"),
        )
        out = out.withColumn("embedding", flipped)
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/combblas-sfscale10"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="combblas-scale-input")
    os.makedirs(out_dir, exist_ok=True)
    for t in FIXED:
        spark.read.parquet(f"{SRC_DIR}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t in OFFSETS:
        base = spark.read.parquet(f"{SRC_DIR}/{t}.parquet")
        check_budgets(base, t, k)
        copies = scaled_copy(base, t, 0)
        for i in range(1, k):
            copies = copies.unionByName(scaled_copy(base, t, i))
        copies.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {k}x written", file=sys.stderr)
    print(out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
