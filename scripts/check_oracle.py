"""Driver-mimic: run each __spark_entry__.queries() entry on Spark and
its oracle_sql() on DuckDB at the given sf dir; compare row count,
column names, and order-insensitive value multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from combblas_spark.session import get_spark  # noqa: E402
from combblas_spark.sources.tables import TABLES  # noqa: E402


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = tuple(r[i] for i in order)
        out.append(tuple(str(v) for v in vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        # oracle first: Spark shuffle files exhaust fds otherwise
        t0 = time.time()
        if name in oracles:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        t_duck = time.time() - t0
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark.catalog.clearCache()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows ({t_spark:.1f}s)")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sn = normalize(srows, scols)
        dn = normalize(drows, dcols)
        ok_vals = sn == dn
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} spark_rows={len(srows)} duck_rows={len(drows)} "
            f"cols={'OK' if ok_cols else f'{scols} vs {dcols}'} "
            f"vals={'OK' if ok_vals else 'MISMATCH'} "
            f"(spark {t_spark:.1f}s, duck {t_duck:.1f}s)"
        )
        if not ok_vals:
            diff_s = [r for r in sn if r not in set(dn)][:3]
            diff_d = [r for r in dn if r not in set(sn)][:3]
            print(f"  spark-only: {diff_s}")
            print(f"  duck-only:  {diff_d}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
