#!/usr/bin/env python
"""Recorded skew-salting evidence (VERDICT r4 next-round #3).

Mirrors the reference's adaptive ReduceAssign claim (CC.h:579-737): a
power-law hub makes the SpMV reduce key skewed — one dst's contribution
rows all land in one partition, so that partition straggles no matter
how many cores exist.  The salted two-level aggregation
(operators/spmv.py:spmv_salted) splits the hub across ``n_salts``
shards; ``spmv(auto_salt=True)`` triggers it from degree stats
(should_salt: max_in_degree > factor * m / n_partitions).

Protocol: deterministic synthetic hub graph — ``m_uniform`` edges with
xxhash64-spread src/dst over 2^20 vertices plus ``m_hub`` edges all
pointing at vertex 0 (hub share ~= m_hub / m).  Dense all-ones vector.
Warm both paths, then REPS alternating timed runs of the full superstep
(join + groupBy agg to count) per path; identical-result checksum.
Writes BENCH_SKEW.json at the repo root.

Env knobs: SKEW_CPUS (32), SKEW_SHUFFLE (32), SKEW_M_UNIFORM (8_000_000),
SKEW_M_HUB (2_500_000), SKEW_REPS (3), SKEW_SALTS (8).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from combblas_spark.graph import Graph  # noqa: E402
from combblas_spark.functions.semiring import PLUS_TIMES  # noqa: E402
from combblas_spark.operators.spmv import (  # noqa: E402
    _route_salted,
    in_degree_skew,
    salt_edges,
    should_salt,
    spmv,
    spmv_salted,
    spmv_salted_join,
)
from combblas_spark.session import get_spark  # noqa: E402


def hub_graph(spark, n_vertices: int, m_uniform: int, m_hub: int, parts: int,
              hub_side: str = "dst"):
    """Deterministic hub graph: xxhash64-spread uniform edges + a hub
    holding ``m_hub`` edges on one vertex (``hub_side`` = dst for
    agg-key skew, src for join-key skew)."""
    uni = spark.range(m_uniform).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_vertices)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_vertices)).alias("dst"),
        F.lit(1.0).alias("w"),
    )
    spread = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_vertices))
    zero = F.lit(0).cast("long")
    hub = spark.range(m_hub).select(
        (spread if hub_side == "dst" else zero).alias("src"),
        (zero if hub_side == "dst" else spread).alias("dst"),
        F.lit(1.0).alias("w"),
    )
    edges = uni.unionByName(hub).repartition(parts, "src").cache()
    edges.count()
    return Graph(edges=edges, n_partitions=parts)


def checksum(df) -> tuple[int, float]:
    row = df.agg(F.count("*").alias("c"), F.sum("val").alias("s")).collect()[0]
    return int(row["c"]), round(float(row["s"]), 6)


def main() -> None:
    cpus = int(os.environ.get("SKEW_CPUS", "32"))
    shuffle = int(os.environ.get("SKEW_SHUFFLE", "32"))
    m_uniform = int(os.environ.get("SKEW_M_UNIFORM", "8000000"))
    m_hub = int(os.environ.get("SKEW_M_HUB", "2500000"))
    reps = int(os.environ.get("SKEW_REPS", "3"))
    n_salts = int(os.environ.get("SKEW_SALTS", "8"))
    n_vertices = 1 << 20

    spark = get_spark(
        app_name="combblas-skew-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    g = hub_graph(spark, n_vertices, m_uniform, m_hub, shuffle)
    mx, m = in_degree_skew(g)
    vec = (
        spark.range(n_vertices)
        .select(F.col("id").alias("v"), F.lit(1.0).alias("val"))
        .cache()
    )
    vec.count()

    paths = {
        "unsalted": lambda: spmv(g, vec),
        "salted": lambda: spmv_salted(g, vec, n_salts=n_salts),
        "auto_declines": lambda: spmv(g, vec, auto_salt=True, skew_stats=(mx, m)),
    }
    sums = {name: checksum(fn()) for name, fn in paths.items()}  # warm + verify
    assert len(set(sums.values())) == 1, f"paths disagree: {sums}"

    times: dict[str, list[float]] = {name: [] for name in paths}
    for _ in range(reps):
        for name, fn in paths.items():
            t0 = time.time()
            fn().count()
            times[name].append(round(time.time() - t0, 3))

    med = {name: sorted(ts)[len(ts) // 2] for name, ts in times.items()}

    # --- regime 2: JOIN-key skew (hub SRC, vector beyond broadcast) ----
    # the co-partitioned hash(src) layout puts the hub src's whole edge
    # block in one partition (at corpus scale: a whole-executor-memory
    # partition); salt_edges spreads it over n_salts shards, the join
    # replicates the (small) vector side.  Both layouts cached OUTSIDE
    # the timer — the iterative regime pays the layout once.
    g2 = hub_graph(spark, n_vertices, m_uniform, m_hub, shuffle, hub_side="src")
    g2s = salt_edges(g2, n_salts=n_salts)
    g2s = Graph(edges=g2s.edges.cache(), n_partitions=shuffle)
    g2s.edges.count()

    def part_balance(edges):
        rows = (
            edges.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
            .collect()[0]
        )
        return {
            "max_partition_rows": int(rows["mx"]),
            "mean_partition_rows": int(rows["avg"]),
            "imbalance": round(rows["mx"] / rows["avg"], 2),
        }

    balance = {
        "hash_src_layout": part_balance(g2.edges),
        "salted_layout": part_balance(g2s.edges),
    }

    jpaths = {
        "plain_shj": lambda: spmv(g2, vec, broadcast_vector=False),
        "salted_join": lambda: spmv_salted_join(g2s, vec, n_salts=n_salts),
    }
    jsums = {name: checksum(fn()) for name, fn in jpaths.items()}
    assert len(set(jsums.values())) == 1, f"join paths disagree: {jsums}"
    jtimes: dict[str, list[float]] = {name: [] for name in jpaths}
    for _ in range(reps):
        for name, fn in jpaths.items():
            t0 = time.time()
            fn().count()
            jtimes[name].append(round(time.time() - t0, 3))
    jmed = {name: sorted(ts)[len(ts) // 2] for name, ts in jtimes.items()}

    result = {
        "protocol": (
            f"deterministic hub graph: {m_uniform} xxhash64-spread edges + "
            f"{m_hub} hub edges (hub share {m_hub / (m_uniform + m_hub):.3f}) "
            f"over 2^20 vertices, dense all-ones vector, local[{cpus}] "
            f"shuffle={shuffle}, {reps} warm alternating reps per path, "
            f"n_salts={n_salts}; identical-output checksum asserted per regime"
        ),
        "graph": {"edges": m, "max_in_degree": mx, "hub_share": round(mx / m, 4)},
        "trigger": {
            "should_salt": should_salt(mx, m, shuffle),
            "threshold_rows": round(4.0 * m / shuffle, 1),
            "route_salted_plus_times": _route_salted(
                PLUS_TIMES, (mx, m), shuffle
            ),
            "note": (
                "skew detection fires (hub >> m/P) but routing correctly "
                "DECLINES to salt the partial-agg-capable PLUS_TIMES add "
                "— the measured agg regime below shows why; the "
                "threshold normalizes by m/n_partitions, so the same hub "
                "share that straggles 32 local partitions also fires at "
                "2000 cluster partitions where even a 1% hub is 20x the "
                "mean key share"
            ),
        },
        "agg_skew_regime": {
            "what": "hub DST: groupBy(dst) reduce-key skew",
            "seconds": times,
            "median_seconds": med,
            "salted_speedup": round(med["unsalted"] / med["salted"], 3),
            "finding": (
                "for algebraic semirings Spark's map-side partial "
                "aggregation pre-combines the hot key per map partition "
                "(only ~n_partitions rows per hot key shuffle), so agg "
                "salting adds an exchange without removing a bottleneck "
                "— plain path wins; spmv_salted is for non-partial adds"
            ),
        },
        "join_skew_regime": {
            "what": "hub SRC: co-partitioned hash(src) join skew, "
                    "vector beyond broadcast reach; both edge layouts "
                    "pre-cached (iterative regime)",
            "partition_balance": balance,
            "seconds": jtimes,
            "median_seconds": jmed,
            "salted_join_speedup": round(
                jmed["plain_shj"] / jmed["salted_join"], 3
            ),
            "finding": (
                "at local scale the hub partition's extra PROBE work is "
                "cheap, so wall times are close — the recorded balance "
                "table is the scale evidence: hash(src) concentrates "
                "the hub's whole block in one partition (imbalance ~ "
                "hub_share*P), the salted layout caps it near m/P, "
                "which at 100 TB is the difference between one executor "
                "holding the hub's entire edge block and not"
            ),
        },
        "checksum": {"rows": sums["unsalted"][0], "val_sum": sums["unsalted"][1]},
    }
    with open(os.path.join(REPO, "BENCH_SKEW.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
