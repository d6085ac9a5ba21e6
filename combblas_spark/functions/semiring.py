"""Semiring algebra compiled to Spark Column expressions.

The reference parameterizes every multiply on a user-defined semiring
struct with ``add``/``multiply``/``id`` members
(include/CombBLAS/Semirings.h:50-259).  Here a :class:`Semiring` carries

* ``mult(edge_w, vec_val) -> Column`` — the per-edge contribution
  (CombBLAS ``multiply``: edge value × source-vertex value), and
* ``add(col) -> Column`` — the per-destination aggregate
  (CombBLAS ``add`` folded into Spark's partial+final aggregation, which
  is exactly the reference's map-side-combine ReduceAssign strategy,
  Applications/CC.h:579-737), and
* ``zero`` — the additive identity used for missing entries.

Everything stays a JVM-side Column expression: no Python scalars in the
hot path.  Shipped semirings mirror include/CombBLAS/Semirings.h:

=================  =============================  =======================
Semiring           reference                      Spark compilation
=================  =============================  =======================
plus_times         PlusTimesSRing :213-233        F.sum(w * val)
min_plus           MinPlusSRing   :235-256        F.min(w + val)
max_second         SelectMaxSRing :165-210        F.max(val)
second_min         Select2ndMinSR CC.h:62-84      F.min(val)
second_max         Select2ndSRing :143-163        F.max(val)
=================  =============================  =======================
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Semiring:
    """A (add, multiply, zero) algebra over Column expressions."""

    name: str
    mult: Callable[[Column, Column], Column]
    add: Callable[[Column], Column]
    zero: object = 0.0
    #: commutative & idempotent adds (min/max) can skip exact dedup work
    idempotent: bool = False
    #: True when ``add`` supports Spark's map-side partial aggregation
    #: (sum/min/max/count do).  Partial-capable adds are reduce-skew-
    #: immune — each map partition pre-combines a hot key to one row —
    #: so the salted-aggregation path never helps them (measured,
    #: BENCH_SKEW.json).  Set False for gather-style adds
    #: (collect_list-like), which ship every row to the reduce side.
    partial_agg: bool = True

    def contribution(self, w: Column, val: Column) -> Column:
        return self.mult(w, val)

    def aggregate(self, contrib: Column) -> Column:
        return self.add(contrib)


# --- shipped semirings (Semirings.h analogues) ---------------------------

PLUS_TIMES = Semiring(
    name="plus_times",
    mult=lambda w, v: w * v,
    add=lambda c: F.sum(c),
    zero=0.0,
)

MIN_PLUS = Semiring(
    name="min_plus",
    mult=lambda w, v: w + v,
    add=lambda c: F.min(c),
    zero=float("inf"),
    idempotent=True,
)

# select-2nd family: multiply ignores the edge weight and propagates the
# vertex value; add picks min or max.  These drive BFS parent selection
# (SelectMaxSRing, TopDownBFS.cpp:136) and connected components
# (Select2ndMinSR, CC.h:62-84 / FastSV.h:25-44).
SECOND_MIN = Semiring(
    name="second_min",
    mult=lambda w, v: v,
    add=lambda c: F.min(c),
    zero=float("inf"),
    idempotent=True,
)

SECOND_MAX = Semiring(
    name="second_max",
    mult=lambda w, v: v,
    add=lambda c: F.max(c),
    zero=float("-inf"),
    idempotent=True,
)

MAX_TIMES = Semiring(
    name="max_times",
    mult=lambda w, v: w * v,
    add=lambda c: F.max(c),
    zero=float("-inf"),
    idempotent=True,
)

SEMIRINGS = {
    s.name: s
    for s in (PLUS_TIMES, MIN_PLUS, SECOND_MIN, SECOND_MAX, MAX_TIMES)
}
