"""Element-wise operators (SURVEY.md §2.3): Apply / Prune / EWise* /
SetDifference / DimApply on matrices (edge DataFrames) and vectors.

Reference semantics:
- Apply(unop): map over nonzeros (SpParMat.h:147-151)
- Prune(pred) / PruneI: drop nonzeros by value / (i,j,v) (SpParMat.h:162-189)
- PruneColumn(vec, binop): drop nonzeros failing per-column test vs a
  vector (SpParMat.cpp:2574-2655)
- EWiseMult(A,B,exclude): Hadamard on intersection; exclude=true keeps
  A-entries whose (i,j) is absent from B (ParFriends.h:3215-3234)
- EWiseApply(A,B,binop,...): generalized elementwise with union/
  intersection null semantics (ParFriends.h:3235-3284)
- SetDifference(A,B): A − B on pattern (ParFriends.h:3198-3213)

Everything is a Column expression or a join — no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph


# -- matrix (edge table) ops ------------------------------------------------

def apply(g: Graph, unop: Callable[[Column], Column]) -> Graph:
    """Apply(unop) over nonzero values."""
    return replace(g, edges=g.edges.withColumn(W, unop(F.col(W))))


def prune(g: Graph, pred: Callable[[Column], Column]) -> Graph:
    """Prune(pred): REMOVE entries where pred(value) holds."""
    return replace(g, edges=g.edges.filter(~pred(F.col(W))))


def prune_ijv(
    g: Graph, pred: Callable[[Column, Column, Column], Column]
) -> Graph:
    """PruneI: remove entries where pred(i, j, value) holds."""
    return replace(
        g, edges=g.edges.filter(~pred(F.col(SRC), F.col(DST), F.col(W)))
    )


def prune_column(
    g: Graph,
    vec: DataFrame,
    keep: Callable[[Column, Column], Column],
    val_col: str = "val",
) -> Graph:
    """PruneColumn: keep edge (i,j,v) iff keep(v, vec[j]) holds.

    Columns with no vector entry are kept untouched (reference keeps
    columns absent from the sparse vector).
    """
    v = vec.select(F.col("v").alias(DST), F.col(val_col).alias("_thr"))
    pruned = (
        g.edges.join(v, DST, "left")
        .filter(F.col("_thr").isNull() | keep(F.col(W), F.col("_thr")))
        .drop("_thr")
    )
    return replace(g, edges=pruned)


def prune_column_by_index(g: Graph, cols: DataFrame) -> Graph:
    """PruneColumnByIndex (SpParMat.cpp:2656-2716): drop whole columns
    listed in ``cols`` (v)."""
    c = cols.select(F.col("v").alias(DST))
    return replace(g, edges=g.edges.join(c, DST, "left_anti"))


def prune_rows_cols(g: Graph, rows: DataFrame, cols: DataFrame) -> Graph:
    """Prune(ri, ci) (SpParMat.h:240): remove entries with row∈ri AND
    col∈ci (the ri×ci sub-block is cleared; everything else kept).
    ``rows``/``cols``: (v)."""
    r = rows.select(F.col("v").alias(SRC))
    c = cols.select(F.col("v").alias(DST))
    in_block = (
        g.edges.join(r, SRC, "left_semi").join(c, DST, "left_semi")
    )
    return replace(
        g, edges=g.edges.join(in_block.select(SRC, DST), [SRC, DST], "left_anti")
    )


def prune_full(g: Graph, rows: DataFrame, cols: DataFrame) -> Graph:
    """PruneFull (SpParMat.h:241): remove every entry whose row∈ri OR
    col∈ci (full row/column clearing)."""
    r = rows.select(F.col("v").alias(SRC))
    c = cols.select(F.col("v").alias(DST))
    return replace(
        g,
        edges=g.edges.join(r, SRC, "left_anti").join(c, DST, "left_anti"),
    )


def ewise_mult(
    a: Graph,
    b: Graph,
    exclude: bool = False,
    op: Callable[[Column, Column], Column] = lambda x, y: x * y,
) -> Graph:
    """EWiseMult(A, B, exclude) — Hadamard (inner join) or A∘!B (anti)."""
    if exclude:
        return replace(
            a, edges=a.edges.join(b.edges.select(SRC, DST), [SRC, DST], "left_anti")
        )
    be = b.edges.select(SRC, DST, F.col(W).alias("_bw"))
    joined = a.edges.join(be, [SRC, DST], "inner").select(
        SRC, DST, op(F.col(W), F.col("_bw")).alias(W)
    )
    return replace(a, edges=joined)


def ewise_apply(
    a: Graph,
    b: Graph,
    binop: Callable[[Column, Column], Column],
    a_null: float | None = None,
    b_null: float | None = None,
) -> Graph:
    """EWiseApply with union semantics when both nulls given (full outer
    join + coalesce defaults), intersection semantics otherwise."""
    be = b.edges.select(SRC, DST, F.col(W).alias("_bw"))
    if a_null is None and b_null is None:
        joined = a.edges.join(be, [SRC, DST], "inner")
        out = joined.select(SRC, DST, binop(F.col(W), F.col("_bw")).alias(W))
    else:
        joined = a.edges.join(be, [SRC, DST], "full_outer")
        aw = F.coalesce(F.col(W), F.lit(a_null))
        bw = F.coalesce(F.col("_bw"), F.lit(b_null))
        out = joined.select(SRC, DST, binop(aw, bw).alias(W))
    return replace(a, edges=out)


def set_difference(a: Graph, b: Graph) -> Graph:
    """SetDifference(A,B): entries of A whose pattern is not in B."""
    return ewise_mult(a, b, exclude=True)


def dense_matrix(
    spark, n_rows: int, n_cols: int, value: float = 0.0
) -> DataFrame:
    """DenseParMat analogue: a fully-populated (i, j, val) DataFrame
    (include/CombBLAS/DenseParMat.h).  Materialized as a cross of two
    ranges — at scale a dense matrix is better carried as a formula or
    a per-row array column, but the (i,j,val) form keeps every ewise
    op below join-compatible."""
    rows = spark.range(n_rows).select(F.col("id").alias("i"))
    cols = spark.range(n_cols).select(F.col("id").alias("j"))
    return rows.crossJoin(cols).select("i", "j", F.lit(float(value)).alias("val"))


def ewise_scale(
    g: Graph,
    dense: DataFrame,
    op: Callable[[Column, Column], Column] = lambda w, d: w * d,
) -> Graph:
    """EWiseScale(DenseParMat) (SpParMat.cpp:2824-2884): scale each
    nonzero A(i,j) by the dense matrix element D(i,j).

    ``dense``: (i, j, val).  Entries of A with no matching dense cell
    keep their value (the reference requires conformant shapes, so
    this only matters for sub-shaped dense inputs)."""
    d = dense.select(
        F.col("i").alias(SRC), F.col("j").alias(DST), F.col("val").alias("_dv")
    )
    scaled = (
        g.edges.join(d, [SRC, DST], "left")
        .select(
            SRC,
            DST,
            F.when(F.col("_dv").isNull(), F.col(W))
            .otherwise(op(F.col(W), F.col("_dv")))
            .alias(W),
        )
    )
    return replace(g, edges=scaled)


# -- vector ops -------------------------------------------------------------

def vec_apply(vec: DataFrame, unop, val_col: str = "val") -> DataFrame:
    return vec.withColumn(val_col, unop(F.col(val_col)))


def vec_apply_ind(vec: DataFrame, binop, val_col: str = "val") -> DataFrame:
    """ApplyInd: f(value, global_index) (FullyDistSpVec.h:264-289)."""
    return vec.withColumn(val_col, binop(F.col(val_col), F.col("v")))


def vec_ewise_apply(
    x: DataFrame,
    y: DataFrame,
    binop,
    how: str = "inner",
    x_null=None,
    y_null=None,
    val_col: str = "val",
) -> DataFrame:
    """EWiseApply on vectors with intersect ('inner') or union
    ('full_outer' + defaults) semantics (ParFriends.h:3285-3733)."""
    ya = y.select(F.col("v"), F.col(val_col).alias("_yv"))
    j = x.join(ya, "v", how)
    xv = F.coalesce(F.col(val_col), F.lit(x_null)) if x_null is not None else F.col(val_col)
    yv = F.coalesce(F.col("_yv"), F.lit(y_null)) if y_null is not None else F.col("_yv")
    return j.select("v", binop(xv, yv).alias(val_col))


def vec_setminus(x: DataFrame, y: DataFrame) -> DataFrame:
    """Setminus: drop x entries whose index appears in y
    (FullyDistSpVec.cpp:2400-2453)."""
    return x.join(y.select("v"), "v", "left_anti")


def vec_find(vec: DataFrame, pred, val_col: str = "val") -> DataFrame:
    """Find(pred) (FullyDistVec.h:203-216)."""
    return vec.filter(pred(F.col(val_col)))


def vec_select(
    x: DataFrame, companion: DataFrame, pred, val_col: str = "val"
) -> DataFrame:
    """FullyDistSpVec::Select (FullyDistSpVec.h:96-103): keep sparse
    entries of ``x`` whose index has a companion (dense) value
    satisfying ``pred``.  ``companion``: (v, val)."""
    c = companion.select("v", F.col(val_col).alias("_cv"))
    return (
        x.join(c, "v", "inner")
        .filter(pred(F.col("_cv")))
        .select("v", val_col)
    )


def vec_select_apply(
    x: DataFrame, companion: DataFrame, pred, binop, val_col: str = "val"
) -> DataFrame:
    """SelectApply (FullyDistSpVec.h:104-111): like ``vec_select`` but
    the kept entries are rewritten as binop(x_val, companion_val)."""
    c = companion.select("v", F.col(val_col).alias("_cv"))
    return (
        x.join(c, "v", "inner")
        .filter(pred(F.col("_cv")))
        .select("v", binop(F.col(val_col), F.col("_cv")).alias(val_col))
    )


def vec_filter_by_val(
    x: DataFrame, selector: DataFrame, keep_present: bool = True,
    val_col: str = "val",
) -> DataFrame:
    """FilterByVal (FullyDistSpVec.cpp:2454-2590): keep x entries whose
    VALUE appears as a value of the selector vector (or doesn't, with
    ``keep_present=False``)."""
    sel = selector.select(F.col(val_col).alias("_sv")).distinct()
    how = "left_semi" if keep_present else "left_anti"
    return x.join(sel, x[val_col] == sel["_sv"], how)


def vec_count(vec: DataFrame, pred, val_col: str = "val") -> int:
    return vec.filter(pred(F.col(val_col))).count()
