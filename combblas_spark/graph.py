"""EdgeTable / Graph: the SpParMat analogue.

The reference stores the graph as a 2D block-distributed sparse matrix
(``SpParMat``, include/CombBLAS/SpParMat.h:67-74).  Here a graph IS an
``edges`` DataFrame ``(src: long, dst: long, w: double)``, hash-partitioned
on vertex id; per-vertex data lives in ``(v: long, val)`` DataFrames
(``FullyDistVec``, include/CombBLAS/FullyDistVec.h:60-62).  Spark's hash
shuffle partitioning is the owner function (SpParMat::Owner,
SpParMat.h:213-214), and co-partitioning both sides of the iterative
joins replaces the CommGrid row/column broadcast topology.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC, DST, W = "src", "dst", "w"


def as_edges(df: DataFrame, src: str = SRC, dst: str = DST, w: str | None = None) -> DataFrame:
    """Normalize an arbitrary 2-3 column DataFrame to (src, dst, w)."""
    cols = [F.col(src).cast("long").alias(SRC), F.col(dst).cast("long").alias(DST)]
    cols.append(F.col(w).cast("double").alias(W) if w else F.lit(1.0).alias(W))
    return df.select(*cols)


@dataclass
class Graph:
    """A distributed sparse matrix = (src, dst, w) edge DataFrame.

    ``n_partitions`` plays the role of the √p×√p grid: every shuffle of
    edges or vertex vectors in the iterative kernels uses this same
    partition count so exchanges line up stage to stage.
    """

    edges: DataFrame
    n_partitions: int = 32
    #: replication factor of a pre-salted ``_salt`` column (set by
    #: operators.spmv.salt_edges); consumers that must replicate the
    #: other join side (spmv_salted_join) read it instead of trusting
    #: their own default — a mismatch silently drops edges.
    salt_count: int | None = None

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_edge_list(
        cls,
        df: DataFrame,
        src: str = SRC,
        dst: str = DST,
        w: str | None = None,
        sum_duplicates: bool = True,
        remove_loops: bool = False,
        n_partitions: int = 32,
    ) -> "Graph":
        """Edge list → matrix, summing duplicates like the
        SpParMat(DistEdgeList) ctor (SpParMat.h:85-86, SparseCommon
        SpParMat.h:309-311)."""
        e = as_edges(df, src, dst, w)
        if remove_loops:
            e = e.filter(F.col(SRC) != F.col(DST))
        if sum_duplicates:
            e = e.groupBy(SRC, DST).agg(F.sum(W).alias(W))
        e = e.repartition(n_partitions, SRC)
        return cls(edges=e, n_partitions=n_partitions)

    # -- structural ops (§2.6) ------------------------------------------
    def transpose(self) -> "Graph":
        """Aᵀ (SpParMat.cpp:3535-3596) — a column rename, free in Spark."""
        return replace(
            self,
            edges=self.edges.select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(W)
            ),
        )

    def symmetrize(self) -> "Graph":
        """A += Aᵀ on pattern (undirected-ize, TopDownBFS.cpp:83-91).

        Keeps max weight on duplicate (i,j)/(j,i) pairs, pattern-stable.
        """
        both = self.edges.unionByName(self.transpose().edges)
        sym = both.groupBy(SRC, DST).agg(F.max(W).alias(W))
        return replace(self, edges=sym)

    def remove_loops(self) -> "Graph":
        """RemoveLoops (SpParMat.cpp:3264-3462 family)."""
        return replace(self, edges=self.edges.filter(F.col(SRC) != F.col(DST)))

    def add_loops(self, value: float = 1.0) -> "Graph":
        """AddLoops(val): ensure a diagonal entry for every vertex
        (MCL adds loops before normalization, MCL.cpp:462-470)."""
        verts = self.vertices()
        diag = verts.select(
            F.col("v").alias(SRC), F.col("v").alias(DST), F.lit(float(value)).alias(W)
        )
        merged = (
            self.edges.filter(F.col(SRC) != F.col(DST))
            .unionByName(diag)
        )
        return replace(self, edges=merged)

    def plus(self, other: "Graph") -> "Graph":
        """Matrix add: union-with-sum (SpParMat operator+=, SpParMat.h:93)."""
        merged = (
            self.edges.unionByName(other.edges)
            .groupBy(SRC, DST)
            .agg(F.sum(W).alias(W))
        )
        return replace(self, edges=merged)

    # -- vertex views ----------------------------------------------------
    def vertices(self) -> DataFrame:
        """Distinct vertex ids appearing as src or dst."""
        return (
            self.edges.select(F.col(SRC).alias("v"))
            .unionByName(self.edges.select(F.col(DST).alias("v")))
            .distinct()
        )

    def num_vertices(self) -> int:
        return self.vertices().count()

    def num_edges(self) -> int:
        return self.edges.count()

    def out_degrees(self) -> DataFrame:
        """Reduce(Row, plus) — degrees (SpParMat.cpp:888-1119; used at
        TopDownBFS.cpp:313).  Returns (v, deg: long)."""
        return self.edges.groupBy(F.col(SRC).alias("v")).agg(
            F.count("*").alias("deg")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col(DST).alias("v")).agg(
            F.count("*").alias("deg")
        )

    def drop_isolated(self, spark: SparkSession) -> tuple["Graph", DataFrame]:
        """SubsRef of non-isolated vertices (TopDownBFS.cpp:167):
        compact the vertex ID SPACE to dense 0..n'-1 over vertices that
        actually appear on an edge, and relabel the edges.

        In the edge-list model isolated vertices never appear in the
        data, but the id space can still be sparse (e.g. after heavy
        pruning) — the reference's A(nonisov, nonisov) exists to keep
        downstream dense-vector kernels sized to n', and this does the
        same.  Returns (graph', perm) where perm is (v=old_id,
        new_id=dense rank) — the permutation-matrix analogue, reusable
        for mapping results back.
        """
        from .operators.indexing import nziota, subsref

        perm = nziota(self.vertices()).select(
            "v", F.col("val").alias("new_id")
        )
        return subsref(self, perm), perm

    def cache(self) -> "Graph":
        return replace(self, edges=self.edges.cache())

    def local_checkpoint(self) -> "Graph":
        return replace(self, edges=self.edges.localCheckpoint(eager=True))
