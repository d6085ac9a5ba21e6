"""combblas_spark — a PySpark-native graph-as-sparse-matrix analytics engine.

A from-scratch reimplementation of the capabilities of CombBLAS
(reference studied read-only at /root/reference) on idiomatic Spark:
graphs are (src, dst, w) DataFrames, vertex vectors are (v, val)
DataFrames, and every semiring matrix product is a join + aggregation
optimized by Catalyst/AQE.
"""

from .graph import Graph, as_edges
from .functions.semiring import (
    Semiring,
    PLUS_TIMES,
    MIN_PLUS,
    SECOND_MIN,
    SECOND_MAX,
    SEMIRINGS,
)
from .session import get_spark

__all__ = [
    "Graph",
    "as_edges",
    "Semiring",
    "PLUS_TIMES",
    "MIN_PLUS",
    "SECOND_MIN",
    "SECOND_MAX",
    "SEMIRINGS",
    "get_spark",
]

__version__ = "0.1.0"
