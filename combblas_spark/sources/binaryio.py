"""CombBLAS binary matrix I/O (ParallelBinaryWrite / binary read).

Reference format (SpParMat.cpp:620-700 ``ParallelBinaryWrite``; read
path :4335,4458 ``ReadAllMine``): magic ``"HKDT"`` + six little-endian
uint64 header words (version=2, sizeof(value)=8, format=0 binary,
nrows, ncols, nnz), then nnz records of (int64 row, int64 col,
float64 value), **1-based**, native-endian, written cooperatively into
ONE file via MPI-IO byte offsets.

Spark analogue: every executor partition writes its own
``part-NNNNN.bin`` records file through an Arrow-batched numpy encode
(no per-row Python), and the 52-byte header rides in a part named to
sort first — the same sharded-directory convention as
``write_matrix_market``, because the byte-offset single-file trick
requires MPI-IO's shared-file view.  ``gathered=True`` coalesces to
one partition and emits a SINGLE file byte-compatible with the
reference layout (header + records).  Like the reference's MPI-IO,
the writer targets a POSIX(-like) shared filesystem; for object
stores the documented cloud-native carrier is parquet
(``Graph.edges.write.parquet``).

The reader accepts both layouts via Spark's ``binaryFile`` source +
vectorized ``np.frombuffer`` decode, validates the header, and returns
0-based edges.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from urllib.parse import unquote, urlparse

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph

_MAGIC = b"HKDT"
_HEADER_SIZE = 52
_REC_DTYPE = np.dtype([("r", "<i8"), ("c", "<i8"), ("v", "<f8")])


@dataclass
class BinaryMatrixFile:
    graph: Graph
    nrows: int
    ncols: int
    nnz: int


def _header_bytes(m: int, n: int, nnz: int) -> bytes:
    return _MAGIC + struct.pack("<6Q", 2, 8, 0, m, n, nnz)


def write_binary(
    g: Graph,
    path: str,
    gathered: bool = False,
    nrows: int | None = None,
    ncols: int | None = None,
) -> None:
    """ParallelBinaryWrite analogue: header + 1-based (i64, i64, f64)
    records.  Sharded part dir by default; ``gathered=True`` emits one
    reference-layout file at ``path``.

    ``nrows``/``ncols`` are the true matrix dimensions, stored in the
    header exactly as the reference does; when omitted they are
    inferred as square ``max(src, dst) + 1`` — which under-reports
    rectangular matrices or trailing empty rows/columns, so callers
    holding the real dims should pass them."""
    edges = g.edges.select(
        (F.col(SRC) + 1).alias("r"),
        (F.col(DST) + 1).alias("c"),
        F.col(W).cast("double").alias("v"),
    )
    stats = g.edges.agg(
        (F.max(F.greatest(SRC, DST)) + 1).alias("mx"),
        F.count("*").alias("nnz"),
    ).collect()[0]
    inferred = int(stats["mx"] or 0)
    m = int(nrows) if nrows is not None else inferred
    n = int(ncols) if ncols is not None else inferred
    nnz = int(stats["nnz"])
    header = _header_bytes(m, n, nnz)

    if gathered:
        rows = edges.coalesce(1)

        def dump_one(batches):
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            with open(path, "wb") as f:
                f.write(header)
                for b in batches:
                    rec = np.empty(len(b), dtype=_REC_DTYPE)
                    rec["r"] = b["r"].to_numpy()
                    rec["c"] = b["c"].to_numpy()
                    rec["v"] = b["v"].to_numpy()
                    f.write(rec.tobytes())
            yield pd.DataFrame({"written": [1]})

        rows.mapInPandas(dump_one, "written int").collect()
        return

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000-header.bin"), "wb") as f:
        f.write(header)

    tagged = edges.withColumn("_pid", F.spark_partition_id())

    def dump(batches):
        f = None
        try:
            for b in batches:
                if len(b) == 0:
                    continue
                if f is None:
                    pid = int(b["_pid"].iloc[0])
                    f = open(
                        os.path.join(path, f"part-{pid + 1:05d}.bin"), "wb"
                    )
                rec = np.empty(len(b), dtype=_REC_DTYPE)
                rec["r"] = b["r"].to_numpy()
                rec["c"] = b["c"].to_numpy()
                rec["v"] = b["v"].to_numpy()
                f.write(rec.tobytes())
        finally:
            if f is not None:
                f.close()
        yield pd.DataFrame({"written": [1]})

    tagged.mapInPandas(dump, "written int").collect()


def _local_path(uri: str) -> str:
    """file:-URI (or bare path) → filesystem path, via urllib — a bare
    ``str.replace('file:', '')`` would mangle any path that merely
    CONTAINS that substring."""
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        return unquote(parsed.path) or uri
    raise ValueError(f"driver-side header read needs a local path, got {uri}")


def read_binary(
    spark: SparkSession, path: str, n_partitions: int = 32
) -> BinaryMatrixFile:
    """Read a ``write_binary`` dir or a single reference-layout file:
    header validated, records decoded Arrow-batched via numpy, edges
    returned 0-based.

    The header is stripped ONLY from the designated header file — the
    ``*-header.bin`` part in the sharded layout, else the path-sorted
    first file (the gathered single-file layout) — never by sniffing
    each shard's leading bytes: a data-only part whose first record's
    row int64 happens to start with the magic must parse as records."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.bin") if os.path.isdir(path) else path
    ).select("path", "content")

    paths = sorted(r["path"] for r in files.select("path").collect())
    if not paths:
        raise ValueError(f"no files found under {path}")
    named = [p for p in paths if p.endswith("-header.bin")]
    header_uri = named[0] if named else paths[0]

    with open(_local_path(header_uri), "rb") as f:
        head = f.read(_HEADER_SIZE)
    if head[:4] != _MAGIC:
        raise ValueError(f"no HKDT header found at {header_uri}")
    ver, osize, fmt, m, n, nnz = struct.unpack("<6Q", head[4:_HEADER_SIZE])
    if ver != 2 or osize != 8 or fmt != 0:
        raise ValueError(
            f"unsupported HKDT header (ver={ver} osize={osize} fmt={fmt})"
        )
    m, n, nnz = int(m), int(n), int(nnz)

    def decode(batches):
        for b in batches:
            for uri, raw in zip(b["path"], b["content"]):
                buf = bytes(raw)
                if uri == header_uri:
                    buf = buf[_HEADER_SIZE:]
                rec = np.frombuffer(buf, dtype=_REC_DTYPE)
                yield pd.DataFrame(
                    {
                        SRC: rec["r"] - 1,
                        DST: rec["c"] - 1,
                        W: rec["v"],
                    }
                )

    edges = files.mapInPandas(decode, f"{SRC} long, {DST} long, {W} double")
    g = Graph(
        edges=edges.repartition(n_partitions, SRC).cache(),
        n_partitions=n_partitions,
    )
    return BinaryMatrixFile(graph=g, nrows=m, ncols=n, nnz=nnz)
