"""MatrixMarket / text edge-list I/O tests (ParallelReadMM /
ParallelWriteMM / SaveGathered / ReadGeneralizedTuples parity).

The reference's own test inputs are loaded FROM DISK and checked
against the in-repo transcriptions (sources/fixtures.py) — the same
fixtures every ReleaseTest consumes (CC.cpp:142 ParallelReadMM)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from combblas_spark.sources import fixtures as FX
from combblas_spark.sources.matrixmarket import (
    read_labeled_edge_list,
    read_matrix_market,
    read_vector,
    write_matrix_market,
    write_vector,
)

REF = "/root/reference/ReleaseTests"


def edges_set(g):
    return {(r["src"], r["dst"], r["w"]) for r in g.edges.collect()}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_read_small_nonsym_headerless(spark):
    """small_nonsym.mtx has no %%MatrixMarket banner — dims line first."""
    mm = read_matrix_market(spark, f"{REF}/small_nonsym.mtx", n_partitions=4)
    assert (mm.nrows, mm.ncols, mm.nnz) == (9, 9, 19)
    assert not mm.symmetric
    assert edges_set(mm.graph) == set(FX.NINE)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_read_sevenvertex_mtx(spark):
    mm = read_matrix_market(spark, f"{REF}/sevenvertex.mtx", n_partitions=4)
    assert (mm.nrows, mm.ncols, mm.nnz) == (7, 7, 12)
    got = edges_set(mm.graph)
    assert len(got) == 12
    # same weight multiset as the labeled-text form of the same graph
    assert sorted(w for _, _, w in got) == sorted(w for _, _, w in FX.SEVEN)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_read_labeled_edge_list_matches_fixture(spark):
    """sevenvertexgraph.txt via the distributed dictionary == the
    transcribed SEVEN fixture (vertex_k sorts to id k-1)."""
    g, d = read_labeled_edge_list(spark, f"{REF}/sevenvertexgraph.txt")
    labels = {r["label"]: r["id"] for r in d.collect()}
    assert labels == {f"vertex_{k}": k - 1 for k in range(1, 8)}
    assert edges_set(g) == set(FX.SEVEN)


@pytest.mark.parametrize("gathered", [True, False])
def test_matrix_market_roundtrip(spark, tmp_path, gathered):
    g = FX.graph(spark, FX.SEVEN, n_partitions=4)
    path = str(tmp_path / ("gathered" if gathered else "sharded"))
    write_matrix_market(g, path, gathered=gathered, comment="roundtrip test")
    mm = read_matrix_market(spark, path, n_partitions=4)
    assert edges_set(mm.graph) == set(FX.SEVEN)
    assert (mm.nrows, mm.ncols, mm.nnz) == (7, 7, 12)


def test_symmetric_mtx_mirrors(spark, tmp_path):
    p = tmp_path / "sym.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% lower triangle only\n"
        "3 3 3\n"
        "2 1 5.0\n"
        "3 1 6.0\n"
        "2 2 7.0\n"
    )
    mm = read_matrix_market(spark, str(p), n_partitions=2)
    assert mm.symmetric
    assert edges_set(mm.graph) == {
        (1, 0, 5.0), (0, 1, 5.0), (2, 0, 6.0), (0, 2, 6.0), (1, 1, 7.0),
    }


def test_pattern_mtx_unit_weights(spark, tmp_path):
    p = tmp_path / "pat.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 2 2\n"
        "1 2\n"
        "2 1\n"
    )
    mm = read_matrix_market(spark, str(p), n_partitions=2)
    assert mm.pattern
    assert edges_set(mm.graph) == {(0, 1, 1.0), (1, 0, 1.0)}


def test_read_scheme_qualified_uri(spark, tmp_path):
    """The header scan goes through the Hadoop FileSystem API +
    spark.read.text, so a scheme-qualified URI (the object-store shape
    — here `file:` as the test double for s3a:/hdfs:) works for both a
    single file and a sharded directory; no local open()/glob."""
    g = FX.graph(spark, FX.SEVEN, n_partitions=4)
    path = str(tmp_path / "sharded_uri")
    write_matrix_market(g, path, gathered=False)
    mm = read_matrix_market(spark, f"file://{path}", n_partitions=4)
    assert edges_set(mm.graph) == set(FX.SEVEN)
    assert (mm.nrows, mm.ncols, mm.nnz) == (7, 7, 12)

    single = tmp_path / "one.mtx"
    single.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 1\n"
        "1 2 3.5\n"
    )
    mm1 = read_matrix_market(spark, f"file://{single}", n_partitions=2)
    assert edges_set(mm1.graph) == {(0, 1, 3.5)}


def test_vector_roundtrip(spark, tmp_path):
    vec = spark.createDataFrame(
        [(0, 1.5), (3, -2.0), (7, 0.25)], "v long, val double"
    )
    path = str(tmp_path / "vec")
    write_vector(vec, path, gathered=True)
    back = read_vector(spark, path)
    assert {(r["v"], r["val"]) for r in back.collect()} == {
        (0, 1.5), (3, -2.0), (7, 0.25)
    }


def test_binary_write_read_roundtrip(spark, tmp_path):
    """ParallelBinaryWrite analogue (SpParMat.cpp:620-700): sharded and
    gathered round trips; the gathered file is byte-compatible with the
    reference layout (HKDT magic, 6x uint64 header, 1-based i64/i64/f64
    records)."""
    import struct

    import numpy as np

    from combblas_spark.sources import fixtures as FX
    from combblas_spark.sources.binaryio import read_binary, write_binary

    triples = [(0, 1, 2.5), (3, 0, -1.0), (2, 2, 7.0), (1, 3, 0.5)]
    g = FX.graph(spark, triples, n_partitions=3)

    sharded = str(tmp_path / "bin_sharded")
    write_binary(g, sharded)
    back = read_binary(spark, sharded, n_partitions=2)
    assert (back.nrows, back.ncols, back.nnz) == (4, 4, 4)
    assert {
        (r["src"], r["dst"], r["w"]) for r in back.graph.edges.collect()
    } == set(triples)

    single = str(tmp_path / "one.bin")
    write_binary(g, single, gathered=True)
    back1 = read_binary(spark, single, n_partitions=2)
    assert {
        (r["src"], r["dst"], r["w"]) for r in back1.graph.edges.collect()
    } == set(triples)

    # byte-layout parity with the reference writer
    raw = open(single, "rb").read()
    assert raw[:4] == b"HKDT"
    ver, osize, fmt, m, n, nnz = struct.unpack("<6Q", raw[4:52])
    assert (ver, osize, fmt, m, n, nnz) == (2, 8, 0, 4, 4, 4)
    rec = np.frombuffer(raw[52:], dtype=[("r", "<i8"), ("c", "<i8"), ("v", "<f8")])
    assert len(rec) == 4
    assert {(int(r) - 1, int(c) - 1, float(v)) for r, c, v in rec} == set(triples)


def test_binary_read_magic_colliding_data_shard(spark, tmp_path):
    """A data-only shard whose FIRST RECORD's row int64 byte-matches the
    'HKDT' magic must still parse as records (header stripping is tied
    to the designated header file, never byte-sniffed per shard)."""
    import struct

    from combblas_spark.sources.binaryio import (
        _HEADER_SIZE,
        _MAGIC,
        read_binary,
    )

    # 1-based row whose little-endian low bytes are exactly b"HKDT"
    evil_row = int.from_bytes(_MAGIC, "little")  # 0x54444B48
    d = tmp_path / "bin_evil"
    d.mkdir()
    header = _MAGIC + struct.pack("<6Q", 2, 8, 0, evil_row, evil_row, 2)
    (d / "part-00000-header.bin").write_bytes(header)
    rec = struct.pack("<qqd", evil_row, 7, 3.25) + struct.pack(
        "<qqd", 2, 3, -1.5
    )
    (d / "part-00001.bin").write_bytes(rec)

    back = read_binary(spark, str(d), n_partitions=2)
    assert back.nnz == 2 and back.nrows == evil_row
    got = {(r["src"], r["dst"], r["w"]) for r in back.graph.edges.collect()}
    assert got == {(evil_row - 1, 6, 3.25), (1, 2, -1.5)}
    assert len(header) == _HEADER_SIZE


def test_binary_write_explicit_dims(spark, tmp_path):
    """Rectangular / trailing-empty-row matrices keep their true header
    dims when the caller passes nrows/ncols (the reference stores the
    real dimensions, not max-index bounds)."""
    from combblas_spark.sources import fixtures as FX
    from combblas_spark.sources.binaryio import read_binary, write_binary

    g = FX.graph(spark, [(0, 1, 1.0), (2, 0, 2.0)], n_partitions=2)
    single = str(tmp_path / "rect.bin")
    write_binary(g, single, gathered=True, nrows=10, ncols=5)
    back = read_binary(spark, single, n_partitions=2)
    assert (back.nrows, back.ncols, back.nnz) == (10, 5, 2)
