"""MatrixMarket / text edge-list readers and writers (SURVEY.md §2.1).

Reference surface being matched (semantics, not implementation):

* ``SpParMat::ParallelReadMM``  (SpParMat.cpp:3987-4126) — every rank
  parses a byte range of one Matrix Market file.  Spark analogue:
  ``spark.read.text`` splits the file(s) into partitions and the parse
  is pure Column expressions; the only driver-side work is two scalar
  collects (the header line and the dims line).
* ``SpParMat::ParallelWriteMM`` (SpParMat.cpp:4127-4217) — parallel
  writer.  Spark analogue: a part-file directory (header part named to
  sort first) — the shared-filesystem byte-offset trick MPI-IO uses
  has no object-store equivalent, a sharded dir is the cloud-native
  form.
* ``SaveGathered`` (SpParMat.cpp:3597-3712) — gather-to-one writer ↦
  ``coalesce(1)`` single part.
* ``ReadGeneralizedTuples`` (SpParMat.cpp:3886-3983) — string-labeled
  tuple files (e.g. ReleaseTests/sevenvertexgraph.txt): the file
  reader here feeds sources/dictionary.build_dictionary for the
  label→id map.
* ``FullyDistVec/SpVec::ParallelRead/ParallelWrite``
  (FullyDistSpVec.cpp:1209-1400) — (index, value) vector files.

Format notes: MM headers ``%%MatrixMarket matrix coordinate
real|integer|pattern general|symmetric``; ``%`` comment lines; a dims
line ``m n nnz``; 1-based indices; ``pattern`` files carry no value
column (weight 1.0); ``symmetric`` files store the lower triangle and
imply the mirrored entries.  Headerless files starting directly at the
dims line (e.g. ReleaseTests/small_nonsym.mtx) are accepted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, W, Graph


#: sequential header probes before the one-job distributed head scan
_HEADER_SCAN_CAP = 8


@dataclass
class MatrixMarketFile:
    graph: Graph
    nrows: int
    ncols: int
    nnz: int            # nnz as declared in the file (pre-mirror)
    symmetric: bool
    pattern: bool


def _list_candidates(spark: SparkSession, path: str) -> list[str]:
    """List header-candidate files under ``path`` through the Hadoop
    FileSystem API, so any filesystem Spark itself can read (file:,
    hdfs:, s3a:, ...) works — no local-FS ``glob``/``os.path``
    assumption.  Success/CRC side-files (``_``/``.`` prefixes) are
    skipped, matching what ``spark.read.text`` will scan."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    status = fs.getFileStatus(jpath)
    if status.isFile():
        return [status.getPath().toString()]
    names = []
    for s in fs.listStatus(jpath):
        if s.isFile() and not s.getPath().getName().startswith(("_", ".")):
            names.append(s.getPath().toString())
    return sorted(names)


def _scan_header(
    spark: SparkSession, path: str
) -> tuple[str, list[str], tuple[int, int, int]]:
    """Header scan: find the file whose head carries the (optional)
    ``%%MatrixMarket`` banner and the dims line.

    O(header lines) driver work — the reference's ParallelReadMM
    likewise has every rank fseek/parse the header region before the
    distributed byte-range parse (SpParMat.cpp:3987-4126).  The head of
    each candidate is fetched with ``spark.read.text(...).limit(...)``
    (CollectLimit reads only the leading split), so an object-store URI
    works the same as a local path and the bulk data is never pulled
    driver-side.

    The sequential per-file scan is CAPPED at the first few candidates
    (the writer puts the header in the lexicographically-first part, and
    single-file inputs hit immediately); a sharded directory whose
    leading shards are all data-first falls back to ONE distributed job
    that fetches every file's head lines at once — O(files) Spark jobs
    never happens.
    """
    import posixpath

    candidates = _list_candidates(spark, path)
    # (banner_line | None, first_non_comment_line | None) per basename
    scanned: dict[str, tuple[str | None, str | None]] = {}
    for fname in candidates[:_HEADER_SCAN_CAP]:
        banner, first = None, None
        for row in spark.read.text(fname).limit(10_000).collect():
            s = row["value"].strip()
            if not s:
                continue
            if s.startswith("%%MatrixMarket"):
                banner = banner or s
                continue
            if s.startswith("%"):
                continue
            first = s
            break
        scanned[posixpath.basename(fname)] = (banner, first)
    if len(candidates) > _HEADER_SCAN_CAP:
        # ONE distributed job over all remaining candidates: keep only
        # banner lines and non-comment lines, then a map-side-combined
        # min-per-file aggregate yields each file's banner + first
        # non-comment line (monotonically_increasing_id orders rows
        # within each file's leading split, where both lines live)
        rest = candidates[_HEADER_SCAN_CAP:]
        v = F.trim("value")
        lines = (
            spark.read.text(rest)
            .select(
                F.input_file_name().alias("_f"),
                F.monotonically_increasing_id().alias("_mid"),
                v.alias("v"),
            )
            .filter(v != "")
            .withColumn("_banner", F.col("v").startswith("%%MatrixMarket"))
            .filter(F.col("_banner") | ~F.col("v").startswith("%"))
        )
        agg = (
            lines.groupBy("_f")
            .agg(
                F.min(F.when(F.col("_banner"), F.struct("_mid", "v"))).alias("_b"),
                F.min(F.when(~F.col("_banner"), F.struct("_mid", "v"))).alias("_d"),
            )
            .collect()
        )
        for r in agg:
            scanned[posixpath.basename(r["_f"])] = (
                r["_b"]["v"] if r["_b"] is not None else None,
                r["_d"]["v"] if r["_d"] is not None else None,
            )
    for fname in candidates:
        banner, first = scanned.get(posixpath.basename(fname), (None, None))
        banner_toks = banner.lower().split() if banner else []
        if first is None:
            continue
        parts = first.split()
        try:
            m, n, nnz = int(parts[0]), int(parts[1]), int(parts[2])
        except (ValueError, IndexError):
            continue  # data-first file; try next candidate
        return fname, banner_toks, (m, n, nnz)
    raise ValueError(f"no MatrixMarket dims line found under {path}")


def read_matrix_market(
    spark: SparkSession,
    path: str,
    n_partitions: int = 32,
    sum_duplicates: bool = True,
) -> MatrixMarketFile:
    """Parse a Matrix Market file (or a part-file directory written by
    ``write_matrix_market``) into a 0-indexed Graph.

    The header (banner flags + dims) is scanned driver-side in O(header
    bytes); the bulk parse — comment filtering, field splitting, casts,
    symmetric mirroring — is pure Column expressions over the
    distributed text scan.  The dims line is excluded exactly: it is
    the minimum-row-id non-comment line *within the header-carrying
    file* (Spark packs file partitions by size, so a global row-id
    minimum would be wrong for sharded inputs).
    """
    import posixpath

    hdr_file, banner_toks, (m, n, nnz) = _scan_header(spark, path)
    symmetric = "symmetric" in banner_toks
    pattern = "pattern" in banner_toks

    lines = (
        spark.read.text(path)
        .select(
            F.trim(F.col("value")).alias("value"),
            F.monotonically_increasing_id().alias("_mid"),
            F.input_file_name().alias("_f"),
        )
        .filter(F.col("value") != "")
    )
    data = lines.filter(~F.col("value").startswith("%"))
    hdr_base = posixpath.basename(hdr_file)
    # exact dims-line exclusion: one content-matching line within the
    # header file (any _mid tie is content-identical, hence
    # interchangeable — partition packing order cannot matter)
    dims_pat = rf"^{m}\s+{n}\s+{nnz}$"
    in_hdr_file = F.element_at(F.split(F.col("_f"), "/"), -1) == hdr_base
    dims_mid = (
        data.filter(in_hdr_file & F.col("value").rlike(dims_pat))
        .agg(F.min("_mid").alias("m"))
        .collect()[0]["m"]
    )

    fields = F.split(F.col("value"), r"\s+")
    parsed = (
        data.filter(F.col("_mid") != dims_mid)
        .select(
            (F.element_at(fields, 1).cast("long") - 1).alias(SRC),
            (F.element_at(fields, 2).cast("long") - 1).alias(DST),
            (
                F.lit(1.0)
                if pattern
                else F.coalesce(
                    F.element_at(fields, 3).cast("double"), F.lit(1.0)
                )
            ).alias(W),
        )
    )
    if symmetric:
        mirrored = parsed.filter(F.col(SRC) != F.col(DST)).select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(W)
        )
        parsed = parsed.unionByName(mirrored)
    g = Graph.from_edge_list(
        parsed, w=W, sum_duplicates=sum_duplicates, n_partitions=n_partitions
    )
    lines.unpersist()
    return MatrixMarketFile(
        graph=g, nrows=m, ncols=n, nnz=nnz, symmetric=symmetric, pattern=pattern
    )


def write_matrix_market(
    g: Graph,
    path: str,
    gathered: bool = False,
    pattern: bool = False,
    nrows: int | None = None,
    ncols: int | None = None,
    comment: str | None = None,
) -> None:
    """Write a Graph as Matrix Market (1-based coordinate format).

    ``gathered=True`` → one part file (SaveGathered); otherwise the
    parallel form: every shuffle partition writes its own part and the
    header rides in a part named to sort first (ParallelWriteMM's
    byte-offset single file has no object-store analogue — a sharded
    directory is what a 100 TB matrix needs anyway).
    """
    spark = g.edges.sparkSession
    stats = g.edges.agg(
        F.max(SRC).alias("ms"), F.max(DST).alias("md"), F.count("*").alias("nnz")
    ).collect()[0]
    m = nrows if nrows is not None else int(stats["ms"] or -1) + 1
    n = ncols if ncols is not None else int(stats["md"] or -1) + 1
    nnz = int(stats["nnz"])

    field = "pattern" if pattern else "real"
    head = [f"%%MatrixMarket matrix coordinate {field} general"]
    if comment:
        head += [f"% {line}" for line in comment.splitlines()]
    head.append(f"{m} {n} {nnz}")

    if pattern:
        line = F.concat_ws(" ", F.col(SRC) + 1, F.col(DST) + 1)
    else:
        line = F.concat_ws(" ", F.col(SRC) + 1, F.col(DST) + 1, F.col(W))
    if gathered:
        # distinct increasing keys keep the header lines in order even
        # though Spark's sort is not stable (banner must precede dims)
        hdr = spark.createDataFrame(
            list(enumerate(head)), "k long, value string"
        )
        body = g.edges.select(F.lit(len(head)).alias("k"), line.alias("value"))
        (
            hdr.unionByName(body)
            .coalesce(1)
            .sortWithinPartitions("k")
            .select("value")
            .write.mode("overwrite")
            .text(path)
        )
    else:
        g.edges.select(line.alias("value")).write.mode("overwrite").text(path)
        # header part named to list (and therefore parse) first; written
        # through the Hadoop FileSystem API so object-store URIs work
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path + "/00000-header.mtx")
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(jpath, True)
        out.write(bytearray(("\n".join(head) + "\n").encode("utf-8")))
        out.close()


# ---------------------------------------------------------------------------
# labeled text edge lists (ReadGeneralizedTuples file path)
# ---------------------------------------------------------------------------

def read_labeled_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    n_partitions: int = 32,
):
    """Read a string-labeled edge-list file (src_label, dst_label
    [, weight] per line — ReleaseTests/sevenvertexgraph.txt shape),
    build the distributed label→id dictionary and relabel.

    Returns (Graph, dictionary DataFrame (label, id)) — the Spark form
    of ReadGeneralizedTuples' (matrix, FullyDistVec<...,string>) pair.
    Ids are dense 0..n-1 in label sort order (deterministic at any
    parallelism; no single-partition step — see sources/dictionary.py).
    """
    from .dictionary import build_dictionary

    fields = F.split(F.col("value"), sep)
    links = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .filter(~F.col("value").startswith("%"))
        .select(
            F.element_at(fields, 1).alias("src_label"),
            F.element_at(fields, 2).alias("dst_label"),
            F.coalesce(F.element_at(fields, 3).cast("double"), F.lit(1.0)).alias(
                "_w"
            ),
        )
    )
    labels = links.select(F.col("src_label").alias("label")).unionByName(
        links.select(F.col("dst_label").alias("label"))
    )
    dictionary = build_dictionary(labels).cache()
    edges = (
        links.join(
            dictionary.select(
                F.col("label").alias("src_label"), F.col("id").alias(SRC)
            ),
            "src_label",
        )
        .join(
            dictionary.select(
                F.col("label").alias("dst_label"), F.col("id").alias(DST)
            ),
            "dst_label",
        )
        .select(SRC, DST, F.col("_w").alias(W))
    )
    g = Graph.from_edge_list(edges, w=W, n_partitions=n_partitions)
    return g, dictionary


# ---------------------------------------------------------------------------
# vector I/O (FullyDistVec/SpVec ParallelRead / ParallelWrite)
# ---------------------------------------------------------------------------

def read_vector(
    spark: SparkSession,
    path: str,
    one_based: bool = True,
    val_type: str = "double",
) -> DataFrame:
    """(index, value) text file → (v, val) DataFrame
    (FullyDistSpVec::ParallelRead, FullyDistSpVec.cpp:1209-1309)."""
    fields = F.split(F.trim(F.col("value")), r"\s+")
    off = 1 if one_based else 0
    return (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .filter(~F.col("value").startswith("%"))
        .select(
            (F.element_at(fields, 1).cast("long") - off).alias("v"),
            F.element_at(fields, 2).cast(val_type).alias("val"),
        )
    )


def write_vector(
    vec: DataFrame,
    path: str,
    one_based: bool = True,
    val_col: str = "val",
    gathered: bool = False,
) -> None:
    """(v, val) → '<index> <value>' lines
    (FullyDistSpVec::ParallelWrite, FullyDistSpVec.cpp:1310-1400)."""
    off = 1 if one_based else 0
    out = vec.select(
        F.concat_ws(" ", F.col("v") + off, F.col(val_col)).alias("value")
    )
    if gathered:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)
