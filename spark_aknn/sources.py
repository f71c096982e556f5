"""Reference-format point-file sources and sinks.

The reference consumes two on-disk point formats
(/root/reference/PlaneSweepParallel/include/AllKnnProblem.h:158-185):

  * text  — one `id x y` row per line, whitespace-separated (parsed
    with istream >>; the generator/multiplier write tab-separated with
    fixed 8- or 10-digit precision, DatasetMultiplier/main.cpp:134-137)
  * binary — an 8-byte point-count header followed by packed
    {int64 id, float64 x, float64 y} structs, 24 bytes each,
    little-endian (writer DatasetGenerator/main.cpp:35-44; every
    run_bindata*.cmd consumes these). We implement the LP64 layout
    (8-byte id); the reference's Windows builds use a 4-byte long +
    4 bytes padding at the same 24-byte stride — pass id_dtype='<i4'
    for files written by those builds.

Scale design: the binary reader is SPLIT-PARALLEL — the driver reads
only the 8-byte header, computes row-aligned (start, count) chunks, and
each executor reads its own slice (seek + frombuffer, zero row-at-a-time
Python). The path must be executor-visible (local mode, NFS, or a
fuse-mounted object store); for cloud object storage convert once to
parquet with write_points_parquet. The text reader is spark.read.text +
JVM split, fully distributed under any Hadoop-compatible filesystem.

Writers exist for golden-file parity and test round-trips (single file,
driver-side stream over toLocalIterator — small-scale artifacts by
design, like the reference-format result sink)."""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINT_SCHEMA = "id long, x double, y double"
_STRIDE = 24  # sizeof(Point): 8 id + 8 x + 8 y (LP64)


def read_points_text(spark: SparkSession, path: str) -> DataFrame:
    """`id x y` lines, any whitespace separator (istream >> semantics).
    Distributed text scan + JVM split/cast; blank lines ignored."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.filter(F.trim(F.col("value")) != "")
        .select(
            F.element_at(parts, 1).cast("long").alias("id"),
            F.element_at(parts, 2).cast("double").alias("x"),
            F.element_at(parts, 3).cast("double").alias("y"),
        )
    )


def read_points_bin(
    spark: SparkSession,
    path: str,
    rows_per_split: int = 2_000_000,
    id_dtype: str = "<i8",
) -> DataFrame:
    """Count-prefixed packed binary (AllKnnProblem.h LoadBinaryFile).

    The driver reads the header only; (start_row, n_rows) split rows are
    distributed and each task seeks into its own byte range — the same
    chunking a parquet scan performs, so a 100 GB .bin file fans out
    across the cluster instead of serializing through the driver."""
    with open(path, "rb") as f:
        (n_points,) = struct.unpack("<Q", f.read(8))
    file_rows = (os.path.getsize(path) - 8) // _STRIDE
    n_points = min(n_points, file_rows)  # header may overstate (eof guard)
    splits = [
        (s, min(rows_per_split, n_points - s))
        for s in range(0, n_points, rows_per_split)
    ] or [(0, 0)]
    dt = np.dtype([("id", id_dtype), ("x", "<f8"), ("y", "<f8")])
    pad = _STRIDE - dt.itemsize
    if pad:  # 4-byte id layout: trailing struct padding
        dt = np.dtype({"names": ["id", "x", "y"], "formats": [id_dtype, "<f8", "<f8"],
                       "offsets": [0, 8, 16], "itemsize": _STRIDE})

    def read_chunk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start, cnt in zip(pdf["start"], pdf["cnt"]):
                if cnt <= 0:
                    continue
                with open(path, "rb") as f:
                    f.seek(8 + int(start) * _STRIDE)
                    buf = f.read(int(cnt) * _STRIDE)
                arr = np.frombuffer(buf, dtype=dt, count=int(cnt))
                yield pd.DataFrame(
                    {
                        "id": arr["id"].astype(np.int64),
                        "x": arr["x"],
                        "y": arr["y"],
                    }
                )

    sdf = spark.createDataFrame(splits, "start long, cnt long").repartition(
        max(1, len(splits))
    )
    return sdf.mapInPandas(read_chunk, _POINT_SCHEMA)


def read_points_any(spark: SparkSession, path: str) -> DataFrame:
    """Format dispatch by extension, like the reference's endsWith('.bin')
    check (AllKnnProblem.h:139-147)."""
    if path.endswith(".bin"):
        return read_points_bin(spark, path)
    if path.endswith((".txt", ".text", ".tsv")):
        return read_points_text(spark, path)
    return spark.read.parquet(path)


def write_points_text(df: DataFrame, path: str, precision: int = 8) -> int:
    """Reference text twin: tab-separated, fixed precision (the
    multiplier's std::fixed << setprecision(8), main.cpp:136). Driver
    stream — golden/test artifact."""
    n = 0
    with open(path, "w") as f:
        for row in df.select("id", "x", "y").orderBy("id").toLocalIterator():
            f.write(f"{row['id']}\t{row['x']:.{precision}f}\t{row['y']:.{precision}f}\n")
            n += 1
    return n


def write_points_any(df: DataFrame, path: str, precision: int = 8) -> int:
    """Sink-side extension dispatch, the reference's isBinaryTarget
    check (DatasetMultiplier/main.cpp:125-137): `.bin` -> count-headered
    packed binary, anything else -> fixed-precision text. Parquet is
    deliberately NOT reachable here — this mirrors the reference
    converter's two-format surface; use df.write.parquet for the scale
    path."""
    if path.endswith(".bin"):
        return write_points_bin(df, path)
    return write_points_text(df, path, precision=precision)


def write_points_bin(df: DataFrame, path: str) -> int:
    """Reference binary twin (count header + packed structs,
    DatasetGenerator/main.cpp:35-44). Driver stream — golden/test
    artifact; large outputs should stay parquet."""
    rows = df.select("id", "x", "y").orderBy("id").toPandas()
    arr = np.empty(len(rows), dtype=[("id", "<i8"), ("x", "<f8"), ("y", "<f8")])
    arr["id"] = rows["id"].to_numpy()
    arr["x"] = rows["x"].to_numpy()
    arr["y"] = rows["y"].to_numpy()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(arr)))
        f.write(arr.tobytes())
    return len(arr)
