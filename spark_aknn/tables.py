"""Synthetic image+caption corpus — the graft's authoritative input shape.

Schema per BASELINE.json input_hint:
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

Deterministic in image_id (splittable hash columns, no rand()), mirroring
the reference's default-seeded generator
(/root/reference/DatasetGenerator/main.cpp:13-57). Pixel buffers and
phash are produced in one Arrow-batched mapInPandas pass (media.py
kernels); the table scales by `n` with no driver materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_aknn.media import (
    average_phash,
    decode_jpeg_lite,
    encode_jpeg_lite,
    encode_raw,
    synth_pixels,
)

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)

_WORDS = [
    "tile", "stripe", "point", "raster", "vector", "sweep", "grid",
    "cell", "pixel", "query", "corpus", "shard",
]


def images_table(
    spark: SparkSession,
    n: int,
    min_side: int = 8,
    max_side: int = 32,
    fmt: str = "raw",
    num_partitions: int | None = None,
) -> DataFrame:
    base = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    span = max_side - min_side + 1
    seed = F.xxhash64(F.col("id"))
    base = base.select(
        F.col("id"),
        F.format_string("img_%012d", F.col("id")).alias("image_id"),
        (F.pmod(seed, F.lit(span)) + F.lit(min_side)).cast("int").alias("w"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(span)) + F.lit(min_side))
        .cast("int")
        .alias("h"),
        F.lit(fmt).alias("fmt"),
    )
    base = base.withColumn(
        "caption",
        F.concat(
            F.lit("caption for "),
            F.col("image_id"),
            F.lit(": "),
            F.element_at(F.array(*[F.lit(w) for w in _WORDS]), (F.pmod(seed, F.lit(len(_WORDS))) + 1).cast("int")),
            F.lit(" "),
            F.element_at(
                F.array(*[F.lit(w) for w in _WORDS]),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(len(_WORDS))) + 1).cast("int"),
            ),
        ),
    )

    def attach_pixels(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bufs, hashes = [], []
            for rid, w, h in zip(pdf["id"], pdf["w"], pdf["h"]):
                arr = synth_pixels(int(rid), int(w), int(h))
                if fmt == "jpeg_lite":
                    buf = encode_jpeg_lite(arr)
                    bufs.append(buf)
                    # phash of the DECODED pixels: the stored hash must
                    # match what a downstream decode reproduces (the
                    # decode_ok invariant), and lossy decode != source
                    hashes.append(average_phash(decode_jpeg_lite(buf)))
                elif fmt == "raw":
                    bufs.append(encode_raw(arr))
                    hashes.append(average_phash(arr))
                else:
                    raise ValueError(f"images_table cannot encode fmt {fmt!r}")
            out = pdf[["image_id", "w", "h", "fmt", "caption"]].copy()
            out.insert(1, "bytes", bufs)
            out["phash"] = pd.Series(hashes, dtype="int64").values
            yield out[["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]]

    return base.mapInPandas(attach_pixels, IMAGES_SCHEMA)
