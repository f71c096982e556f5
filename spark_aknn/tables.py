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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_aknn.media import (
    average_phash,
    decode_jpeg_lite,
    encode_jpeg_lite,
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
        # batched per (w, h) group: synth + phash run as one vectorized
        # kernel over every same-sized image in the Arrow batch instead
        # of ~15 numpy calls per row (measured ~6x on images_synth; the
        # jpeg_lite encode stays per-row — zlib is inherently scalar)
        from spark_aknn.media import average_phash_batch, synth_pixels_batch

        for pdf in it:
            m = len(pdf)
            bufs: list[bytes | None] = [None] * m
            hashes = np.empty(m, dtype=np.int64)
            ids = pdf["id"].to_numpy()
            for (w, h), idxs in pdf.groupby(["w", "h"]).indices.items():
                arrs = synth_pixels_batch(ids[idxs], int(w), int(h))
                if fmt == "jpeg_lite":
                    for j, i in enumerate(idxs):
                        buf = encode_jpeg_lite(arrs[j])
                        bufs[i] = buf
                        # phash of the DECODED pixels: the stored hash
                        # must match what a downstream decode reproduces
                        # (the decode_ok invariant); lossy decode != source
                        hashes[i] = average_phash(decode_jpeg_lite(buf))
                elif fmt == "raw":
                    hashes[idxs] = average_phash_batch(arrs)
                    flat = arrs.reshape(len(idxs), -1)
                    for j, i in enumerate(idxs):
                        bufs[i] = flat[j].tobytes()
                else:
                    raise ValueError(f"images_table cannot encode fmt {fmt!r}")
            out = pdf[["image_id", "w", "h", "fmt", "caption"]].copy()
            out.insert(1, "bytes", bufs)
            out["phash"] = hashes
            yield out[["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]]

    return base.mapInPandas(attach_pixels, IMAGES_SCHEMA)
