"""Image-tier driver queries: jpeg_lite + phash in the oracle gate.

BASELINE.json's input_hint is an image+caption table with a phash
column and a per-row decoded-pixel invariant (PSNR >= 40 dB for lossy
formats, caption equality). The media kernels (spark_aknn/media.py)
were previously verified only by pytest; this module puts the full
distributed image path — encode -> decode -> phash -> Hamming
near-dup search — into the driver's DuckDB oracle gate.

Corpus: a deterministic *blocky* image per integer key. The 8x8 cell
grid is bimodal (each cell uniformly dark=40 or bright=210 from a
splitmix-style bit of (seed, cell)), so every average-phash bit sits
~85 intensity levels away from the global-mean threshold and survives
jpeg_lite quantization noise untouched. `variant = key % nvariants`
flips cells [0, variant) to the opposite level, so same-seed images are
NEAR duplicates with exactly-known Hamming distances (|v_a - v_b|
flipped cells -> hamming <= nvariants - 1) while cross-seed hamming is
~Binomial(64, 1/2) — far outside any small search radius.

Oracle strategy: phash/PSNR of a (seed, variant) image cannot be
expressed in SQL (DCT codec), but both are pure functions of
(seed, variant) — nseeds*nvariants constants. The DuckDB oracle embeds
those constants (computed by the SAME numpy kernels, single-node,
driver-side at SQL-build time) as a VALUES CTE keyed by
(key % nseeds, key % nvariants), and re-derives the near-dup pair set
with a brute-force bit_count(xor) self-join. The differential is
therefore (a) the distributed Arrow mapInPandas encode->decode->phash
path vs the single-node kernel, and (b) the exact multi-index Hamming
search (pipeline/dedup.py:613) vs brute force. The kernels themselves
are covered by pytest invariants (PSNR >= 40, variant-flip bit
arithmetic, codec round-trip).

Reference parity: the reference's test strategy compares engine output
against an independently-computed expected set per query
(/root/reference/PlaneSweepParallel/src/PlaneSweepParallel.cpp
accuracy-check flow); this is that pattern applied to the graft's
image payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_aknn.media import (
    average_phash,
    decode_jpeg_lite,
    encode_jpeg_lite,
    psnr,
)
from spark_aknn.pipeline.dedup import simhash_near_dup_pairs

DEFAULT_NSEEDS = 100
DEFAULT_NVARIANTS = 3
SIDE = 16  # w = h; 8x8 phash cells of 2x2 pixels
QUALITY = 96
DARK, BRIGHT = 40, 210

IMAGES_SCHEMA = (
    "key long, image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, psnr double"
)


def _cell_bits(seed: int) -> np.ndarray:
    """64 deterministic cell-brightness bits for a seed (splitmix64 mix,
    one value per cell; matches across Spark executors / the oracle
    builder because it is pure integer arithmetic)."""
    x = (np.uint64(seed) + np.arange(1, 65, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return ((x >> np.uint64(17)) & np.uint64(1)).astype(bool)


def blocky_pixels(seed: int, variant: int, side: int = SIDE) -> np.ndarray:
    """(side, side, 3) uint8 bimodal cell image; variant flips cells
    [0, variant) to the opposite level."""
    if side % 8:
        raise ValueError("side must be a multiple of 8")
    bits = _cell_bits(seed).copy()
    bits[:variant] = ~bits[:variant]
    cells = np.where(bits.reshape(8, 8), BRIGHT, DARK).astype(np.uint8)
    chan = np.repeat(np.repeat(cells, side // 8, axis=0), side // 8, axis=1)
    return np.stack([chan, chan, chan], axis=-1)


def _render(seed: int, variant: int, side: int, quality: int):
    """-> (bytes, phash-of-decoded, psnr vs source). One definition used
    by both the distributed kernel and the oracle constant builder."""
    arr = blocky_pixels(seed, variant, side)
    buf = encode_jpeg_lite(arr, quality)
    dec = decode_jpeg_lite(buf)
    return buf, average_phash(dec), float(psnr(arr, dec))


def keyed_images(
    df: DataFrame,
    key_col: str,
    nseeds: int = DEFAULT_NSEEDS,
    nvariants: int = DEFAULT_NVARIANTS,
    side: int = SIDE,
    quality: int = QUALITY,
) -> DataFrame:
    """Integer-keyed table -> full input_hint image table
    (image_id, bytes, w, h, fmt, caption, phash) plus the key and the
    decoded-pixel PSNR. One Arrow-batched mapInPandas pass; the
    (seed, variant) render is memoized per batch (nseeds*nvariants
    distinct images)."""
    keys = df.select(F.col(key_col).cast("long").alias("key"))

    def render_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # render each distinct (seed, variant) once per task, then build
        # the batch columns vectorized — no per-row tuple/dict churn
        # (r5 verdict What's-wrong #3)
        cache: dict[tuple[int, int], tuple[bytes, int, float]] = {}
        for pdf in it:
            keys = pdf["key"].to_numpy().astype(np.int64)
            pairs = np.stack([keys % nseeds, keys % nvariants], axis=1)
            uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
            rendered = []
            for s, v in uniq.tolist():
                if (s, v) not in cache:
                    cache[(s, v)] = _render(s, v, side, quality)
                rendered.append(cache[(s, v)])
            image_id = np.char.mod("img_%012d", keys)
            yield pd.DataFrame(
                {
                    "key": keys,
                    "image_id": image_id,
                    "bytes": [rendered[i][0] for i in inv.tolist()],
                    "w": np.full(len(keys), side, dtype=np.int32),
                    "h": np.full(len(keys), side, dtype=np.int32),
                    "fmt": "jpeg_lite",
                    "caption": np.char.add("caption for ", image_id),
                    "phash": np.array([r[1] for r in rendered], dtype=np.int64)[inv],
                    "psnr": np.array([r[2] for r in rendered], dtype=np.float64)[inv],
                }
            )

    return keys.mapInPandas(render_batch, IMAGES_SCHEMA)


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 4,
    n_hint: int | None = None,
    id_col: str = "key",
) -> DataFrame:
    """(a, b, hamming) for ALL image pairs with phash Hamming distance
    <= max_hamming — the exact multi-index Hamming search
    (dedup.simhash_near_dup_pairs) applied to the image fingerprint
    column, per the north star's image-near-dup use."""
    sim = images.select(
        F.col(id_col).alias("doc_id"), F.col("phash").alias("simhash")
    )
    return simhash_near_dup_pairs(sim, max_hamming=max_hamming, n_hint=n_hint)


# ------------------------------------------------------------------- oracles


def _constants(nseeds: int, nvariants: int, side: int, quality: int):
    return [
        (s, v, *_render(s, v, side, quality)[1:])
        for s in range(nseeds)
        for v in range(nvariants)
    ]


def _sql_double(x: float) -> str:
    # repr() is the shortest round-trip decimal; the string->DOUBLE cast
    # forces DuckDB's float64 parser (a bare decimal literal would type
    # as DECIMAL and perturb the low bits), so the oracle constant is
    # bit-identical to the float64 the Spark kernel computes
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _const_cte(nseeds: int, nvariants: int, side: int, quality: int) -> str:
    vals = ",\n".join(
        f"({s}, {v}, CAST({ph} AS BIGINT), {_sql_double(db)})"
        for s, v, ph, db in _constants(nseeds, nvariants, side, quality)
    )
    return f"ph(seed, variant, phash, psnr) AS (VALUES\n{vals})"


def _keyed_cte(key_sql: str, table: str, nseeds: int, nvariants: int) -> str:
    return (
        f"imgs AS (SELECT CAST({key_sql} AS BIGINT) AS key, p.phash, p.psnr "
        f"FROM {table} "
        f"JOIN ph p ON p.seed = {key_sql} % {nseeds} "
        f"AND p.variant = {key_sql} % {nvariants})"
    )


def phash_pairs_duckdb_sql(
    key_sql: str,
    table: str,
    max_hamming: int = 4,
    nseeds: int = DEFAULT_NSEEDS,
    nvariants: int = DEFAULT_NVARIANTS,
    side: int = SIDE,
    quality: int = QUALITY,
) -> str:
    """Brute-force bit_count(xor) twin of phash_near_dup_pairs."""
    return f"""
WITH {_const_cte(nseeds, nvariants, side, quality)},
{_keyed_cte(key_sql, table, nseeds, nvariants)}
SELECT x.key AS a, y.key AS b,
       CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
FROM imgs x JOIN imgs y ON x.key < y.key
WHERE bit_count(xor(x.phash, y.phash)) <= {max_hamming}
"""


def decode_psnr_duckdb_sql(
    key_sql: str,
    table: str,
    nseeds: int = DEFAULT_NSEEDS,
    nvariants: int = DEFAULT_NVARIANTS,
    side: int = SIDE,
    quality: int = QUALITY,
) -> str:
    """Per-row invariant twin of the distributed decode: image_id +
    caption equality, stored-phash and PSNR vs the single-node render.
    PSNR constants are embedded via repr() (shortest round-trip
    decimal), so the DOUBLE DuckDB parses is bit-equal to the float64
    the Spark kernel computes."""
    return f"""
WITH {_const_cte(nseeds, nvariants, side, quality)},
{_keyed_cte(key_sql, table, nseeds, nvariants)}
SELECT printf('img_%012d', key) AS image_id,
       'caption for ' || printf('img_%012d', key) AS caption,
       {side} AS w, {side} AS h, 'jpeg_lite' AS fmt,
       phash, psnr
FROM imgs
"""
