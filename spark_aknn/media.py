"""Multimodal (image) kernels — numpy batch kernels + mapInPandas ops.

Per BASELINE.json input_hint the corpus rows carry an image payload
(bytes, w, h, fmt) and the per-row invariant is decoded-pixel allclose
(PSNR >= 40 dB for lossy formats) + caption equality. The Spark-side
plumbing here (schemas, Arrow batching, mapInPandas signatures) is real
and tested; lossy codecs are stubbed behind an import-try since no
image library ships in this sandbox — ``fmt='raw'`` (packed RGB) is the
lossless baseline and is fully implemented in numpy.

All kernels are Arrow-batched (mapInPandas); no per-row Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # optional lossy-codec tier — absent in this sandbox
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """bytes -> (h, w, 3) uint8 array."""
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
    if fmt in ("jpeg", "png", "webp"):
        if not _HAS_PIL:
            raise NotImplementedError(
                f"lossy format {fmt!r} needs an image codec (PIL) not present in this sandbox"
            )
        import io

        return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
    raise ValueError(f"unknown image format {fmt!r}")


def encode_raw(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixel buffer: int64 LCG stream over flat indices,
    seeded by the image id — reproducible on any executor, no RNG state
    (mirrors the reference generator's determinism,
    /root/reference/DatasetGenerator/main.cpp:37-42)."""
    n = w * h * 3
    idx = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        vals = (
            np.uint64(seed & 0xFFFFFFFFFFFFFFFF) * np.uint64(6364136223846793005)
            + idx * np.uint64(1442695040888963407)
        ) >> np.uint64(16)
    return (vals & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys][:, xs]


def average_phash(arr: np.ndarray) -> int:
    """64-bit average hash: grayscale -> 8x8 block means -> bit per cell
    (sign vs overall mean). Signed-int64 bit pattern (Spark LongType)."""
    gray = arr.astype(np.float64).mean(axis=2)
    g8 = resize_nearest(gray[..., None], 8, 8)[..., 0]
    bits = (g8 > g8.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= np.uint64(b) << np.uint64(i)
    return int(val.astype(np.int64))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ---------------------------------------------------------------- mapInPandas ops

_STATS_SCHEMA = (
    "image_id string, mean_lum double, phash_check long, decode_ok boolean, psnr_db double"
)


def decode_invariants(images: DataFrame) -> DataFrame:
    """Decode every image, recompute phash, report PSNR vs a raw
    re-encode round trip — the per-row invariant check of
    BASELINE.json (PSNR >= 40 dB lossy; == inf for raw)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for img_id, buf, w, h, fmt, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["phash"]
            ):
                try:
                    arr = decode_image(buf, w, h, fmt)
                    rt = decode_image(encode_raw(arr), w, h, "raw")
                    rows.append(
                        (
                            img_id,
                            float(arr.astype(np.float64).mean()),
                            average_phash(arr),
                            bool(average_phash(arr) == ph),
                            psnr(arr, rt),
                        )
                    )
                except NotImplementedError:
                    rows.append((img_id, None, None, False, None))
            yield pd.DataFrame(
                rows, columns=["image_id", "mean_lum", "phash_check", "decode_ok", "psnr_db"]
            )

    return images.mapInPandas(batches, _STATS_SCHEMA)


_THUMB_SCHEMA = "image_id string, thumb binary, tw int, th int"


def thumbnails(images: DataFrame, size: int = 8) -> DataFrame:
    """Feature-extraction plumbing: fixed-size nearest-neighbor thumbs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for img_id, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                arr = decode_image(buf, w, h, fmt)
                out.append((img_id, encode_raw(resize_nearest(arr, size, size)), size, size))
            yield pd.DataFrame(out, columns=["image_id", "thumb", "tw", "th"])

    return images.mapInPandas(batches, _THUMB_SCHEMA)
