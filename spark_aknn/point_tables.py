"""Deterministic point-table generators — the reference's data families.

Mirrors the reference benchmark matrix (BASELINE.md):
  * uniform  — DatasetGenerator/main.cpp:13-57 (seeded uniform [0,1]^2)
  * clustered — the `sc*` synthetic family: Gaussian blobs around
    hash-placed centers
  * zipf — heavy-tailed coordinate skew (syntheticdata runs)

All deterministic functions of the row id via the shared LCG / splitmix
mixing — spark.range + column math, no rand(), no driver data, so any
executor regenerates identical values (FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_aknn.points import lcg_x, lcg_y


def _base(spark: SparkSession, n: int, num_partitions: int | None):
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    return rng.select((F.col("id") + 1).alias("id"), F.col("id").alias("key"))


def uniform_points(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    return _base(spark, n, num_partitions).select(
        "id", lcg_x(F.col("key")).alias("x"), lcg_y(F.col("key")).alias("y")
    )


def clustered_points(
    spark: SparkSession,
    n: int,
    num_clusters: int = 16,
    spread: float = 0.02,
    num_partitions: int | None = None,
    quantize: int | None = None,
    skew: str = "uniform",
) -> DataFrame:
    """Gaussian-ish blobs: cluster centers at hash positions; offsets via
    a cheap uniform-difference approximation of a normal (sum of two
    uniforms, triangular — adequate for benchmark shaping).

    ``quantize`` rounds coordinates to that many decimals — the
    duplicate-heavy shape of sensor/pixel feeds. Duplicated y values
    fuse quantile boundaries, which is exactly what arms the grid's
    salting path (build_grid only x-splits hot stripes after fusion),
    so the campaign can verify x_splits actually fire at scale.

    ``skew='zipf'`` draws the cluster index Zipf(1)-ish instead of
    uniformly — c = floor((N+1)^u) - 1 with u ~ U[0,1) populates ALL
    indices 0..N-1 with P(c=j) = log_{N+1}((j+2)/(j+1)) ∝ log(1+1/(j+1))
    ≈ 1/(j+1), so the hottest cluster holds log(2)/log(N+1) of the
    corpus (~17% at N=64) and its stripes exceed any salt threshold.
    (r4 ADVICE: the earlier floor(N^u) form never produced index 0 and
    silently ran with N-1 effective clusters.)"""
    b = _base(spark, n, num_partitions)
    if skew == "zipf":
        u = F.pmod(F.xxhash64(F.col("key"), F.lit(0)), F.lit(1 << 20)) / F.lit(
            float(1 << 20)
        )
        c = F.floor(F.pow(F.lit(float(num_clusters + 1)), u)).cast("long") - F.lit(1)
    elif skew == "uniform":
        c = F.pmod(F.xxhash64(F.col("key"), F.lit(0)), F.lit(num_clusters))
    else:
        raise ValueError(f"unknown skew {skew!r}")
    cx = lcg_x(c * F.lit(7919))
    cy = lcg_y(c * F.lit(104729))
    ox = (lcg_x(F.col("key") * 3 + 1) + lcg_x(F.col("key") * 3 + 2) - F.lit(1.0)) * F.lit(spread)
    oy = (lcg_y(F.col("key") * 3 + 1) + lcg_y(F.col("key") * 3 + 2) - F.lit(1.0)) * F.lit(spread)
    clamp = lambda col: F.least(F.greatest(col, F.lit(0.0)), F.lit(0.9999999))  # noqa: E731
    x, y = clamp(cx + ox), clamp(cy + oy)
    if quantize is not None:
        x, y = F.round(x, quantize), F.round(y, quantize)
    return b.select("id", x.alias("x"), y.alias("y"))


def zipf_points(
    spark: SparkSession, n: int, alpha: float = 1.5, num_partitions: int | None = None
) -> DataFrame:
    """Heavy-tailed y via inverse-power transform of a uniform:
    y = u^(1/(1-alpha)) normalized into [0,1) — most mass crushed near
    0, exercising duplicate-ish stripes + salting at scale."""
    b = _base(spark, n, num_partitions)
    u = lcg_y(F.col("key"))
    y = F.pow(u + F.lit(1e-12), F.lit(1.0 / (1.0 - alpha)))
    y = y / (y + F.lit(1000.0))  # squash the tail into [0,1)
    return b.select("id", lcg_x(F.col("key")).alias("x"), y.alias("y"))
