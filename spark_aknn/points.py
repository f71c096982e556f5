"""Point derivation — deterministic (id, x, y) tables in [0,1)^2.

The reference engine operates on flat ``{id, x, y}`` rows with uniform
coordinates in [0,1]^2 drawn by a seeded generator
(/root/reference/DatasetGenerator/main.cpp:37-42, uniform_real_distribution;
Point struct /root/reference/PlaneSweepParallel/include/PlaneSweepParallel.h:13-18).

We derive points from existing key columns with a Lehmer/LCG hash using
only int64 arithmetic and one correctly-rounded double division, so the
exact same doubles are produced by Spark SQL, DuckDB SQL (the
correctness oracle) and numpy (the test oracle) — bit-identical, which
lets the driver's value-hash comparison pass on floating-point columns.

For the graft's image table, points come from the 64-bit perceptual hash
instead: x = high 32 bits / 2^32, y = low 32 bits / 2^32 (SURVEY.md §7.2).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# LCG constants (Knuth/ANSI-C style); modulus is the Mersenne prime 2^31-1.
# Multipliers are large so even small dense key ranges spread over the full
# [0,1) domain; key*A stays well inside int64 for keys < 2^32.
_M = 2147483647
_AX, _CX = 1103515245, 12345
_AY, _CY = 1583458089, 54321


def lcg_x(key: Column) -> Column:
    return ((key * F.lit(_AX) + F.lit(_CX)) % F.lit(_M)).cast("double") / F.lit(float(_M))


def lcg_y(key: Column) -> Column:
    return ((key * F.lit(_AY) + F.lit(_CY)) % F.lit(_M)).cast("double") / F.lit(float(_M))


def points_from_keys(df: DataFrame, key_col: str) -> DataFrame:
    """Project any table with an int64 key into a reference-shaped point table."""
    key = F.col(key_col).cast("long")
    return df.select(
        (key + F.lit(1)).alias("id"),  # reference ids are 1-based, dense
        lcg_x(key).alias("x"),
        lcg_y(key).alias("y"),
    )


def lcg_sql(key_expr: str) -> tuple[str, str]:
    """(x_sql, y_sql) — the identical derivation in ANSI SQL for the DuckDB oracle."""
    x = f"(({key_expr} * {_AX} + {_CX}) % {_M}) / {_M}.0"
    y = f"(({key_expr} * {_AY} + {_CY}) % {_M}) / {_M}.0"
    return x, y


def lcg_numpy(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = keys.astype(np.int64)
    x = ((k * _AX + _CX) % _M).astype(np.float64) / float(_M)
    y = ((k * _AY + _CY) % _M).astype(np.float64) / float(_M)
    return x, y


def points_from_phash(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    id_strategy: str = "numeric",
) -> DataFrame:
    """phash -> (x, y) in [0,1)^2: high 32 bits -> x, low 32 bits -> y.

    Pure column expressions (JVM-side); lands in the reference's
    coordinate domain so the same sweep kernels apply unchanged.

    Point ids must be COLLISION-FREE: the kNN kernels key every exchange
    and rank merge on ``id``, so two images sharing an id silently merge
    their neighbor lists (at the 10^12 design point a 64-bit hash id
    yields ~10^4 birthday collisions — r2 verdict What's-wrong #5).
    Strategies:

    * ``numeric`` (default): parse the trailing integer out of the key
      (corpus keys are serialized — ``img_%012d``, tables.py:47) and use
      it 1-based. Dense, deterministic, and collision-free by
      construction whenever the serial is unique; a key with no digits
      fails the job loudly instead of degrading to a hash.
    * ``rowid``: ``monotonically_increasing_id()`` — collision-free for
      arbitrary keys (partition-encoded, no shuffle) but only stable
      across runs under a stable input partitioning; keep the emitted
      (id, point_key) mapping to join results back.
    """
    two32 = float(1 << 32)
    high = F.shiftrightunsigned(F.col(phash_col), 32)
    low = F.col(phash_col).bitwiseAND(F.lit((1 << 32) - 1))
    base = df.select(
        F.col(id_col).alias("point_key"),
        (high.cast("double") / F.lit(two32)).alias("x"),
        (low.cast("double") / F.lit(two32)).alias("y"),
    )
    if id_strategy == "numeric":
        serial = F.regexp_extract(F.col("point_key").cast("string"), r"(\d+)\s*$", 1)
        # length <= 18 keeps serial.cast('long') exact (10^18 < 2^63);
        # a longer serial would overflow to NULL under non-ANSI SQL and
        # silently merge neighbor lists — route it to the loud failure
        # alongside the no-digits case (r3 ADVICE)
        pid = F.when((serial != "") & (F.length(serial) <= 18), serial.cast("long") + 1).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("points_from_phash(id_strategy='numeric'): key has no "
                          "trailing integer serial (or serial > 18 digits): "),
                    F.col("point_key"),
                )
            ).cast("long")
        )
        return base.withColumn("id", pid)
    if id_strategy == "rowid":
        return base.withColumn("id", F.monotonically_increasing_id() + 1)
    raise ValueError(f"unknown id_strategy: {id_strategy!r}")
