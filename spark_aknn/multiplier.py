"""Dataset multiplier — scale a point table ×4 / ×2 / ÷2, or copy (×1).

Re-expresses /root/reference/DatasetMultiplier/main.cpp exactly:
  * ×1 (main.cpp:64-69): identity copy — ids and coordinates pass
    through unchanged; the CLI uses it for text<->binary format
    conversion (target format chosen by extension, main.cpp:125-137).
  * ×4 (write_output_points, factor 4, main.cpp:70-89): halve both
    coordinates, replicate into the four quadrants in the reference's id
    order — 4*pos+1 -> (x/2, y/2), 4*pos+2 -> (x/2, 0.5+y/2),
    4*pos+3 -> (0.5+x/2, y/2), 4*pos+4 -> (0.5+x/2, 0.5+y/2) — here a
    union of four projections (one narrow pass, no shuffle).
  * ×2 (main.cpp:169-170 / :205-206): keep every 2nd SOURCE point
    (0-based position i%2==1, i.e. even dense ids), then apply the full
    four-quadrant expansion with the survivor's renumbered position j.
  * ÷2 (factor -1): keep positions i%2==1 (even ids), renumber densely.
  * ÷2 odd (factor -2): keep positions i%2==0 (odd ids), renumber densely.

Renumbering uses deterministic arithmetic on the original dense ids
(the reference renumbers sequentially while streaming; with dense
1-based ids the 0-based position is id-1, so quadrant q of id i maps to
(i-1)*4 + q + 1 — dense, reproducible in any order, no zipWithIndex
serialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference quadrant order: targetPoints[0..3] in DatasetMultiplier/main.cpp:74-77
_QUADRANTS = [(0.0, 0.0), (0.0, 0.5), (0.5, 0.0), (0.5, 0.5)]


def _idiv2(col: F.Column) -> F.Column:
    """Integer halve a long column. `col / 2` promotes to double and
    loses the low bits above 2^53 (ids at the 10^12 design point after a
    few x4 rounds exceed that); shiftright is a pure bit op on the long,
    exact for all non-negative ids."""
    return F.shiftright(col.cast("long"), 1)


def _expand_quadrants(points: DataFrame, pos: F.Column) -> DataFrame:
    """4 points per row: new id = 4*pos + q + 1, reference id order."""
    parts = []
    for q, (dx, dy) in enumerate(_QUADRANTS):
        parts.append(
            points.select(
                (pos * 4 + q + 1).cast("long").alias("id"),
                (F.col("x") / 2 + F.lit(dx)).alias("x"),
                (F.col("y") / 2 + F.lit(dy)).alias("y"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multiply_x4(points: DataFrame) -> DataFrame:
    """4x the dataset by quadrant replication; stays in [0,1)^2."""
    return _expand_quadrants(points, F.col("id") - 1)


def multiply_x2(points: DataFrame) -> DataFrame:
    """Every 2nd SOURCE point (even dense ids = 0-based positions i%2==1,
    main.cpp:205), each expanded into all four quadrants with survivor
    position j = id/2 - 1 (so new ids are dense 1..2n)."""
    survivors = points.filter(F.col("id") % 2 == 0)
    return _expand_quadrants(survivors, _idiv2(F.col("id")) - 1)


def sample_half(points: DataFrame) -> DataFrame:
    """Factor -1: positions i%2==1 (even dense ids), renumbered densely
    (main.cpp:169 with write_output_points pos+1)."""
    return points.filter(F.col("id") % 2 == 0).select(
        _idiv2(F.col("id")).alias("id"), "x", "y"
    )


def sample_half_odd(points: DataFrame) -> DataFrame:
    """Factor -2: positions i%2==0 (odd dense ids), renumbered densely."""
    return points.filter(F.col("id") % 2 == 1).select(
        _idiv2(F.col("id") + 1).alias("id"), "x", "y"
    )


def convert(points: DataFrame) -> DataFrame:
    """Factor 1: identity pass-through (main.cpp:64-69) — ids and
    coordinates unchanged; pairs with a differently-formatted sink for
    the reference's text<->binary conversion use."""
    return points.select("id", "x", "y")


def multiply(points: DataFrame, factor: int) -> DataFrame:
    """The reference CLI's factor dispatch (main.cpp:116-121: only
    -2, -1, 1, 2, 4 are legal)."""
    ops = {-2: sample_half_odd, -1: sample_half, 1: convert, 2: multiply_x2, 4: multiply_x4}
    if factor not in ops:
        raise ValueError("Factor argument must be equal to -2, -1, 1, 2 or 4")
    return ops[factor](points)
