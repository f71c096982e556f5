"""Dataset multiplier — scale a point table ×4 / ×2 / ÷2.

Re-expresses /root/reference/DatasetMultiplier/main.cpp:
  * ×4 (:51-89): halve both coordinates, replicate into the four
    quadrants with offsets (0,0) (0.5,0) (0,0.5) (0.5,0.5), renumber —
    here a union of four projections (one narrow pass, no shuffle).
  * ×2 (:100-...): every 2nd point of the ×4 expansion.
  * ÷2 sampling: every 2nd point, renumbered densely.

Renumbering uses deterministic arithmetic on the original dense ids
(the reference renumbers sequentially while streaming; with 4n points
we assign quadrant q's copy of id i the new id (i-1)*4 + q + 1, which
is dense 1..4n and reproducible in any order — a distributed-friendly
equivalent; `zipWithIndex`-style global renumbering would serialize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multiply_x4(points: DataFrame) -> DataFrame:
    """4x the dataset by quadrant replication; stays in [0,1)^2."""
    parts = []
    for q, (dx, dy) in enumerate([(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)]):
        parts.append(
            points.select(
                ((F.col("id") - 1) * 4 + q + 1).alias("id"),
                (F.col("x") / 2 + F.lit(dx)).alias("x"),
                (F.col("y") / 2 + F.lit(dy)).alias("y"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multiply_x2(points: DataFrame) -> DataFrame:
    """Every 2nd point of the x4 expansion, renumbered densely."""
    x4 = multiply_x4(points)
    return x4.filter(F.col("id") % 2 == 1).select(
        ((F.col("id") - 1) / 2 + 1).cast("long").alias("id"), "x", "y"
    )


def sample_half(points: DataFrame) -> DataFrame:
    """Every 2nd point (odd original ids), renumbered densely."""
    return points.filter(F.col("id") % 2 == 1).select(
        ((F.col("id") - 1) / 2 + 1).cast("long").alias("id"), "x", "y"
    )
