"""Point-in-polygon — vectorized even-odd ray casting.

Graft addition (BASELINE.json north_rule: "point-in-polygon"); not in
the reference. Two implementations with identical semantics:

  * ``points_in_polygon_col`` — pure Spark higher-order functions
    (``filter``/``size`` over the edge array): JVM-side, codegen'd,
    usable against a polygon table via broadcast join. The hot path.
  * ``pip_numpy`` — numpy kernel for tests and for Pandas-UDF contexts.

Even-odd rule, half-open edge treatment ((y1 > py) != (y2 > py)) so a
ray through a vertex counts once; points exactly on a horizontal edge
follow the crossing tie-break (standard PNPOLY semantics).

``pip_sql`` generates the equivalent ANSI SQL for a *fixed* polygon so
the DuckDB oracle can verify the Spark plan — same arithmetic, same
IEEE doubles, so booleans agree exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ring: array<struct<x:double,y:double>> (closed implicitly; last->first edge added here)


def _edges(ring: Column) -> Column:
    n = F.size(ring)
    rotated = F.concat(F.slice(ring, 2, n - 1), F.slice(ring, 1, 1))
    return F.arrays_zip(ring.alias("a"), rotated.alias("b"))


def points_in_polygon_col(px: Column, py: Column, ring: Column) -> Column:
    """Boolean column: is (px, py) inside ``ring`` (even-odd rule)."""
    def crosses(e: Column) -> Column:
        x1, y1 = e["a"]["x"], e["a"]["y"]
        x2, y2 = e["b"]["x"], e["b"]["y"]
        straddles = (y1 > py) != (y2 > py)
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        return straddles & (px < xint)

    return F.size(F.filter(_edges(ring), crosses)) % 2 == 1


def tag_points_in_polygons(
    points: DataFrame, polygons: DataFrame, px: str = "x", py: str = "y"
) -> DataFrame:
    """points x broadcast(polygons) -> rows (point cols, poly_id) for
    every polygon containing the point. Polygon side is the small dim
    table — broadcast, no shuffle of the point side."""
    return (
        points.crossJoin(F.broadcast(polygons))
        .filter(points_in_polygon_col(F.col(px), F.col(py), F.col("ring")))
        .drop("ring")
    )


def pip_sql(px_sql: str, py_sql: str, ring: list[tuple[float, float]]) -> str:
    """Equivalent SQL boolean for a fixed polygon (DuckDB oracle)."""
    terms = []
    m = len(ring)
    for i in range(m):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % m]
        straddle = f"(({y1} > ({py_sql})) != ({y2} > ({py_sql})))"
        xint = f"(({x2} - {x1}) * (({py_sql}) - {y1}) / ({y2} - {y1}) + {x1})"
        terms.append(f"(CASE WHEN {straddle} AND (({px_sql}) < {xint}) THEN 1 ELSE 0 END)")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def pip_numpy(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """ring: (m, 2) array. Returns boolean mask, identical rule."""
    inside = np.zeros(len(px), dtype=bool)
    m = len(ring)
    for i in range(m):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % m]
        straddles = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= straddles & (px < xint)
    return inside
