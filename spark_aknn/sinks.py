"""Result sinks — canonical parquet plus the reference's golden text format.

The reference saves one line per query:
    inputId \\t (neighborId dist) \\t (neighborId dist) ... x k
with a '\\t' before EVERY pair, neighbors in DESCENDING distance order
(max-heap pop order) and unfilled slots printed first as
"(NULL <DBL_MAX>)" — the heap is pre-filled with {pointId 0, DBL_MAX}
sentinels which pop before any real neighbor
(/root/reference/PlaneSweepParallel/include/AllKnnResult.h:130-160;
sentinel PointNeighbors.h:51). Distances use default ostream formatting
(6 significant digits, %g-equivalent). Our canonical output is
ascending-rank parquet; this sink re-serializes to the reference's
convention for golden-file parity diffs (small-scale artifact — the
only Python in it is one Arrow-batched vectorized %g formatter, since
Java's %g keeps trailing zeros and can't byte-match ostream output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DBL_MAX = 1.7976931348623157e308
_NULL_PAIR = "(NULL %g)" % _DBL_MAX  # "(NULL 1.79769e+308)"


def _fmt_g_series(dist: pd.Series) -> pd.Series:
    """C/C++ '%g' (6 significant digits, trailing zeros stripped) —
    matches default std::ostream double output byte-for-byte."""
    return pd.Series(np.char.mod("%g", dist.to_numpy(dtype=np.float64)))


# DataType instance (not a DDL string) so importing this module needs no
# active SparkSession
_fmt_g = pandas_udf(_fmt_g_series, StringType())


def to_reference_lines(result: DataFrame, k: int) -> DataFrame:
    """(input_id, line) — the reference text row for each query.

    Collapses the (input_id, rank, neighbor_id, dist_sq) canonical form:
    ranks reversed to descending distance, underfull queries padded in
    front with the (NULL DBL_MAX) sentinel pairs that pop first from the
    reference's pre-filled max-heap."""
    pair = F.concat(
        F.lit("("), F.col("neighbor_id").cast("string"), F.lit(" "),
        _fmt_g(F.col("dist_sq")), F.lit(")")
    )
    per_query = (
        result.withColumn("pair", pair)
        .groupBy("input_id")
        .agg(F.reverse(F.array_sort(F.collect_list(F.struct("rank", "pair")))).alias("pairs"))
    )
    padded = F.concat(
        F.array_repeat(F.lit(_NULL_PAIR), F.lit(k) - F.size("pairs")),
        F.transform("pairs", lambda s: s["pair"]),
    )
    return per_query.select(
        "input_id",
        F.concat(
            F.col("input_id").cast("string"), F.lit("\t"), F.concat_ws("\t", padded)
        ).alias("line"),
    )


def save_reference_format(result: DataFrame, k: int, path: str) -> None:
    """Write the golden text file (single part, sorted by input id —
    small-scale parity artifact only; the canonical sink is parquet)."""
    (
        to_reference_lines(result, k)
        .orderBy("input_id")
        .select("line")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
