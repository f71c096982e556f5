"""Result sinks — canonical parquet plus the reference's golden text format.

The reference saves one line per query:
    inputId \\t (neighborId dist)(neighborId dist)...  x k
with neighbors in DESCENDING distance order (max-heap pop order) and
unfilled slots printed as "(NULL " + DBL_MAX-ish distance
(/root/reference/PlaneSweepParallel/include/AllKnnResult.h:114-164;
external twin AllKnnResultStripesParallelExternal.h:562-605). Our
canonical output is ascending-rank parquet; this sink re-serializes it
to the reference's convention for golden-file parity diffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DBL_MAX = 1.7976931348623157e308


def to_reference_lines(result: DataFrame, k: int) -> DataFrame:
    """(input_id, line) — the reference text row for each query.

    Collapses the (input_id, rank, neighbor_id, dist_sq) canonical form:
    ranks reversed to descending distance, underfull queries padded with
    NULL sentinels (pointId 0 / DBL_MAX, PointNeighbors.h:51-53)."""
    pair = F.concat(
        F.lit("("), F.col("neighbor_id").cast("string"), F.lit(" "),
        F.format_string("%.6e", F.col("dist_sq")), F.lit(")")
    )
    per_query = (
        result.withColumn("pair", pair)
        .groupBy("input_id")
        .agg(F.reverse(F.array_sort(F.collect_list(F.struct("rank", "pair")))).alias("pairs"))
    )
    null_pair = f"(NULL {_DBL_MAX:.6e})"
    padded = F.concat(
        F.array_repeat(F.lit(null_pair), F.lit(k) - F.size("pairs")),
        F.transform("pairs", lambda s: s["pair"]),
    )
    return per_query.select(
        "input_id",
        F.concat(
            F.col("input_id").cast("string"), F.lit("\t"), F.concat_ws("", padded)
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
