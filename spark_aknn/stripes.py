"""Stripe partitioner — range partitioning on y with equal-count boundaries.

Reference semantics being re-expressed (NOT ported):
  * equal-count y-stripes with half-open [minY, maxY) ranges
    (/root/reference/PlaneSweepParallel/include/AllKnnResultStripesParallel.h:36-142,
    boundary sentinels :103-104);
  * optional "split by training" — boundaries computed on the training
    set instead of the input set (AllKnnResultStripes.h:317-423);
  * auto stripe count numStripes = round(sqrt(|T|)/sqrt(k))
    (AllKnnResultStripes.h:141-151).

Spark-first design notes:
  * Boundaries are computed with ``approxQuantile`` — at 100 TB an exact
    equal-count split would itself be a full sort; approximate boundaries
    are safe because the boundary-exchange stage (exchange.py) makes the
    join result correct for ANY partitioning. Boundaries only steer
    balance, not correctness (the reference needs its exact duplicate-y
    fusion rule only because its stripes must reproduce bit-equal
    outputs across variants; our differential tests cover that instead).
  * Stripe assignment uses pyspark.ml Bucketizer: JVM-side binary search
    per row (O(log S)), no Python, works for the 3 columns we bucketize
    (y, y-r, y+r) with one shared splits array.
"""

from __future__ import annotations

import math

from pyspark.ml.feature import Bucketizer
from pyspark.sql import DataFrame

NEG_INF = float("-inf")
POS_INF = float("inf")


def auto_num_stripes(training_count: int, k: int, parallelism: int = 32) -> int:
    """Auto stripe count = round(sqrt(|T|/k)), the reference's own
    formula (AllKnnResultStripes.h:141-151), floored at the parallelism
    level so every core gets work.

    This makes stripe height ~ the expected kth-neighbor radius
    sqrt(k/(pi*|T|)). Round 1 shipped a /3 retune (taller stripes →
    fewer escaping queries → less exchange shuffle), but the committed
    sweep (BENCH/STRIPES.md, run_sustripes8M.cmd twin) measured the
    reference formula ~2.4x FASTER at n=2x10^6 on local[32]: the
    stage-1 kernel's window width — and with it the dominant
    distance-evaluation count — grows with cell size, while the
    exchange is kth-capped and cheap. More, smaller cells also load-
    balance better. At cluster scale the exchange is one extra shuffle
    of O(n) rows — same order as the input scan, still not the
    bottleneck. Correctness never depends on S (boundary exchange is
    exact for any grid)."""
    if training_count <= 0 or k <= 0:
        return 1
    s = int(round(math.sqrt(training_count / k)))
    return max(1, min(training_count, max(parallelism, s)))


def compute_splits(
    df: DataFrame,
    num_stripes: int,
    col: str = "y",
    relative_error: float = 0.001,
) -> list[float]:
    """Equal-count quantile boundaries on ``col``; returns a strictly
    increasing Bucketizer splits array [-inf, b1..b_{S-1}, +inf].

    Duplicate quantile values are fused (the analogue of the reference's
    duplicate-y rule, AllKnnResultStripes.h:205-208): a run of equal
    boundaries collapses to one, so heavily duplicated y values land in
    a single (possibly oversized) stripe, which AQE skew handling and
    the kernel's internal chunking then absorb.
    """
    if num_stripes <= 1:
        return [NEG_INF, POS_INF]
    probs = [i / num_stripes for i in range(1, num_stripes)]
    qs = df.approxQuantile(col, probs, relative_error)
    inner: list[float] = []
    for q in qs:
        if not inner or q > inner[-1]:
            inner.append(q)
    return [NEG_INF, *inner, POS_INF]


def assign_stripes(df: DataFrame, splits: list[float], col: str = "y", out: str = "stripe_id") -> DataFrame:
    """Add an integer stripe id via JVM-side binary search (Bucketizer).

    Bucket i covers [splits[i], splits[i+1]) — the reference's half-open
    stripe ranges (AllKnnResultStripesParallel.h:103-113).
    """
    from pyspark.sql import functions as F

    if len(splits) == 2:
        return df.withColumn(out, F.lit(0))
    bucketizer = Bucketizer(splits=splits, inputCol=col, outputCol=out + "__d")
    return (
        bucketizer.transform(df)
        .withColumn(out, F.col(out + "__d").cast("int"))
        .drop(out + "__d")
    )


def assign_stripes_multi(
    df: DataFrame, splits: list[float], cols: list[str], outs: list[str]
) -> DataFrame:
    """Bucketize several columns against the same splits in one pass
    (used by the boundary exchange for y-r / y+r range ends)."""
    from pyspark.sql import functions as F

    if len(splits) == 2:
        for o in outs:
            df = df.withColumn(o, F.lit(0))
        return df
    bucketizer = Bucketizer(
        splitsArray=[splits] * len(cols),
        inputCols=cols,
        outputCols=[o + "__d" for o in outs],
    )
    df = bucketizer.transform(df)
    for o in outs:
        df = df.withColumn(o, F.col(o + "__d").cast("int")).drop(o + "__d")
    return df


def num_stripes_of(splits: list[float]) -> int:
    return len(splits) - 1
