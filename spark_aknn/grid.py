"""Two-level grid partitioner: y-stripes, optionally x-substripes.

Level 1 re-expresses the reference's equal-count y-stripes
(/root/reference/PlaneSweepParallel/include/AllKnnResultStripesParallel.h:36-142).
Level 2 is our skew treatment ("salting"): a stripe whose training count
exceeds a threshold is sub-split on x-quantiles into substripes, each a
rectangle cell. The reference load-balances skewed stripes with dynamic
OpenMP/TBB scheduling (PlaneSweepStripesParallelAlgorithm.h:81) — on
Spark the unit of balance is the shuffle partition, so we split the data
itself. A cell is the unit of cogrouping; substripe count 1 everywhere
degenerates to the reference's pure stripe model.

The cell table is tiny (O(#cells)) and driver-resident; it is broadcast
for (a) attaching each point's cell id, (b) the boundary-exchange
frontier's rectangle-distance pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_aknn.stripes import assign_stripes, compute_splits

NEG_INF = float("-inf")
POS_INF = float("inf")


@dataclass
class Grid:
    """Stripe boundaries + per-stripe x sub-boundaries."""

    y_splits: list[float]  # [-inf, ..., +inf], len S+1
    x_splits: dict[int, list[float]] = field(default_factory=dict)  # stripe -> inner x bounds

    @property
    def num_stripes(self) -> int:
        return len(self.y_splits) - 1

    def num_subs(self, stripe: int) -> int:
        return len(self.x_splits.get(stripe, [])) + 1

    def cells(self) -> list[tuple[int, int, float, float, float, float]]:
        """(stripe_id, sub_id, ylo, yhi, xlo, xhi) for every cell."""
        out = []
        for s in range(self.num_stripes):
            ylo, yhi = self.y_splits[s], self.y_splits[s + 1]
            inner = self.x_splits.get(s, [])
            xs = [NEG_INF, *inner, POS_INF]
            for j in range(len(xs) - 1):
                out.append((s, j, ylo, yhi, xs[j], xs[j + 1]))
        return out


# sketch resolution for one-pass boundary derivation; sized so the
# auto stripe count sqrt(|T|/k) stays on the single-scan sketch path
# (exact quantiles kick in above QUANTILE_GRID/2 stripes) up to
# |T| ~ 4x10^7 at k=10 — beyond that one extra exact-quantile scan
# per grid build is noise against the join itself
QUANTILE_GRID = 4096


def count_and_quantile_sketch(df: DataFrame, col: str = "y") -> tuple[int, list[float]]:
    """ONE scan returning (row count, QUANTILE_GRID-point quantile
    sketch). Boundaries for any stripe count are then derived driver-side
    by resampling the sketch — the reference re-sorts per run
    (AllKnnResultStripes.h:52-84); we pay a single aggregate instead."""
    probs = [i / QUANTILE_GRID for i in range(1, QUANTILE_GRID)]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(col, probs, 10000).alias("qs"),
    ).collect()[0]
    return int(row["n"]), list(row["qs"] or [])


def splits_from_sketch(sketch: list[float], num_stripes: int) -> list[float]:
    """Equal-count boundaries resampled from the sketch; duplicate
    boundaries fuse (the duplicate-y rule analogue,
    AllKnnResultStripes.h:205-208)."""
    if num_stripes <= 1 or not sketch:
        return [NEG_INF, POS_INF]
    inner: list[float] = []
    m = len(sketch) + 1
    for i in range(1, num_stripes):
        q = sketch[min(len(sketch) - 1, max(0, int(round(i * m / num_stripes)) - 1))]
        if not inner or q > inner[-1]:
            inner.append(q)
    return [NEG_INF, *inner, POS_INF]


def build_grid(
    training: DataFrame,
    num_stripes: int,
    salt_factor: float = 4.0,
    max_subs: int = 32,
    relative_error: float = 0.001,
    sketch: list[float] | None = None,
) -> Grid:
    """Quantile y-splits; oversized stripes (> salt_factor * mean count)
    get x-quantile substripes sized to bring them back to ~mean.

    Scan economy: boundaries come from a quantile sketch (one scan, or
    zero if the caller passes one). The per-stripe salt-count scan runs
    ONLY when boundary fusion signals duplicate-heavy data — with all
    distinct quantiles, equal-count splits are balanced by construction.
    """
    if num_stripes >= QUANTILE_GRID // 2:
        # sketch too coarse for this stripe count — exact quantile pass
        y_splits = compute_splits(training, num_stripes, col="y", relative_error=relative_error)
        sketch = None
    else:
        if sketch is None:
            _, sketch = count_and_quantile_sketch(training, "y")
        y_splits = splits_from_sketch(sketch, num_stripes)
    grid = Grid(y_splits=y_splits)
    actual = len(y_splits) - 1
    fused = actual < min(num_stripes, QUANTILE_GRID)
    if actual <= 1 or salt_factor <= 0 or not fused:
        return grid
    striped = assign_stripes(training, y_splits, col="y", out="stripe_id")
    counts = {r["stripe_id"]: r["cnt"] for r in striped.groupBy("stripe_id").count().withColumnRenamed("count", "cnt").collect()}
    total = sum(counts.values())
    if total == 0:
        return grid
    mean = total / actual
    hot = {s: c for s, c in counts.items() if c > salt_factor * mean}
    if not hot:
        return grid
    probs_per_stripe = {s: min(max_subs, max(2, int(round(c / mean)))) for s, c in hot.items()}
    hot_df = striped.filter(F.col("stripe_id").isin(list(hot.keys())))
    # one aggregation pass: per-stripe x-quantiles via percentile_approx
    max_n = max(probs_per_stripe.values())
    probs = [i / max_n for i in range(1, max_n)]
    rows = (
        hot_df.groupBy("stripe_id")
        .agg(F.percentile_approx("x", probs, 10000).alias("qs"))
        .collect()
    )
    for row in rows:
        s = row["stripe_id"]
        n_sub = probs_per_stripe[s]
        # pick the quantiles matching this stripe's target substripe count
        want = [i / n_sub for i in range(1, n_sub)]
        qs_all = dict(zip(probs, row["qs"]))
        inner: list[float] = []
        for p in want:
            # nearest computed prob (max_n grid refines every stripe's wants)
            nearest = min(probs, key=lambda q: abs(q - p))
            v = qs_all[nearest]
            if not inner or v > inner[-1]:
                inner.append(v)
        if inner:
            grid.x_splits[s] = inner
    return grid


def cells_df(spark: SparkSession, grid: Grid) -> DataFrame:
    return spark.createDataFrame(
        grid.cells(), "stripe_id int, sub_id int, ylo double, yhi double, xlo double, xhi double"
    )


def assign_cells(df: DataFrame, grid: Grid) -> DataFrame:
    """Attach (stripe_id, sub_id) to a point DataFrame — JVM-side only:
    Bucketizer binary search for the stripe, then a broadcast join with
    the per-stripe x-boundary arrays + an ``aggregate`` fold for sub_id
    (substripe counts are small, O(#subs) per row)."""
    out = assign_stripes(df, grid.y_splits, col="y", out="stripe_id")
    if not grid.x_splits:
        return out.withColumn("sub_id", F.lit(0))
    spark = df.sparkSession
    bounds = spark.createDataFrame(
        [(s, v) for s, v in grid.x_splits.items()],
        "stripe_id int, xbounds array<double>",
    )
    out = out.join(F.broadcast(bounds), "stripe_id", "left")
    return out.withColumn(
        "sub_id",
        F.when(
            F.col("xbounds").isNull(), F.lit(0)
        ).otherwise(
            F.aggregate(
                "xbounds",
                F.lit(0),
                lambda acc, b: acc + F.when(F.col("x") >= b, F.lit(1)).otherwise(F.lit(0)),
            )
        ),
    ).drop("xbounds")
