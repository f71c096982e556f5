"""The all-kNN join — the engine's flagship operator.

Logical semantics (identical to the reference's single query,
/root/reference/PlaneSweepParallel/src/PlaneSweepParallel.cpp:29-398):
for every input point, the k nearest training points under squared
Euclidean distance. Output one row per (query, rank):
    (input_id, rank, neighbor_id, dist_sq), rank 1 = nearest,
ties broken by neighbor_id ascending (canonical deterministic order; the
reference only compares distances across its variants,
AllKnnResult.h:200-207, so any fixed tie rule is conformant).

Physical plan (Spark-first, two shuffles + one window):

  stage 0  grid:      quantile y-stripe boundaries (+ x-substripes for
                      skewed stripes) — small driver-side metadata
  stage 1  local kNN: cogroup input/training on cell id ->
                      applyInPandas(numpy windowed plane sweep) ->
                      per-query top-k + kth distance (upper bound)
  stage 2  exchange:  queries whose kth-radius circle escapes their cell
                      fan out to every other cell whose rectangle is
                      within kth (broadcast cell table, JVM-only
                      pruning); cogroup with training on target cell ->
                      same kernel, capped at kth
  stage 3  merge:     union stage-1/stage-2 candidates ->
                      row_number() over (input_id, dist_sq, neighbor_id)
                      <= k  (whole-stage-codegen window, no Python)

Correctness: stage-1 kth is an upper bound on the true kth distance, so
any true neighbor outside the query's own cell lies within kth of it,
is found by stage 2 in its own cell's capped top-k, and survives the
merge. This single-shot exchange replaces the reference's iterative
outward stripe walk (PlaneSweepStripesAlgorithm.h:71-112) and its
out-of-core pending-point second pass
(PlaneSweepStripesParallelExternalAlgorithm.h:183-234): on a cluster all
cells are simultaneously resident, so one shuffle suffices.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_aknn.grid import Grid, assign_cells, build_grid, cells_df
from spark_aknn.stripes import auto_num_stripes
from spark_aknn.sweep import window_topk

_STAGE1_SCHEMA = (
    "stripe_id int, sub_id int, input_id long, x double, y double, "
    "kth_dist_sq double, n_found int, "
    "neighbor_ids array<long>, dist_sqs array<double>, scanned long"
)
_STAGE2_SCHEMA = "input_id long, neighbor_id long, dist_sq double"


def _sorted_training(tpdf: pd.DataFrame):
    tx = tpdf["x"].to_numpy()
    order = tx.argsort(kind="stable")
    return tx[order], tpdf["y"].to_numpy()[order], tpdf["id"].to_numpy()[order]


def _stage1_kernel_factory(k: int):
    import numpy as np

    def kernel(key, qpdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0:
            return pd.DataFrame(
                {
                    "stripe_id": pd.Series(dtype="int32"),
                    "sub_id": pd.Series(dtype="int32"),
                    "input_id": pd.Series(dtype="int64"),
                    "x": pd.Series(dtype="float64"),
                    "y": pd.Series(dtype="float64"),
                    "kth_dist_sq": pd.Series(dtype="float64"),
                    "n_found": pd.Series(dtype="int32"),
                    "neighbor_ids": pd.Series(dtype="object"),
                    "dist_sqs": pd.Series(dtype="object"),
                    "scanned": pd.Series(dtype="int64"),
                }
            )
        qx = qpdf["x"].to_numpy()
        qy = qpdf["y"].to_numpy()
        qid = qpdf["id"].to_numpy()
        tx, ty, tid = _sorted_training(tpdf)
        ids, dists, counts, scanned = window_topk(qx, qy, tx, ty, tid, k)
        kth = np.where(counts >= k, dists[:, k - 1], np.inf)
        # valid entries are the first `count` (sorted by (dist, id));
        # NEVER test ids >= 0 — ids may be arbitrary int64 (xxhash64)
        return pd.DataFrame(
            {
                "stripe_id": np.full(len(qid), key[0], dtype=np.int32),
                "sub_id": np.full(len(qid), key[1], dtype=np.int32),
                "input_id": qid,
                "x": qx,
                "y": qy,
                "kth_dist_sq": kth,
                "n_found": counts,
                "neighbor_ids": [row[:c] for row, c in zip(ids, counts)],
                "dist_sqs": [row[:c] for row, c in zip(dists, counts)],
                "scanned": scanned,
            }
        )

    return kernel


def _stage2_kernel_factory(k: int):
    def kernel(key, qpdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(tpdf) == 0:
            return pd.DataFrame(
                {
                    "input_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "dist_sq": pd.Series(dtype="float64"),
                }
            )
        qx = qpdf["x"].to_numpy()
        qy = qpdf["y"].to_numpy()
        qid = qpdf["input_id"].to_numpy()
        cap = qpdf["kth_dist_sq"].to_numpy()
        tx, ty, tid = _sorted_training(tpdf)
        ids, dists, counts, _ = window_topk(qx, qy, tx, ty, tid, k, cap=cap)
        import numpy as np

        # valid = first `count` entries per row (ids may be any int64)
        mask = np.arange(ids.shape[1])[None, :] < counts[:, None]
        return pd.DataFrame(
            {
                "input_id": np.repeat(qid, counts),
                "neighbor_id": ids[mask],
                "dist_sq": dists[mask],
            }
        )

    return kernel


def stage1_local_topk(input_cells: DataFrame, training_cells: DataFrame, k: int) -> DataFrame:
    return (
        input_cells.groupBy("stripe_id", "sub_id")
        .cogroup(training_cells.groupBy("stripe_id", "sub_id"))
        .applyInPandas(_stage1_kernel_factory(k), _STAGE1_SCHEMA)
    )


def build_frontier(stage1: DataFrame, cells: DataFrame, grid: Grid) -> DataFrame:
    """Queries × target cells that might still improve their top-k.

    All pruning is JVM-side column math on the broadcast cell table:
    a target cell qualifies iff the squared distance from the query to
    the cell's rectangle is <= the stage-1 kth bound (the Spark analogue
    of the stripe-boundary prune dy_boundary^2 < heap.top,
    PlaneSweepStripesAlgorithm.h:77-110, generalized to rectangles).
    """
    own = cells.select(
        F.col("stripe_id").alias("q_stripe"),
        F.col("sub_id").alias("q_sub"),
        F.col("ylo").alias("o_ylo"),
        F.col("yhi").alias("o_yhi"),
        F.col("xlo").alias("o_xlo"),
        F.col("xhi").alias("o_xhi"),
    )
    q = stage1.withColumnsRenamed({"stripe_id": "q_stripe", "sub_id": "q_sub"}).join(
        F.broadcast(own), ["q_stripe", "q_sub"], "left"
    )
    r = F.sqrt(F.col("kth_dist_sq"))
    escapes = (
        (F.col("x") - r < F.col("o_xlo"))
        | (F.col("x") + r >= F.col("o_xhi"))
        | (F.col("y") - r < F.col("o_ylo"))
        | (F.col("y") + r >= F.col("o_yhi"))
        | F.col("kth_dist_sq").isNull()
        | (F.col("kth_dist_sq") == float("inf"))
    )
    frontier = q.filter(escapes).select("q_stripe", "q_sub", "input_id", "x", "y", "kth_dist_sq")

    tgt = cells.select("stripe_id", "sub_id", "ylo", "yhi", "xlo", "xhi")
    joined = frontier.crossJoin(F.broadcast(tgt)).filter(
        (F.col("stripe_id") != F.col("q_stripe")) | (F.col("sub_id") != F.col("q_sub"))
    )
    ddx = F.greatest(F.col("xlo") - F.col("x"), F.col("x") - F.col("xhi"), F.lit(0.0))
    ddy = F.greatest(F.col("ylo") - F.col("y"), F.col("y") - F.col("yhi"), F.lit(0.0))
    mindist = ddx * ddx + ddy * ddy
    return joined.filter(mindist <= F.col("kth_dist_sq")).select(
        "stripe_id", "sub_id", "input_id", "x", "y", "kth_dist_sq"
    )


def stage2_exchange(frontier: DataFrame, training_cells: DataFrame, k: int) -> DataFrame:
    return (
        frontier.groupBy("stripe_id", "sub_id")
        .cogroup(training_cells.groupBy("stripe_id", "sub_id"))
        .applyInPandas(_stage2_kernel_factory(k), _STAGE2_SCHEMA)
    )


def merge_topk(stage1: DataFrame, stage2: DataFrame, k: int) -> DataFrame:
    """Final JVM-side merge: explode stage-1 arrays, union stage-2
    candidates, window top-k. Equivalent of the reference's final heap
    drain + sort by (inputPointId, position)
    (AllKnnResultStripesParallelExternal.h:492-510), as one
    whole-stage-codegen'd window — no Python."""
    base = stage1.select(
        "input_id",
        F.explode(F.arrays_zip(F.col("neighbor_ids"), F.col("dist_sqs"))).alias("z"),
    ).select(
        "input_id",
        F.col("z.neighbor_ids").alias("neighbor_id"),
        F.col("z.dist_sqs").alias("dist_sq"),
    )
    allc = base.unionByName(stage2)
    w = Window.partitionBy("input_id").orderBy("dist_sq", "neighbor_id")
    return (
        allc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("input_id", "rank", "neighbor_id", "dist_sq")
    )


def all_knn_join(
    input_points: DataFrame,
    training_points: DataFrame,
    k: int = 10,
    num_stripes: int = 0,
    grid: Grid | None = None,
    salt_factor: float = 4.0,
    persist: bool = True,
) -> DataFrame:
    """All-kNN join: (id,x,y) x (id,x,y) -> (input_id, rank, neighbor_id, dist_sq).

    num_stripes=0 picks round(sqrt(|T|)/sqrt(k)) like the reference
    (AllKnnResultStripes.h:141-151).
    """
    spark = input_points.sparkSession
    if grid is None:
        if num_stripes <= 0:
            num_stripes = auto_num_stripes(
                training_points.count(), k, spark.sparkContext.defaultParallelism
            )
        grid = build_grid(training_points, num_stripes, salt_factor=salt_factor)
    cells = cells_df(spark, grid)
    cols = ["stripe_id", "sub_id", "id", "x", "y"]
    inp = assign_cells(input_points.select("id", "x", "y"), grid).select(*cols)
    trn = assign_cells(training_points.select("id", "x", "y"), grid).select(*cols)
    stage1 = stage1_local_topk(inp, trn, k)
    if persist:
        stage1 = stage1.persist()
    if grid.num_stripes == 1 and not grid.x_splits:
        return merge_topk(stage1, _empty_stage2(spark), k)
    frontier = build_frontier(stage1, cells, grid)
    stage2 = stage2_exchange(frontier, trn, k)
    return merge_topk(stage1, stage2, k)


def _empty_stage2(spark) -> DataFrame:
    return spark.createDataFrame([], _STAGE2_SCHEMA)
