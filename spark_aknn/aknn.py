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
                      applyInArrow(numpy windowed plane sweep; ListArray
                      top-k columns built from values+offsets, zero
                      per-row Python) -> per-query top-k + kth bound
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

import numpy as np
import pyarrow as pa
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
_STAGE1_PA = pa.schema(
    [
        ("stripe_id", pa.int32()),
        ("sub_id", pa.int32()),
        ("input_id", pa.int64()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("kth_dist_sq", pa.float64()),
        ("n_found", pa.int32()),
        ("neighbor_ids", pa.list_(pa.int64())),
        ("dist_sqs", pa.list_(pa.float64())),
        ("scanned", pa.int64()),
    ]
)
_STAGE2_SCHEMA = "input_id long, neighbor_id long, dist_sq double"
_STAGE2_PA = pa.schema(
    [("input_id", pa.int64()), ("neighbor_id", pa.int64()), ("dist_sq", pa.float64())]
)


def _np(tbl: pa.Table, col: str) -> np.ndarray:
    return tbl.column(col).to_numpy(zero_copy_only=False)


def _sorted_training(tbl: pa.Table):
    tx = _np(tbl, "x")
    order = tx.argsort(kind="stable")
    return tx[order], _np(tbl, "y")[order], _np(tbl, "id")[order]


def _list_array(flat: np.ndarray, counts: np.ndarray, typ) -> pa.ListArray:
    """O(1)-copy Arrow list column from flat values + per-row counts —
    no per-row Python objects (the reason for applyInArrow here)."""
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=typ))


def _stage1_kernel_factory(k: int):
    def kernel(key, qtbl: pa.Table, ttbl: pa.Table) -> pa.Table:
        if qtbl.num_rows == 0:
            return _STAGE1_PA.empty_table()
        qx, qy, qid = _np(qtbl, "x"), _np(qtbl, "y"), _np(qtbl, "id")
        tx, ty, tid = _sorted_training(ttbl)
        ids, dists, counts, scanned = window_topk(qx, qy, tx, ty, tid, k)
        kth = np.where(counts >= k, dists[:, k - 1], np.inf)
        # validity is positional (first n_found entries, (dist,id)-sorted);
        # NEVER test ids >= 0 — ids may be arbitrary int64 (xxhash64)
        mask = np.arange(ids.shape[1])[None, :] < counts[:, None]
        m = len(qid)
        return pa.Table.from_arrays(
            [
                pa.array(np.full(m, key[0].as_py(), dtype=np.int32)),
                pa.array(np.full(m, key[1].as_py(), dtype=np.int32)),
                pa.array(qid, type=pa.int64()),
                pa.array(qx),
                pa.array(qy),
                pa.array(kth),
                pa.array(counts, type=pa.int32()),
                _list_array(ids[mask], counts, pa.int64()),
                _list_array(dists[mask], counts, pa.float64()),
                pa.array(scanned, type=pa.int64()),
            ],
            schema=_STAGE1_PA,
        )

    return kernel


def _stage2_kernel_factory(k: int):
    def kernel(key, qtbl: pa.Table, ttbl: pa.Table) -> pa.Table:
        if qtbl.num_rows == 0 or ttbl.num_rows == 0:
            return _STAGE2_PA.empty_table()
        qx, qy = _np(qtbl, "x"), _np(qtbl, "y")
        qid = _np(qtbl, "input_id")
        cap = _np(qtbl, "kth_dist_sq")
        tx, ty, tid = _sorted_training(ttbl)
        ids, dists, counts, _ = window_topk(qx, qy, tx, ty, tid, k, cap=cap)
        mask = np.arange(ids.shape[1])[None, :] < counts[:, None]
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(qid, counts), type=pa.int64()),
                pa.array(ids[mask], type=pa.int64()),
                pa.array(dists[mask]),
            ],
            schema=_STAGE2_PA,
        )

    return kernel


def _fresh_lineage(df: DataFrame) -> DataFrame:
    """Re-project every column through an arithmetic no-op, minting new
    expression ids. Required for self-joins: cogrouping two plans that
    SHARE attribute ids trips Spark's dedup/pruning into dropping the
    right side's non-key columns (the kernels then see a key-only
    schema). Values are bit-preserved (+0 / +0.0; coordinates here are
    never -0.0)."""
    zero = {"int": F.lit(0), "bigint": F.lit(0), "double": F.lit(0.0)}
    return df.select(
        *[(F.col(c) + zero[t]).alias(c) for c, t in df.dtypes]
    )


def stage1_local_topk(input_cells: DataFrame, training_cells: DataFrame, k: int) -> DataFrame:
    return (
        input_cells.groupBy("stripe_id", "sub_id")
        .cogroup(_fresh_lineage(training_cells).groupBy("stripe_id", "sub_id"))
        .applyInArrow(_stage1_kernel_factory(k), _STAGE1_SCHEMA)
    )


def with_escape_flag(stage1: DataFrame, cells: DataFrame) -> DataFrame:
    """Flag queries whose kth-radius circle escapes their own cell —
    only those can gain candidates from other cells (the Spark analogue
    of the stripe-boundary prune dy_boundary^2 < heap.top,
    PlaneSweepStripesAlgorithm.h:77-110, generalized to rectangles).
    Broadcast join + column math; no Python, no shuffle."""
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
    return q.withColumn("escapes", escapes).drop("o_ylo", "o_yhi", "o_xlo", "o_xhi")


def build_frontier(flagged: DataFrame, cells: DataFrame, grid: Grid) -> DataFrame:
    """Escaping queries × target cells that might improve their top-k:
    target qualifies iff squared distance from the query to the cell
    rectangle is <= the stage-1 kth bound. Broadcast cell table; all
    pruning JVM-side."""
    frontier = flagged.filter(F.col("escapes")).select(
        "q_stripe", "q_sub", "input_id", "x", "y", "kth_dist_sq"
    )
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
        .cogroup(_fresh_lineage(training_cells).groupBy("stripe_id", "sub_id"))
        .applyInArrow(_stage2_kernel_factory(k), _STAGE2_SCHEMA)
    )


def _explode_ranked(flagged: DataFrame) -> DataFrame:
    """Stage-1 arrays are (dist, id)-sorted: posexplode gives final
    ranks, no shuffle."""
    return flagged.select(
        "input_id",
        F.posexplode(F.arrays_zip(F.col("neighbor_ids"), F.col("dist_sqs"))).alias("pos", "z"),
    ).select(
        "input_id",
        (F.col("pos") + 1).alias("rank"),
        F.col("z.neighbor_ids").alias("neighbor_id"),
        F.col("z.dist_sqs").alias("dist_sq"),
    )


def merge_topk(flagged_stage1: DataFrame, stage2: DataFrame, k: int) -> DataFrame:
    """Final merge, split by the escape flag:

    * non-escaping queries (the majority once stripes are sized right):
      stage-1 rows already carry final ranks — a filter, zero shuffle;
    * escaping queries: union their stage-1 candidates with stage-2
      candidates and window-rank (whole-stage-codegen, no Python) — the
      shuffle is bounded by the frontier, not the corpus.

    Equivalent of the reference's final heap drain + sort by
    (inputPointId, position) (AllKnnResultStripesParallelExternal.h:492-510).
    """
    cols = ["input_id", "rank", "neighbor_id", "dist_sq"]
    done = _explode_ranked(flagged_stage1.filter(~F.col("escapes"))).select(*cols)
    needy = _explode_ranked(flagged_stage1.filter(F.col("escapes"))).select(
        "input_id", "neighbor_id", "dist_sq"
    )
    allc = needy.unionByName(stage2)
    w = Window.partitionBy("input_id").orderBy("dist_sq", "neighbor_id")
    merged = (
        allc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*cols)
    )
    return done.unionByName(merged)


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
        # one scan: count + quantile sketch together
        from spark_aknn.grid import count_and_quantile_sketch

        n_t, sketch = count_and_quantile_sketch(training_points, "y")
        if num_stripes <= 0:
            num_stripes = auto_num_stripes(n_t, k, spark.sparkContext.defaultParallelism)
        grid = build_grid(training_points, num_stripes, salt_factor=salt_factor, sketch=sketch)
    cells = cells_df(spark, grid)
    cols = ["stripe_id", "sub_id", "id", "x", "y"]
    inp = assign_cells(input_points.select("id", "x", "y"), grid).select(*cols)
    trn = assign_cells(training_points.select("id", "x", "y"), grid).select(*cols)
    stage1 = stage1_local_topk(inp, trn, k)
    if persist:
        stage1 = stage1.persist()
    flagged = with_escape_flag(stage1, cells)
    if grid.num_stripes == 1 and not grid.x_splits:
        return merge_topk(flagged, _empty_stage2(spark), k)
    frontier = build_frontier(flagged, cells, grid)
    stage2 = stage2_exchange(frontier, trn, k)
    return merge_topk(flagged, stage2, k)


def _empty_stage2(spark) -> DataFrame:
    return spark.createDataFrame([], _STAGE2_SCHEMA)
