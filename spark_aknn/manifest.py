"""Per-partition lineage + checkpoint manifests with resume.

Re-expresses the reference's out-of-core bookkeeping on Spark terms:
the external algorithm packs stripes into memory-budget windows and
commits finished queries per window
(/root/reference/PlaneSweepParallel/include/AllKnnResultStripesParallelExternal.h:142-287
GetWindow, :376-485 CommitWindow); its stripe debug sink records
per-stripe boundaries/counts (AllKnnResultStripes.h:158-179). Here a
*batch of stripes* plays the window's role: each batch is one Spark job
whose stage-1 output lands in its own parquet directory plus an
atomically-renamed JSON manifest carrying per-stripe lineage (boundaries,
input/training counts, rows emitted, scanned-candidate stats, wall
time). A restarted run finds the manifests and skips completed batches —
no recomputation of committed stripes, the north-rule resume property.

Spark (not the reference's windows) handles memory: each batch job
spills/shuffles natively; batching exists purely for commit granularity.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_aknn.aknn import (
    build_frontier,
    merge_topk,
    stage1_local_topk,
    stage2_exchange,
    with_escape_flag,
)
from spark_aknn.grid import Grid, assign_cells, assign_cells_margin, build_grid, cells_df
from spark_aknn.stripes import auto_num_stripes


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def _grid_path(workdir: str) -> str:
    return os.path.join(workdir, "grid.json")


def save_grid(workdir: str, grid: Grid, params: dict | None = None) -> None:
    _write_json_atomic(
        _grid_path(workdir),
        {
            "y_splits": grid.y_splits,
            "x_splits": {str(k): v for k, v in grid.x_splits.items()},
            "params": params or {},
        },
    )


def load_grid(workdir: str, params: dict | None = None) -> Grid | None:
    """Load a committed grid; when ``params`` is given, validate it
    against the parameters the workdir was committed under and fail
    loudly on ANY mismatch (r3 ADVICE medium): stage-1 batches written
    under one (k, margin_factor, num_batches) are NOT reusable under
    another — resuming them would certify queries against margin bounds
    whose replicated training was never present, silently producing
    wrong neighbor lists. A pre-params workdir (older layout) is treated
    as mismatching for the same reason.
    """
    p = _grid_path(workdir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        raw = json.load(f)
    if params is not None:
        committed = raw.get("params")
        if committed != params:
            raise ValueError(
                f"checkpoint workdir {workdir!r} was committed with params "
                f"{committed!r} but this run requests {params!r}; stage-1 "
                "batches are not reusable across differing k/margin_factor/"
                "num_batches — use a fresh workdir (or delete this one)"
            )
    return Grid(
        y_splits=[float(v) for v in raw["y_splits"]],
        x_splits={int(k): v for k, v in raw["x_splits"].items()},
    )


def checkpointed_aknn(
    spark: SparkSession,
    input_points: DataFrame,
    training_points: DataFrame,
    workdir: str,
    k: int = 10,
    num_stripes: int = 0,
    num_batches: int = 4,
    salt_factor: float = 4.0,
    margin_factor: float = 0.9,
) -> DataFrame:
    """All-kNN join with per-batch checkpoint/resume under ``workdir``.

    Layout: grid.json, stage1/batch=<b>/ (+ manifest_b.json),
    result/ (+ manifest_final.json). Re-running with the same workdir
    skips every batch whose manifest exists.
    """
    os.makedirs(workdir, exist_ok=True)
    # every parameter that changes what a committed stage-1 batch MEANS;
    # validated against the workdir on resume (r3 ADVICE medium)
    params = {
        "k": k,
        "num_stripes_requested": num_stripes,
        "num_batches": num_batches,
        "salt_factor": salt_factor,
        "margin_factor": margin_factor,
    }
    grid = load_grid(workdir, params=params)
    if grid is None:
        from spark_aknn.grid import count_and_extent, quantile_sketch, sketch_resolution

        n_t, x_extent = count_and_extent(training_points)
        if num_stripes <= 0:
            num_stripes = auto_num_stripes(n_t, k, spark.sparkContext.defaultParallelism)
        sketch = quantile_sketch(training_points, "y", sketch_resolution(num_stripes))
        grid = build_grid(
            training_points,
            num_stripes,
            salt_factor=salt_factor,
            sketch=sketch,
            k=k,
            x_extent=x_extent,
            margin_factor=margin_factor,
            n_total=n_t,
        )
        save_grid(workdir, grid, params=params)

    cols = ["stripe_id", "sub_id", "id", "x", "y"]
    inp = assign_cells(input_points.select("id", "x", "y"), grid).select(*cols)
    trn = assign_cells(training_points.select("id", "x", "y"), grid).select(*cols)
    # margin-replicated copy for stage 1 (cell-complete per batch: a
    # replica's batch is decided by its TARGET stripe, so every batch
    # job carries its own cells' full margin)
    trn_s1 = (
        assign_cells_margin(training_points.select("id", "x", "y"), grid, margin_factor)
        .select(*cols)
        if margin_factor > 0
        else trn
    )

    for b in range(num_batches):
        mpath = os.path.join(workdir, f"manifest_stage1_{b}.json")
        if os.path.exists(mpath):
            continue  # committed by a previous run — resume skips it
        t0 = time.time()
        sel = F.pmod(F.col("stripe_id"), F.lit(num_batches)) == b
        out = stage1_local_topk(inp.filter(sel), trn_s1.filter(sel), k)
        path = os.path.join(workdir, f"stage1/batch={b}")
        out.write.mode("overwrite").parquet(path)
        stats = (
            spark.read.parquet(path)
            .groupBy("stripe_id", "sub_id")
            .agg(
                F.count(F.lit(1)).alias("n_queries"),
                F.sum("scanned").alias("scanned_total"),
                F.max("scanned").alias("scanned_max"),
                F.sum(F.size("neighbor_ids")).alias("neighbors_emitted"),
            )
            .collect()
        )
        _write_json_atomic(
            mpath,
            {
                "batch": b,
                "path": path,
                "wall_sec": time.time() - t0,
                "stripes": [
                    {
                        **r.asDict(),
                        "ylo": grid.y_splits[r["stripe_id"]],
                        "yhi": grid.y_splits[r["stripe_id"] + 1],
                    }
                    for r in stats
                ],
            },
        )

    stage1 = spark.read.parquet(os.path.join(workdir, "stage1"))
    final_manifest = os.path.join(workdir, "manifest_final.json")
    result_path = os.path.join(workdir, "result")
    if not os.path.exists(final_manifest):
        t0 = time.time()
        cells = cells_df(spark, grid, margin_factor=margin_factor)
        flagged = with_escape_flag(stage1, cells)
        frontier = build_frontier(flagged, cells, grid)
        touched = frontier.select("stripe_id", "sub_id").distinct()
        trn_s2 = trn.join(F.broadcast(touched), ["stripe_id", "sub_id"], "left_semi")
        stage2 = stage2_exchange(frontier, trn_s2, k)
        result = merge_topk(flagged, stage2, k, dedup=margin_factor > 0)
        result.write.mode("overwrite").parquet(result_path)
        n = spark.read.parquet(result_path).count()
        _write_json_atomic(
            final_manifest,
            {"path": result_path, "rows": n, "wall_sec": time.time() - t0, "k": k},
        )
    return spark.read.parquet(result_path)
