"""Streaming layer + dataset multiplier."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_aknn.multiplier import multiply_x2, multiply_x4, sample_half
from spark_aknn.streaming import stream_tile_counts, with_event_points
from tests.conftest import SF_DIR, make_points_df


def test_multiplier(spark, rng):
    n = 200
    pts = make_points_df(spark, np.arange(1, n + 1), rng.random(n), rng.random(n))
    x4 = multiply_x4(pts).toPandas().sort_values("id").reset_index(drop=True)
    assert len(x4) == 4 * n
    assert list(x4.id) == list(range(1, 4 * n + 1))  # dense renumbering
    assert x4.x.between(0, 1).all() and x4.y.between(0, 1).all()
    # each quadrant holds exactly n points
    quad = (x4.x >= 0.5).astype(int) + 2 * (x4.y >= 0.5).astype(int)
    assert quad.value_counts().eq(n).all()
    x2 = multiply_x2(pts).toPandas()
    assert len(x2) == 2 * n and sorted(x2.id) == list(range(1, 2 * n + 1))
    h = sample_half(pts).toPandas()
    assert len(h) == n // 2 and sorted(h.id) == list(range(1, n // 2 + 1))


def test_stream_tile_counts_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # batch expectation with identical expressions
    batch = (
        stream_tile_counts(events, tiles_per_side=8, window="1 hour")
        .groupBy("tile_id")
        .agg(F.sum("n_events").alias("n"))
        .toPandas()
        .set_index("tile_id")["n"]
    )

    stream_src = spark.readStream.schema(events.schema).parquet(f"{SF_DIR}")
    # restrict the file source to the events file via schema match:
    # simpler — write events to a dedicated dir first
    src_dir = str(tmp_path / "events_src")
    events.write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = (
        stream_tile_counts(stream, tiles_per_side=8, window="1 hour")
        .writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("append")  # with watermark, append emits closed windows only
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select tile_id, sum(n_events) as n from tile_counts group by tile_id"
    ).toPandas().set_index("tile_id")["n"]
    # append mode drops windows newer than the watermark; everything
    # emitted must match the batch numbers exactly
    assert len(got) > 0
    for tid, n in got.items():
        assert batch[tid] >= n  # emitted subset
    # and completeness on closed windows: re-run in update-less complete mode
    q2 = (
        stream_tile_counts(stream, tiles_per_side=8, window="1 hour")
        .writeStream.format("memory")
        .queryName("tile_counts_all")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got_all = spark.sql(
        "select tile_id, sum(n_events) as n from tile_counts_all group by tile_id"
    ).toPandas().set_index("tile_id")["n"].sort_index()
    assert got_all.equals(batch.sort_index())


def test_event_points_deterministic(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = with_event_points(events).select("event_id", "x", "y").toPandas()
    from spark_aknn.points import lcg_numpy

    x, y = lcg_numpy(a.event_id.to_numpy())
    assert (a.x.to_numpy() == x).all() and (a.y.to_numpy() == y).all()
