"""Golden text sink + deterministic point generators."""

from __future__ import annotations

import glob

import numpy as np

from spark_aknn.aknn import all_knn_join
from spark_aknn.point_tables import clustered_points, uniform_points, zipf_points
from spark_aknn.sinks import save_reference_format, to_reference_lines
from spark_aknn.sweep import brute_force_topk
from tests.conftest import make_points_df


def test_reference_text_sink(spark, rng, tmp_path):
    n, k = 40, 5
    x, y = rng.random(n), rng.random(n)
    ids = np.arange(1, n + 1)
    pts = make_points_df(spark, ids, x, y)
    res = all_knn_join(pts, pts, k=k)
    lines = to_reference_lines(res, k).orderBy("input_id").toPandas()
    assert len(lines) == n
    first = lines.iloc[0].line
    assert first.startswith("1\t(")
    # descending distance order within the line
    import re

    dists = [float(v) for v in re.findall(r" ([0-9.e+-]+)\)", first)]
    assert dists == sorted(dists, reverse=True)
    assert len(dists) == k
    path = str(tmp_path / "golden")
    save_reference_format(res, k, path)
    out = sorted(glob.glob(f"{path}/part-*"))
    body = open(out[0]).read().strip().splitlines()
    assert len(body) == n


def test_reference_sink_null_padding(spark, rng, tmp_path):
    """|T| < k -> NULL sentinel pairs lead the line (max-heap pop order,
    AllKnnResult.h:147-154)."""
    pts = make_points_df(spark, [1, 2], rng.random(2), rng.random(2))
    trn = make_points_df(spark, [9], [0.5], [0.5])
    res = all_knn_join(pts, trn, k=4)
    lines = to_reference_lines(res, 4).orderBy("input_id").toPandas()
    assert lines.iloc[0].line.count("(NULL") == 3
    assert lines.iloc[0].line.index("(NULL") < lines.iloc[0].line.index("(9 ")


def test_reference_sink_byte_format(spark):
    """Byte-exact twin of the reference writer: '\\t(' before EVERY pair
    (AllKnnResult.h:149), default-ostream 6-significant-digit distances,
    NULL sentinel printed as DBL_MAX (PointNeighbors.h:51)."""
    res = spark.createDataFrame(
        [(7, 1, 12, 0.00012345678), (7, 2, 3, 0.25), (7, 3, 5, 2.0)],
        "input_id long, rank int, neighbor_id long, dist_sq double",
    )
    line = to_reference_lines(res, 4).toPandas().iloc[0].line
    # C++ twin: printf-%g of each distance, heap pop order (sentinel
    # first, then descending distance)
    assert line == (
        "7\t(NULL %g)\t(5 %g)\t(3 %g)\t(12 %g)"
        % (1.7976931348623157e308, 2.0, 0.25, 0.00012345678)
    )
    assert "(NULL 1.79769e+308)" in line
    assert "(12 0.000123457)" in line  # 6 sig digits, zeros stripped


def test_generators_deterministic_and_shaped(spark):
    u1 = uniform_points(spark, 500).toPandas().sort_values("id")
    u2 = uniform_points(spark, 500, num_partitions=7).toPandas().sort_values("id")
    assert (u1.x.values == u2.x.values).all()  # partitioning-independent

    c = clustered_points(spark, 2000, num_clusters=4, spread=0.01).toPandas()
    assert c.x.between(0, 1).all() and c.y.between(0, 1).all()
    # clustered: every point within a few spreads of one of the 4 centers
    from spark_aknn.points import lcg_numpy

    centers_x, _ = lcg_numpy(np.arange(4) * 7919)
    _, centers_y = lcg_numpy(np.arange(4) * 104729)
    d = np.sqrt(
        (c.x.to_numpy()[:, None] - np.clip(centers_x, 0, 1)[None, :]) ** 2
        + (c.y.to_numpy()[:, None] - np.clip(centers_y, 0, 1)[None, :]) ** 2
    ).min(axis=1)
    assert (d < 0.05).mean() > 0.99

    z = zipf_points(spark, 2000).toPandas()
    assert z.y.between(0, 1).all()
    assert (z.y < 0.01).mean() > 0.5  # heavy head

    # end-to-end: engine exact on the clustered family too
    ids = c.id.to_numpy()
    got = (
        all_knn_join(
            make_points_df(spark, ids, c.x.to_numpy(), c.y.to_numpy()),
            make_points_df(spark, ids, c.x.to_numpy(), c.y.to_numpy()),
            k=5,
        )
        .toPandas()
        .sort_values(["input_id", "rank"])
    )
    order = np.argsort(ids)
    eids, ed = brute_force_topk(
        c.x.to_numpy()[order], c.y.to_numpy()[order],
        c.x.to_numpy(), c.y.to_numpy(), ids, 5,
    )
    assert (got.neighbor_id.values.reshape(-1, 5) == eids).all()
