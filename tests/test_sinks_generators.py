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


def test_point_file_sources_roundtrip(spark, rng, tmp_path):
    """Reference file formats (AllKnnProblem.h:158-185): binary
    count-prefixed packed structs + whitespace text. Write with the
    generator twins, read back distributed, join, oracle-match."""
    import struct

    from spark_aknn.sources import (
        read_points_any,
        read_points_bin,
        read_points_text,
        write_points_bin,
        write_points_text,
    )

    n = 500
    ids = np.arange(1, n + 1)
    x, y = rng.random(n), rng.random(n)
    pts = make_points_df(spark, ids, x, y)

    binp = str(tmp_path / "pts.bin")
    assert write_points_bin(pts, binp) == n
    # header + 24-byte stride, byte-level twin of DatasetGenerator output
    raw = open(binp, "rb").read()
    assert struct.unpack("<Q", raw[:8])[0] == n and len(raw) == 8 + 24 * n
    back = read_points_bin(spark, binp, rows_per_split=128).toPandas().sort_values("id")
    assert (back.id.to_numpy() == ids).all()
    assert (back.x.to_numpy() == x).all() and (back.y.to_numpy() == y).all()

    txtp = str(tmp_path / "pts.txt")
    write_points_text(pts, txtp)
    backt = read_points_text(spark, txtp).toPandas().sort_values("id")
    assert (backt.id.to_numpy() == ids).all()
    assert np.allclose(backt.x.to_numpy(), x, atol=1e-8)  # fixed 8-digit text

    # dispatch-by-extension + end-to-end join on loaded points == oracle
    loaded = read_points_any(spark, binp)
    got = (
        all_knn_join(loaded, loaded, k=5)
        .toPandas()
        .sort_values(["input_id", "rank"])
    )
    from spark_aknn.sweep import brute_force_topk

    eids, _ = brute_force_topk(x, y, x, y, ids, 5)
    assert (got.neighbor_id.values.reshape(-1, 5) == eids).all()


def test_bin_source_windows_layout(spark, tmp_path):
    """The reference's Windows builds write a 4-byte long id + 4 pad
    bytes at the same 24-byte stride — id_dtype='<i4' reads them."""
    import struct

    n = 10
    path = str(tmp_path / "win.bin")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(1, n + 1):
            f.write(struct.pack("<iixxxx", i, 0)[:4] + b"\x00" * 4)
            f.write(struct.pack("<dd", i / 10.0, i / 100.0))
    from spark_aknn.sources import read_points_bin

    got = read_points_bin(spark, path, id_dtype="<i4").toPandas().sort_values("id")
    assert list(got.id) == list(range(1, n + 1))
    assert np.allclose(got.x, np.arange(1, n + 1) / 10.0)


def test_text_source_space_separated(spark, tmp_path):
    """istream >> accepts ANY whitespace; the reader must too."""
    from spark_aknn.sources import read_points_text

    p = str(tmp_path / "sp.txt")
    with open(p, "w") as f:
        f.write("1 0.25 0.75\n")
        f.write("2\t0.5\t0.5\n")
        f.write("  3   0.125    0.875  \n\n")
    got = read_points_text(spark, p).toPandas().sort_values("id")
    assert list(got.id) == [1, 2, 3]
    assert list(got.x) == [0.25, 0.5, 0.125]
    assert list(got.y) == [0.75, 0.5, 0.875]


def test_points_from_phash_collision_free_ids(spark):
    """Point ids from the image corpus must be collision-free (r2
    verdict #5: xxhash64 ids birthday-collide ~10^4 times at 10^12
    images, silently merging neighbor lists). `numeric` parses the
    serialized key -> dense deterministic ids; a digitless key fails
    loudly; `rowid` is unique-by-construction for arbitrary keys."""
    import pytest

    from spark_aknn.points import points_from_phash
    from spark_aknn.tables import images_table

    imgs = images_table(spark, 64)
    pts = points_from_phash(imgs).toPandas().sort_values("id")
    assert list(pts.id) == list(range(1, 65))  # img_%012d serials are 0-based
    assert list(pts.point_key) == [f"img_{i:012d}" for i in range(64)]

    bad = spark.createDataFrame(
        [("img_007", 11), ("no-digits-here", 22)], "image_id string, phash long"
    )
    with pytest.raises(Exception, match="no trailing integer serial"):
        points_from_phash(bad).collect()

    rid = points_from_phash(bad, id_strategy="rowid").toPandas()
    assert rid.id.nunique() == 2 and (rid.id >= 1).all()
