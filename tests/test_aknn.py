"""All-kNN join correctness vs the numpy brute-force oracle.

Mirrors the reference's differential-testing methodology
(/root/reference/PlaneSweepParallel/src/PlaneSweepParallel.cpp:353-398:
every algorithm variant compared distance-by-distance against the brute
force result), plus the edge-case fixtures from FIXTURES.md: duplicate
coordinates, exact distance ties, |T| < k, empty stripes, k=1.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_aknn.aknn import all_knn_join
from spark_aknn.grid import Grid, build_grid
from spark_aknn.sweep import brute_force_topk, window_topk
from tests.conftest import make_points_df


def _check(spark, qids, qx, qy, tids, tx, ty, k, **kw):
    inp = make_points_df(spark, qids, qx, qy)
    trn = make_points_df(spark, tids, tx, ty)
    got = (
        all_knn_join(inp, trn, k=k, **kw)
        .toPandas()
        .sort_values(["input_id", "rank"])
        .reset_index(drop=True)
    )
    order = np.argsort(qids)
    exp_ids, exp_d = brute_force_topk(
        np.asarray(qx)[order], np.asarray(qy)[order],
        np.asarray(tx, dtype=float), np.asarray(ty, dtype=float),
        np.asarray(tids), k,
    )
    exp_rows = int((exp_ids >= 0).sum())
    assert len(got) == exp_rows
    # reshape per query, tolerating underfull results
    gi = iter(range(len(got)))
    for qi, qid in enumerate(np.asarray(qids)[order]):
        n_exp = int((exp_ids[qi] >= 0).sum())
        for r in range(n_exp):
            row = got.iloc[next(gi)]
            assert row.input_id == qid
            assert row["rank"] == r + 1
            assert row.neighbor_id == exp_ids[qi, r], (qid, r)
            assert row.dist_sq == exp_d[qi, r], (qid, r)


def _uniform(rng, n, lo=0.0, hi=1.0):
    return lo + (hi - lo) * rng.random(n)


def test_self_join_matches_oracle(spark, rng):
    n = 500
    x, y = _uniform(rng, n), _uniform(rng, n)
    ids = np.arange(1, n + 1)
    _check(spark, ids, x, y, ids, x, y, k=10)


def test_two_table_join(spark, rng):
    nq, nt = 200, 800
    _check(
        spark,
        np.arange(1, nq + 1), _uniform(rng, nq), _uniform(rng, nq),
        np.arange(1, nt + 1), _uniform(rng, nt), _uniform(rng, nt),
        k=7,
    )


def test_invariant_under_stripe_count(spark, rng):
    """Result must not depend on physical partitioning — the analogue of
    the reference's cross-variant comparison."""
    n = 300
    x, y = _uniform(rng, n), _uniform(rng, n)
    ids = np.arange(1, n + 1)
    for stripes in (1, 3, 17):
        _check(spark, ids, x, y, ids, x, y, k=5, num_stripes=stripes)


def test_salted_grid_matches(spark, rng):
    """Skewed y (80% of mass at exactly y=0.5, the duplicate-y edge case:
    quantile boundaries fuse, leaving one hot stripe) -> salting path."""
    n = 600
    y = np.where(rng.random(n) < 0.8, 0.5, rng.random(n))
    x = _uniform(rng, n)
    ids = np.arange(1, n + 1)
    inp = make_points_df(spark, ids, x, y)
    grid = build_grid(inp, 8, salt_factor=1.5)
    assert grid.x_splits, "expected substripes for the hot stripe"
    _check(spark, ids, x, y, ids, x, y, k=5, grid=grid)


def test_exact_split_error_tracks_stripe_count(spark, rng):
    """build_grid's exact-quantile fallback (sketch too coarse for the
    stripe count) must tighten approxQuantile's relative error below
    1/num_stripes, or adjacent boundary queries return the same sample
    and boundaries spuriously fuse whenever eps > 1/S — independent of
    n (measured at n=64M/S=2530 with the old fixed 1e-3: 1114 of 2530
    stripes survived on a UNIFORM corpus)."""
    n, stripes = 100_000, 2000
    ids = np.arange(1, n + 1)
    x, y = _uniform(rng, n), _uniform(rng, n)
    pts = make_points_df(spark, ids, x, y)
    # a deliberately too-coarse sketch forces the exact-quantile path
    coarse = [i / 100 for i in range(1, 100)]
    grid = build_grid(pts, stripes, salt_factor=0, sketch=coarse)
    assert grid.num_stripes >= 0.95 * stripes, (
        f"boundary fusion on uniform data: {grid.num_stripes}/{stripes}"
    )


def test_clustered_zipf_differential(spark):
    """The synthetic-campaign families (tools/run_synthetic.py) at small
    n against the brute-force oracle — clustered-quantized (duplicate-
    heavy: salting MUST arm, as the campaign asserts at 8M) and zipf
    (heavy-tailed y), at k=10 and the reference's k=30
    (run_syntheticdata3.cmd:1)."""
    from spark_aknn.grid import count_and_quantile_sketch
    from spark_aknn.point_tables import clustered_points, zipf_points
    from spark_aknn.stripes import auto_num_stripes

    # quantize=1 at n=800 plays the role 3 decimals play at the 8M
    # campaign: per-distinct-y counts must exceed the stripe target for
    # boundaries to fuse, and the zipf cluster skew concentrates mass
    # so a fused stripe clears the salt threshold (fusion + a hot
    # stripe is what arms salting)
    for family, maker in (
        (
            "clustered",
            lambda: clustered_points(spark, 800, num_clusters=8, quantize=1, skew="zipf"),
        ),
        ("zipf", lambda: zipf_points(spark, 800)),
    ):
        pts = maker()
        pdf = pts.toPandas().sort_values("id")
        ids = pdf.id.to_numpy()
        x, y = pdf.x.to_numpy(), pdf.y.to_numpy()
        for k in (10, 30):
            n_t, sketch, xe = count_and_quantile_sketch(pts, "y")
            stripes = auto_num_stripes(n_t, k, 8)
            grid = build_grid(pts, stripes, salt_factor=1.5, sketch=sketch)
            if family == "clustered":
                assert grid.x_splits, "quantized clusters must fuse + salt"
            _check(spark, ids, x, y, ids, x, y, k=k, grid=grid)
            # anisotropy-merged grid (what all_knn_join builds by
            # default): exactness must hold for it too
            merged = build_grid(
                pts, stripes, salt_factor=1.5, sketch=sketch,
                k=k, x_extent=xe, n_total=n_t,
            )
            if merged.y_splits != grid.y_splits:
                _check(spark, ids, x, y, ids, x, y, k=k, grid=merged)


def test_zipf_anisotropy_merge_bounds_escapes(spark):
    """Heavy-tailed y (the zipf campaign family): without the anisotropy
    merge, equal-count stripes in the dense band are far thinner than
    the 2-D kth radius, so the 0.9x-height margin cannot contain the kth
    circle — measured at n=10^6: 78.9% of queries escaped and the
    frontier exploded to 38.9M rows (~49 target stripes per escaping
    query), turning the 8M campaign's stage 2 into an hour-long sort
    spill. The merged grid (splits_from_sketch with k/x_extent) must
    keep the escape fraction ~zero; exactness is grid-independent and
    covered by test_clustered_zipf_differential."""
    from spark_aknn.aknn import stage1_local_topk, with_escape_flag
    from spark_aknn.grid import (
        assign_cells,
        assign_cells_margin,
        cells_df,
        count_and_quantile_sketch,
    )
    from spark_aknn.point_tables import zipf_points
    from spark_aknn.stripes import auto_num_stripes

    n = 50_000
    pts = zipf_points(spark, n).persist()
    nt, sk, xe = count_and_quantile_sketch(pts)
    s0 = auto_num_stripes(nt, 10, 8)
    plain = build_grid(pts, s0, sketch=sk)
    merged = build_grid(pts, s0, sketch=sk, k=10, x_extent=xe, n_total=nt)
    assert merged.num_stripes < plain.num_stripes  # the merge fired

    def escape_frac(grid):
        cells = cells_df(spark, grid, margin_factor=0.9)
        cols = ["stripe_id", "sub_id", "id", "x", "y"]
        inp = assign_cells(pts.select("id", "x", "y"), grid).select(*cols)
        trn = assign_cells_margin(pts.select("id", "x", "y"), grid, 0.9).select(*cols)
        s1 = stage1_local_topk(inp, trn, 10)
        return with_escape_flag(s1, cells).filter("escapes").count() / n

    assert escape_frac(merged) < 0.05
    assert escape_frac(plain) > 0.3  # the failure mode the merge exists for
    pts.unpersist()


def test_training_smaller_than_k(spark, rng):
    """|T| < k: underfull results, no sentinel rows in canonical output
    (the reference pads with NULL sentinels in its text sink,
    AllKnnResult.h:147-154; our parquet-canonical form omits them)."""
    _check(
        spark,
        np.arange(1, 21), _uniform(rng, 20), _uniform(rng, 20),
        np.arange(1, 4), _uniform(rng, 3), _uniform(rng, 3),
        k=10,
    )


def test_exact_ties_break_by_id(spark):
    """Four equidistant neighbors, k=2 -> lowest ids win."""
    qx, qy = [0.5], [0.5]
    tx = [0.4, 0.6, 0.5, 0.5]
    ty = [0.5, 0.5, 0.4, 0.6]
    _check(spark, [1], qx, qy, [10, 20, 30, 40], tx, ty, k=2)


def test_duplicate_coordinates(spark, rng):
    """Many points at identical coordinates spanning stripe boundaries."""
    n = 120
    x = np.repeat(_uniform(rng, 12), 10)
    y = np.repeat(_uniform(rng, 12), 10)
    ids = np.arange(1, n + 1)
    _check(spark, ids, x, y, ids, x, y, k=15, num_stripes=5)


def test_duplicate_run_precap(spark, rng):
    """Runs of duplicates LONGER than k: the kernel's pre-cap
    (_sorted_training) trims each exact coordinate to its k smallest
    ids — provably exact under the (dist, id) tie rule — and the join
    still matches brute force on the FULL set."""
    from spark_aknn.aknn import _sorted_training
    import pyarrow as pa

    # kernel-level: 3 coordinates x 40 dupes, shuffled ids
    xs = np.repeat([0.2, 0.2, 0.7], 40)
    ys = np.repeat([0.3, 0.9, 0.5], 40)
    ids = rng.permutation(120).astype(np.int64) + 1
    tbl = pa.table({"x": xs, "y": ys, "id": ids})
    cx, cy, cid = _sorted_training(tbl, k=5)
    assert len(cx) == 15  # 3 coords x 5 kept
    for x0, y0 in {(0.2, 0.3), (0.2, 0.9), (0.7, 0.5)}:
        kept = np.sort(cid[(cx == x0) & (cy == y0)])
        full = np.sort(ids[(xs == x0) & (ys == y0)])[:5]
        assert (kept == full).all()
    # end-to-end: duplicate runs of 40 >> k=5, must still be exact
    n = 200
    x = np.repeat(_uniform(rng, 5), 40)
    y = np.repeat(_uniform(rng, 5), 40)
    pids = np.arange(1, n + 1)
    _check(spark, pids, x, y, pids, x, y, k=5, num_stripes=4)


def test_negative_int64_ids(spark, rng):
    """Regression: ids are arbitrary int64 (e.g. xxhash64 of image ids),
    roughly half negative — padding must not be confused with real ids."""
    n = 400
    x, y = _uniform(rng, n), _uniform(rng, n)
    ids = rng.integers(-(2**62), 2**62, n).astype(np.int64)
    got = (
        all_knn_join(make_points_df(spark, ids, x, y), make_points_df(spark, ids, x, y), k=10)
        .toPandas()
    )
    assert len(got) == n * 10
    exp_ids, exp_d = brute_force_topk(x[np.argsort(ids)], y[np.argsort(ids)], x, y, ids, 10)
    got = got.sort_values(["input_id", "rank"]).reset_index(drop=True)
    assert (got.neighbor_id.values.reshape(-1, 10) == exp_ids).all()
    assert (got.dist_sq.values.reshape(-1, 10) == exp_d).all()


def test_k1_and_single_point(spark):
    _check(spark, [1, 2], [0.1, 0.9], [0.1, 0.9], [7], [0.5], [0.5], k=1)


def test_empty_stripes(spark, rng):
    """Training confined to a narrow band -> most stripes have no
    training points; queries everywhere must still find true neighbors."""
    nq, nt = 100, 50
    qx, qy = _uniform(rng, nq), _uniform(rng, nq)
    tx = _uniform(rng, nt)
    ty = 0.45 + 0.1 * rng.random(nt)
    grid = Grid(y_splits=[-np.inf, 0.2, 0.4, 0.6, 0.8, np.inf])
    _check(
        spark,
        np.arange(1, nq + 1), qx, qy,
        np.arange(1, nt + 1), tx, ty,
        k=5, grid=grid,
    )


def test_window_topk_kernel_matches_brute(rng):
    """Kernel-level property test, no Spark: random sizes/duplicates."""
    for trial in range(20):
        n = int(rng.integers(1, 200))
        m = int(rng.integers(1, 50))
        k = int(rng.integers(1, 12))
        tx = np.sort(np.round(rng.random(n), 2))  # rounding forces duplicates
        ty = np.round(rng.random(n), 2)
        tid = rng.permutation(n).astype(np.int64) + 1
        qx, qy = rng.random(m), rng.random(m)
        ids, d, counts, _ = window_topk(qx, qy, tx, ty, tid, k)
        eids, ed = brute_force_topk(qx, qy, tx, ty, tid, k)
        assert (ids == eids).all(), trial
        assert (d[ids >= 0] == ed[eids >= 0]).all(), trial


def test_window_topk_cap(rng):
    """cap keeps candidates with dist <= cap (inclusive) and nothing above."""
    n = 300
    tx = np.sort(rng.random(n))
    ty = rng.random(n)
    tid = np.arange(1, n + 1)
    qx, qy = rng.random(10), rng.random(10)
    _, d_all, _, _ = window_topk(qx, qy, tx, ty, tid, 20)
    cap = d_all[:, 5].copy()  # exactly the 6th distance -> inclusive bound
    ids, d, counts, _ = window_topk(qx, qy, tx, ty, tid, 20, cap=cap)
    for i in range(10):
        kept = d[i][ids[i] >= 0]
        assert (kept <= cap[i]).all()
        assert counts[i] == (d_all[i] <= cap[i]).sum()


def test_clustered_data(spark, rng):
    """Clustered (Gaussian-blob) distribution — the reference's `sc*`
    benchmark family (run_sc125K.cmd). Exercises uneven stripe density."""
    centers = rng.random((8, 2))
    pick = rng.integers(0, 8, 500)
    x = np.clip(centers[pick, 0] + rng.normal(0, 0.01, 500), 0, 0.999999)
    y = np.clip(centers[pick, 1] + rng.normal(0, 0.01, 500), 0, 0.999999)
    ids = np.arange(1, 501)
    _check(spark, ids, x, y, ids, x, y, k=10)


def test_zipf_skew(spark, rng):
    """Zipf-skewed y (reference's syntheticdata runs) — heavy mass near
    one value; exercises fused boundaries + salting + AQE paths."""
    z = rng.zipf(1.5, 800).astype(float)
    y = np.minimum(z / z.max(), 1.0) * 0.001  # crush most mass into a thin band
    x = rng.random(800)
    ids = np.arange(1, 801)
    _check(spark, ids, x, y, ids, x, y, k=7, num_stripes=10)


def test_split_on_input_matches_training(spark, rng):
    """splitByT twin (AllKnnResultStripes.h:317-423): boundaries from the
    input side must produce identical results — and on the unbalanced
    two-table shape (queries confined to a thin y-band), the boundary
    placement actually differs between the two modes."""
    nq, nt = 60, 900
    qx, qy = _uniform(rng, nq), _uniform(rng, nq, 0.4, 0.6)
    tx, ty = _uniform(rng, nt), _uniform(rng, nt)
    qids, tids = np.arange(1, nq + 1), np.arange(1, nt + 1)
    _check(spark, qids, qx, qy, tids, tx, ty, k=5, split_on="input")
    _check(spark, qids, qx, qy, tids, tx, ty, k=5, split_on="training")


def test_stage1_cache_released(spark, rng):
    """Repeated all_knn_join calls must not accumulate cached stage-1
    DataFrames (VERDICT r01: persist() leak)."""
    from spark_aknn.aknn import release_cached

    jsc = spark.sparkContext._jsc
    n = 80
    ids = np.arange(1, n + 1)
    for _ in range(3):
        x, y = rng.random(n), rng.random(n)
        pts = make_points_df(spark, ids, x, y)
        all_knn_join(pts, pts, k=3).count()
        # one join holds at most TWO bounded caches (stage-1 + its tiny
        # escaping subset); the invariant is no growth across calls
        assert jsc.getPersistentRDDs().size() <= 2
    release_cached()
    assert jsc.getPersistentRDDs().size() == 0


def test_lazy_downstream_matches_eager(spark, rng):
    """all_knn_join plans stage 2 two ways by corpus size (eager
    driver-stats below eager_stats_max_rows, the lazy broadcast-semi
    shape above). Both must produce the identical result set — the
    large-corpus lazy shape is otherwise only exercised at scale."""
    n = 500
    ids = np.arange(1, n + 1)
    x, y = rng.random(n), rng.random(n)
    pts = make_points_df(spark, ids, x, y)
    eager = all_knn_join(pts, pts, k=5, eager_stats_max_rows=10**12)
    lazy = all_knn_join(make_points_df(spark, ids, x, y), make_points_df(spark, ids, x, y),
                        k=5, eager_stats_max_rows=0)
    assert eager.exceptAll(lazy).count() == 0
    assert lazy.exceptAll(eager).count() == 0


def test_frontier_plan_has_no_nested_loop_join(spark, rng):
    """The boundary-exchange frontier must probe only the stripes the
    kth-radius touches (BroadcastHashJoin on stripe_id), never cross-join
    the full cell table (BroadcastNestedLoopJoin — the 100x scale
    killer flagged in VERDICT r01)."""
    n = 400
    ids = np.arange(1, n + 1)
    pts = make_points_df(spark, ids, rng.random(n), rng.random(n))
    df = all_knn_join(pts, pts, k=5, num_stripes=8)
    explained = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in explained


def test_margin_assignment_covers_expanded_rect(spark, rng):
    """The exactness of the margin-replicated stage 1 rests on one
    invariant: every cell's training must cover its margin-EXPANDED
    rectangle (cells_df m_* bounds), because the escape test certifies
    queries against exactly those bounds. Check it exhaustively on a
    skewed grid (fused boundaries -> salted substripes) so both the
    y-import and x-span legs are exercised."""
    from spark_aknn.grid import assign_cells_margin, build_grid, cells_df

    n = 800
    y = np.where(rng.random(n) < 0.7, 0.5, rng.random(n))
    x = _uniform(rng, n)
    ids = np.arange(1, n + 1)
    pts = make_points_df(spark, ids, x, y)
    grid = build_grid(pts, 8, salt_factor=1.5)
    assert grid.x_splits, "need substripes to exercise the x-margin leg"
    for mf in (0.5, 0.9, 2.0):
        assigned = assign_cells_margin(pts, grid, mf).toPandas()
        cells = cells_df(spark, grid, margin_factor=mf).toPandas()
        got = {
            (s, j): set(g["id"])
            for (s, j), g in assigned.groupby(["stripe_id", "sub_id"])
        }
        for c in cells.itertuples():
            inside = ids[
                (y >= c.m_ylo) & (y < c.m_yhi) & (x >= c.m_xlo) & (x < c.m_xhi)
            ]
            members = got.get((c.stripe_id, c.sub_id), set())
            missing = set(inside) - members
            assert not missing, (
                f"cell ({c.stripe_id},{c.sub_id}) misses {sorted(missing)[:5]} "
                f"inside its expanded rect"
            )


def test_margin_matches_margin_free(spark, rng):
    """margin_factor only changes the physical plan; results must be
    row-identical to the margin-free reference partitioning."""
    n = 500
    x, y = _uniform(rng, n), _uniform(rng, n)
    ids = np.arange(1, n + 1)
    pts = make_points_df(spark, ids, x, y)
    base = (
        all_knn_join(pts, pts, k=7, num_stripes=9, margin_factor=0.0)
        .toPandas().sort_values(["input_id", "rank"]).reset_index(drop=True)
    )
    for mf in (0.4, 0.9, 3.0):
        got = (
            all_knn_join(pts, pts, k=7, num_stripes=9, margin_factor=mf)
            .toPandas().sort_values(["input_id", "rank"]).reset_index(drop=True)
        )
        assert got.equals(base), f"margin_factor={mf} changed results"
