"""Pipeline operators: dedup, text analysis, ANN, media plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_dedup(spark):
    from spark_aknn.pipeline.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa"), (5, "cc")], "doc_id long, text string"
    )
    got = exact_dedup(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.doc_id) == [1, 2, 5]
    assert list(got.n_dups) == [3, 1, 1]


def test_minhash_finds_planted_near_dups(spark):
    from spark_aknn.pipeline.dedup import minhash_dedup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [(i, base) for i in range(3)]
    rows.append((10, base.replace("dog", "cat", 1)))
    rows += [(100 + i, f"totally different document number {i} " + "x y z " * 20) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dedup_pairs(df, threshold=0.7).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.a, pairs.b)}
    assert {(0, 1), (0, 2), (1, 2)} <= found
    assert all(a < 100 and b < 100 for a, b in found)  # no false positives across groups
    # exact jaccard for identical docs is 1.0
    assert (pairs[pairs.b < 3].jaccard == 1.0).all()


def test_simhash_hamming(spark):
    from spark_aknn.pipeline.dedup import simhash, simhash_near_dup_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),  # 1 word differs
        (3, "completely unrelated text about spark and parquet files"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = simhash(df)
    pairs = simhash_near_dup_pairs(sh, max_hamming=16).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.a, pairs.b)}
    assert (1, 2) in found
    # determinism across invocations
    a = sh.orderBy("doc_id").toPandas()
    b = simhash(df).orderBy("doc_id").toPandas()
    assert (a.simhash.values == b.simhash.values).all()


def test_text_stats_and_tokens(spark):
    from spark_aknn.pipeline.text import text_stats

    df = spark.createDataFrame(
        [(1, "the cat, the hat!"), (2, ""), (3, "   "), (4, "one")],
        "doc_id long, text string",
    )
    got = text_stats(df).toPandas().set_index("doc_id")
    assert got.loc[1, "n_tokens"] == 4
    assert got.loc[1, "punct_ratio"] == 2 / 17
    assert got.loc[1, "stopword_ratio"] == 0.5  # 'the' twice of 4
    assert got.loc[2, "n_tokens"] == 0 and got.loc[3, "n_tokens"] == 0
    assert got.loc[4, "n_tokens"] == 1


def test_language_id(spark):
    from spark_aknn.pipeline.text import language_id

    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "el gato es de la casa y es feliz"),
            (3, "der Hund ist in den Garten und die Katze"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = language_id(df).toPandas().set_index("doc_id").pred_lang
    assert got[1] == "en" and got[2] == "es" and got[3] == "de" and got[4] == "und"


def test_fingerprint_order_sensitive(spark):
    from spark_aknn.pipeline.text import doc_fingerprint

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], "doc_id long, text string"
    )
    got = doc_fingerprint(df).toPandas().set_index("doc_id").fingerprint
    assert got[1] == got[3] and got[1] != got[2]


def test_ann_exact_matches_numpy(emb):
    from spark_aknn.pipeline.ann import all_pairs_l2_topk

    got = (
        all_pairs_l2_topk(emb, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    d2 = ((mat[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
    for qi in range(0, len(ids), 97):
        order = np.lexsort((ids, d2[qi]))[:5]
        sub = got[got.query_id == ids[qi]]
        assert (sub.neighbor_id.values == ids[order]).all()


def test_auto_num_centroids_policy():
    from spark_aknn.pipeline.ann import _TARGET_BUCKET_ROWS, auto_num_centroids

    assert auto_num_centroids(1000) == 16  # floor
    assert auto_num_centroids(100 * _TARGET_BUCKET_ROWS) == 100
    assert auto_num_centroids(100 * _TARGET_BUCKET_ROWS + 1) == 101
    # 100x corpus -> ~100x buckets: per-bucket rows stay ~constant
    n = 10**9
    assert abs(auto_num_centroids(n) * _TARGET_BUCKET_ROWS / n - 1.0) < 0.01


def test_salted_buckets_results_unchanged(emb):
    """Force sub-splitting on small data (tiny target_bucket_rows): the
    exact operators must return bit-identical results with the salted
    layout engaged, and the plan must actually have split (the grid-
    salting analogue the r3 verdict prescribed)."""
    from spark_aknn.pipeline.ann import (
        all_pairs_l2_topk,
        embedding_near_dup_pairs,
        ivf_topk,
    )

    base = (
        all_pairs_l2_topk(emb, k=5, num_centroids=4)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    salted = (
        all_pairs_l2_topk(emb, k=5, num_centroids=4, target_bucket_rows=40)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert base.equals(salted)

    p_base = (
        embedding_near_dup_pairs(emb, 1.35, num_centroids=4)
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    p_salt = (
        embedding_near_dup_pairs(emb, 1.35, num_centroids=4, target_bucket_rows=40)
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert p_base.equals(p_salt) and len(p_base) > 0

    # IVF: a probed parent expands to ALL its subs, so recall is
    # unchanged by salting — identical result sets at the same params
    iv_base = (
        ivf_topk(emb, k=5, num_centroids=4, nprobe=2)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    iv_salt = (
        ivf_topk(emb, k=5, num_centroids=4, nprobe=2, target_bucket_rows=40)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert iv_base.equals(iv_salt)


def test_salted_plan_splits_hot_buckets(emb):
    """The plan itself: per-sub-bucket membership is bounded near the
    target and every parent above tolerance got split."""
    from pyspark.sql import functions as F

    from spark_aknn.pipeline.ann import (
        _assign_home,
        _salted_buckets,
        train_centroids,
    )

    spark = emb.sparkSession
    cmat = train_centroids(emb, 4)
    bc = spark.sparkContext.broadcast(cmat)
    assigned = _assign_home(emb, bc, "vec_id", "embedding").persist()
    try:
        members, plan = _salted_buckets(assigned, 4, "vec_id", target_bucket_rows=40)
        assert plan.num_global > 4  # something split
        counts = members.groupBy("gbucket").agg(F.count(F.lit(1)).alias("c")).toPandas()
        # xxhash salting is approximately uniform: no sub-bucket should
        # exceed ~3x target even on this small corpus
        assert counts.c.max() <= 3 * 40
        # radii are per-sub and positive where members exist
        assert (plan.radii_g[counts.gbucket.to_numpy()] >= 0).all()
    finally:
        assigned.unpersist()


def test_ivf_recall(emb):
    from spark_aknn.pipeline.ann import all_pairs_l2_topk, ivf_topk

    ex = all_pairs_l2_topk(emb, k=5).toPandas()
    # the test embeddings are unit-norm near-uniform on the sphere — the
    # hardest case for IVF — so a high probe fraction is needed here;
    # the clustered test below shows real pruning at nprobe=2
    iv = ivf_topk(emb, k=5, num_centroids=8, nprobe=6).toPandas()
    exact_sets = ex.groupby("query_id").neighbor_id.apply(set)
    approx_sets = iv.groupby("query_id").neighbor_id.apply(set)
    recall = np.mean(
        [len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets.index]
    )
    assert recall >= 0.9  # r01 verdict: 0.3 was too loose to mean anything


def test_ivf_recall_clustered_low_nprobe(spark):
    """On clustered data (IVF's design case) a LOW probe fraction must
    already reach high recall — the pruning actually works."""
    from spark_aknn.pipeline.ann import all_pairs_l2_topk, ivf_topk

    rng = np.random.default_rng(5)
    centers = rng.normal(0, 1, (16, 32))
    pick = rng.integers(0, 16, 800)
    mat = (centers[pick] + rng.normal(0, 0.05, (800, 32))).astype(np.float32)
    rows = [(int(i), mat[i].tolist()) for i in range(800)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ex = all_pairs_l2_topk(df, k=5, num_centroids=16).toPandas()
    iv = ivf_topk(df, k=5, num_centroids=16, nprobe=2).toPandas()
    exact_sets = ex.groupby("query_id").neighbor_id.apply(set)
    approx_sets = iv.groupby("query_id").neighbor_id.apply(set)
    recall = np.mean(
        [len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets.index]
    )
    assert recall >= 0.9


def test_exact_topk_plan_has_no_corpus_collect(emb):
    """The exact ANN path must be distributed end to end: only bounded
    metadata (centroid sample, C-row radius table) reaches the driver —
    regression for the r01 verdict's corpus-toPandas finding."""
    import inspect

    import spark_aknn.pipeline.ann as annmod

    src = inspect.getsource(annmod.all_pairs_l2_topk) + inspect.getsource(
        annmod.embedding_near_dup_pairs
    )
    assert ".toPandas()" not in src  # (docstrings mention the word)


def test_images_and_media(spark):
    from spark_aknn.media import average_phash, decode_image, decode_invariants, psnr, synth_pixels
    from spark_aknn.tables import images_table

    imgs = images_table(spark, 64)
    pdf = imgs.toPandas()
    assert len(pdf) == 64
    # deterministic regeneration
    row = pdf.iloc[5]
    arr = synth_pixels(5, int(row.w), int(row.h))
    assert decode_image(row.bytes, int(row.w), int(row.h), "raw").tobytes() == arr.tobytes()
    assert average_phash(arr) == row.phash
    assert row.caption.startswith("caption for img_")
    inv = decode_invariants(imgs).toPandas()
    assert inv.decode_ok.all()
    assert np.isinf(inv.psnr_db).all()  # raw is lossless
    # PSNR sanity: small perturbation stays above the 40 dB gate
    noisy = arr.copy()
    noisy[0, 0, 0] = (int(noisy[0, 0, 0]) + 3) % 256
    assert psnr(arr, noisy) > 40


def test_jpeg_lite_lossy_roundtrip():
    """Real lossy codec round trip (replaces the r3 PIL stub test): the
    pure-numpy DCT-quantization codec must be actually lossy (finite
    PSNR) yet clear the BASELINE 40 dB invariant on worst-case
    flat-spectrum noise, deterministically."""
    from spark_aknn.media import decode_jpeg_lite, encode_jpeg_lite, psnr, synth_pixels

    for seed, (w, h) in [(1, (13, 9)), (2, (32, 32)), (3, (8, 8)), (4, (31, 17))]:
        a = synth_pixels(seed, w, h)
        buf = encode_jpeg_lite(a)
        b = decode_jpeg_lite(buf)
        assert b.shape == a.shape and b.dtype == np.uint8
        p = psnr(a, b)
        assert 40.0 <= p < float("inf"), (seed, p)  # lossy AND above the gate
        assert encode_jpeg_lite(a) == buf  # deterministic
        assert decode_jpeg_lite(buf).tobytes() == b.tobytes()
    # quality knob actually trades fidelity
    a = synth_pixels(9, 24, 24)
    lo = psnr(a, decode_jpeg_lite(encode_jpeg_lite(a, quality=30)))
    hi = psnr(a, decode_jpeg_lite(encode_jpeg_lite(a, quality=96)))
    assert lo < hi
    # uint16 header limit fails loudly with a codec-level error (r4 ADVICE)
    with pytest.raises(ValueError, match="65535"):
        encode_jpeg_lite(np.zeros((1, 70000, 3), dtype=np.uint8))


def test_jpeg_lite_images_table_end_to_end(spark):
    """Spark path: a jpeg_lite corpus decodes on executors with
    PSNR >= 40 vs the regenerated source pixels, and decode_invariants'
    phash check holds (stored phash is of the DECODED pixels)."""
    from collections.abc import Iterator

    import pandas as pd

    from spark_aknn.media import decode_image, decode_invariants, psnr, synth_pixels
    from spark_aknn.tables import images_table

    imgs = images_table(spark, 40, fmt="jpeg_lite")
    inv = decode_invariants(imgs).toPandas()
    assert len(inv) == 40 and inv.decode_ok.all()

    def check(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for img_id, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                src = synth_pixels(int(img_id[4:]), int(w), int(h))
                dec = decode_image(buf, int(w), int(h), fmt)
                rows.append((img_id, psnr(src, dec)))
            yield pd.DataFrame(rows, columns=["image_id", "psnr_db"])

    got = imgs.mapInPandas(check, "image_id string, psnr_db double").toPandas()
    assert len(got) == 40
    assert (got.psnr_db >= 40.0).all() and np.isfinite(got.psnr_db).all()


def test_embedding_near_dup(emb):
    from spark_aknn.pipeline.ann import embedding_near_dup_pairs

    got = embedding_near_dup_pairs(emb, 1.35).toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    pdf = emb.toPandas()
    mat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    sq = (mat * mat).sum(1)
    d2 = sq[:, None] + sq[None, :] - 2 * mat @ mat.T
    ai, bi = np.nonzero(d2 <= 1.35 + 1e-9)
    keep = ids[ai] < ids[bi]
    import pandas as pd

    exp = pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep]})
    # exact recompute on the engine side may reject boundary candidates;
    # compare sets with the exact distance rule
    exact = ((mat[ai][keep] - mat[bi][keep]) ** 2).sum(axis=1)
    # use engine rule: exact left-to-right; numpy pairwise is close enough
    # for set comparison away from the boundary
    exp = exp[np.abs(exact - 1.35) > 1e-9]
    got_set = set(zip(got.a, got.b))
    assert set(zip(exp.a, exp.b)) <= got_set
    assert len(got_set) >= len(exp)


def test_payload_roundtrip_invariants(spark, tmp_path):
    """BASELINE.json per-row invariant: after a write/read pipeline pass,
    decoded pixels are identical (PSNR inf for raw) and captions equal."""
    from spark_aknn.tables import images_table

    imgs = images_table(spark, 50)
    path = str(tmp_path / "imgs")
    imgs.write.parquet(path)
    back = spark.read.parquet(path)
    a = imgs.toPandas().sort_values("image_id").reset_index(drop=True)
    b = back.toPandas().sort_values("image_id").reset_index(drop=True)
    assert (a.caption == b.caption).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))
    assert (a.phash == b.phash).all()


def test_result_count_and_agg_consumption(spark):
    """Regression: count()/agg() directly on engine outputs must not
    break kernel inputs (Catalyst pruning of self-cogroup columns)."""
    import numpy as np

    from spark_aknn.aknn import all_knn_join
    from tests.conftest import make_points_df

    rng = np.random.default_rng(3)
    pts = make_points_df(spark, np.arange(1, 301), rng.random(300), rng.random(300))
    res = all_knn_join(pts, pts, k=5)
    assert res.count() == 1500
    assert res.agg(F.sum("rank")).collect()[0][0] == 300 * (1 + 2 + 3 + 4 + 5)


def test_simhash_banding_complete_at_radius(spark):
    """Pigeonhole-completeness regression (VERDICT r01): the banded join
    must find EVERY pair within the requested radius. Oracle: exact
    all-pairs Hamming over the fingerprints in numpy."""
    from itertools import combinations

    from spark_aknn.pipeline.dedup import simhash, simhash_near_dup_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(5, 25))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = simhash(df).toPandas().set_index("doc_id").simhash.astype(np.int64)
    for radius in (0, 3, 8, 17):
        got = simhash_near_dup_pairs(
            spark.createDataFrame(sh.reset_index(), "doc_id long, simhash long"),
            max_hamming=radius,
        ).toPandas()
        got_set = {tuple(sorted((a, b))) for a, b in zip(got.a, got.b)}
        exp_set = set()
        for a, b in combinations(sh.index, 2):
            ham = bin((int(sh[a]) ^ int(sh[b])) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham <= radius:
                exp_set.add(tuple(sorted((a, b))))
        assert got_set == exp_set, f"radius {radius}"


def test_simhash_matches_duckdb_twin(spark):
    """The Spark fingerprint math (md5-conv word hash, majority vote)
    must be bit-identical to the DuckDB oracle CTE."""
    import duckdb

    from spark_aknn.pipeline.dedup import simhash, simhash_duckdb_sql

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
        (3, "  Mixed   CASE   and   spacing  "),
        (4, ""),
        (5, "unicode naïve café ωmega"),
        (6, "repeat repeat repeat repeat distinct"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        simhash(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = simhash_duckdb_sql(64, "documents")
    # pull the fp CTE out of the oracle query to compare fingerprints
    fp = con.execute(
        sql[: sql.index(")\nSELECT")] + ")\nSELECT doc_id, lo, hi FROM fp ORDER BY doc_id"
    ).fetchdf()
    assert list(got.doc_id) == list(fp.doc_id)  # doc 4 absent on both sides
    combined = (fp.lo.to_numpy().astype(np.uint64)) | (
        fp.hi.to_numpy().astype(np.uint64) << np.uint64(32)
    )
    assert (got.simhash.to_numpy().view(np.uint64) == combined).all()


def test_cosine_near_dup(emb):
    from spark_aknn.pipeline.ann import cosine_near_dup_pairs

    min_cos = 0.35
    got = cosine_near_dup_pairs(emb, min_cos).toPandas()
    pdf = emb.toPandas()
    mat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = unit @ unit.T
    ai, bi = np.nonzero(cos >= min_cos)
    keep = ids[ai] < ids[bi]
    # set comparison away from the float boundary
    exp = set()
    for qa, qb in zip(ai[keep], bi[keep]):
        if cos[qa, qb] >= min_cos + 1e-9:
            exp.add((ids[qa], ids[qb]))
    got_set = set(zip(got.a, got.b))
    assert exp <= got_set
    # scores agree with numpy within float32-normalization tolerance
    gmap = {(a, b): c for a, b, c in zip(got.a, got.b, got.cos_sim)}
    for qa, qb in zip(ai[keep], bi[keep]):
        key = (ids[qa], ids[qb])
        if key in gmap:
            assert abs(gmap[key] - cos[qa, qb]) < 1e-5


def test_derive_banding_threshold_driven():
    """Banding is derived from the threshold (VERDICT r2 Missing #1):
    the chosen (bands, rows) must hit the recall target at s=threshold,
    and a coarser banding (r+1) must not — i.e. the derivation picks the
    cheapest banding that still meets the bar, not a hard-coded 8x4."""
    from spark_aknn.pipeline.dedup import derive_banding

    for num_perm in (16, 32, 64):
        for t in (0.3, 0.5, 0.7, 0.8, 0.9):
            b, r = derive_banding(num_perm, t, target_recall=0.9)
            assert b * r <= num_perm
            assert 1 - (1 - t**r) ** b >= 0.9
            if r < num_perm:
                b2 = num_perm // (r + 1)
                assert 1 - (1 - t ** (r + 1)) ** b2 < 0.9
    # the r2 hard-coded 8x4 fails this bar at t=0.5; the derivation must not
    assert 1 - (1 - 0.5**4) ** 8 < 0.9
    b, r = derive_banding(32, 0.5)
    assert (b, r) == (16, 2)


def test_minhash_verify_strategies_agree(spark):
    """verify='arrays' (default, measured faster) and verify='exploded'
    (bounded-row-width escape hatch — BENCH/MINHASH.md) are the same
    exact operator: identical pairs AND identical float values."""
    from spark_aknn.pipeline.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = (
        minhash_dedup_pairs(docs, threshold=0.5, verify="arrays")
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    b = (
        minhash_dedup_pairs(docs, threshold=0.5, verify="exploded")
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(a) > 0 and a.equals(b)
    with pytest.raises(ValueError):
        minhash_dedup_pairs(docs, verify="nope")


def test_minhash_persist_registry_released(spark):
    """Repeated minhash_dedup_pairs calls must not accumulate persisted
    intermediates: each call releases the previous call's caches
    (bounded _CACHED registry, mirror of ann.release_cached —
    r4 VERDICT What's-wrong #1)."""
    from spark_aknn.pipeline import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dedup.minhash_dedup_pairs(docs, threshold=0.5, verify="arrays").count()
    first = list(dedup._CACHED)
    assert len(first) == 1  # sigs persisted
    assert first[0].storageLevel.useMemory
    # different num_perm -> different analyzed plan, so the storage-level
    # lookup can't alias call 1's (unpersisted) plan to call 2's cache
    dedup.minhash_dedup_pairs(docs, threshold=0.5, num_perm=16, verify="exploded").count()
    for df in first:  # previous call's caches are gone
        assert not df.storageLevel.useMemory
    assert len(dedup._CACHED) == 2  # sigs + cand (exploded mode)
    assert all(df.storageLevel.useMemory for df in dedup._CACHED)
    dedup.release_cached()
    assert not dedup._CACHED


def test_minhash_recall_at_threshold(spark):
    """Planted pairs with exact Jaccard just above the threshold are
    recovered >= 0.9 (the VERDICT r2 task-3 done criterion). Each pair
    shares a ~71-word prefix of a 100-word doc drawn from its own
    vocabulary, putting 3-shingle Jaccard in the (0.5, 0.62) band just
    above threshold=0.5."""
    from spark_aknn.pipeline.dedup import minhash_dedup_pairs

    rng = np.random.default_rng(7)
    rows, planted = [], []
    for p in range(25):
        vocab = [f"p{p}w{i}" for i in range(60)]
        common = list(rng.choice(vocab, size=71))
        a = common + [f"p{p}a{i}" for i in range(29)]
        b = common + [f"p{p}b{i}" for i in range(29)]
        rows.append((2 * p, " ".join(a)))
        rows.append((2 * p + 1, " ".join(b)))
        sh_a = {tuple(a[i : i + 3]) for i in range(len(a) - 2)}
        sh_b = {tuple(b[i : i + 3]) for i in range(len(b) - 2)}
        jac = len(sh_a & sh_b) / len(sh_a | sh_b)
        if 0.5 <= jac:
            planted.append((2 * p, 2 * p + 1, jac))
    assert len(planted) >= 20  # the construction really lands above t
    assert all(j < 0.65 for _, _, j in planted)  # ...and near the boundary
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_dedup_pairs(df, threshold=0.5).toPandas()
    found = set(zip(got.a, got.b))
    recall = sum((a, b) in found for a, b, _ in planted) / len(planted)
    assert recall >= 0.9, f"recall {recall} over {len(planted)} borderline pairs"


def test_minhash_matches_duckdb_twin(spark):
    """minhash_dedup_pairs(hash_family='md5') must be bit-identical to
    minhash_duckdb_sql — pairs, est_jaccard AND jaccard — including the
    edge docs (empty, null, short < n words, repeated words, spacing)."""
    import duckdb

    from spark_aknn.pipeline.dedup import minhash_dedup_pairs, minhash_duckdb_sql

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(rng.choice(vocab, size=30))) for i in range(20)]
    rows.append((100, rows[0][1]))  # exact dup
    rows.append((101, rows[1][1].replace("w1", "w2")))
    rows += [(102, ""), (103, None), (104, "one two"), (105, "rep rep rep rep"),
             (106, "  Mixed   CASE  spacing ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        minhash_dedup_pairs(df, threshold=0.3, hash_family="md5")
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = (
        con.execute(minhash_duckdb_sql("docs", threshold=0.3))
        .fetchdf().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    for c in ["a", "b", "est_jaccard", "jaccard"]:
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c


def test_simhash_multi_index_exact(spark):
    """The multi-index Hamming path (wide chunks + 1-bit-flip variant
    enumeration, forced via a large n_hint) must return exactly the
    brute-force pair set — the pigeonhole coverage argument in code."""
    from itertools import combinations

    from spark_aknn.pipeline.dedup import multi_index_params, simhash_near_dup_pairs

    m, e = multi_index_params(8, 100_000)
    assert e >= 1  # the large-n model must actually choose flip enumeration
    rng = np.random.default_rng(23)
    base = rng.integers(0, 2**63, size=20, dtype=np.int64)
    fps = list(base)
    for v in base[:10]:  # plant near pairs at radius 1..8
        flips = rng.choice(64, size=rng.integers(1, 9), replace=False)
        w = np.int64(v)
        for f in flips:
            w = np.bitwise_xor(w, np.int64(1) << np.int64(int(f)))
        fps.append(w)
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(fps)], "doc_id long, simhash long"
    )
    got = simhash_near_dup_pairs(df, max_hamming=8, n_hint=100_000).toPandas()
    got_set = {tuple(sorted((a, b))) for a, b in zip(got.a, got.b)}
    exp_set = set()
    for (i, x), (j, y) in combinations(enumerate(fps), 2):
        if bin((int(x) ^ int(y)) & 0xFFFFFFFFFFFFFFFF).count("1") <= 8:
            exp_set.add((i, j))
    assert got_set == exp_set


def test_simhash_single_chunk_signed_masks(spark):
    """m=1 (one 64-bit chunk — the cost-model crossover at max_hamming=4,
    n ~ 1.6e10) enumerates flip masks over the FULL word; high-bit masks
    (1<<63) must be emitted as signed two's-complement or the join keys
    go NULL and high-bit pairs silently vanish (r3 ADVICE)."""
    from spark_aknn.pipeline.dedup import _flip_masks, multi_index_params, simhash_near_dup_pairs

    m, e = multi_index_params(4, 20_000_000_000)
    assert m == 1 and e == 2  # pigeonhole: floor(4/1) <= 2e
    masks = _flip_masks(64, 2)
    assert all(-(1 << 63) <= mv < (1 << 63) for mv in masks)
    assert (-(1 << 63)) in masks  # the 1<<63 single-bit flip, signed
    def s64(v):  # signed two's-complement reading of a 64-bit pattern
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    base = -(1 << 62)  # high bits set
    fps = [
        (1, base),
        (2, s64(base ^ (1 << 63))),      # distance 1, via the top bit
        (3, s64(base ^ ((1 << 63) | (1 << 62) | (1 << 61) | (1 << 60)))),  # distance 4
        (4, s64(base ^ 0b11111)),        # distance 5 — outside the radius
    ]
    df = spark.createDataFrame([(i, v) for i, v in fps], "doc_id long, simhash long")
    got = simhash_near_dup_pairs(df, max_hamming=4, n_hint=20_000_000_000).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(got.a, got.b)}
    assert (1, 2) in found and (1, 3) in found
    assert (1, 4) not in found
    assert (2, 3) in found  # distance 3


def test_multi_index_params_cover_radius():
    """Any (m, e) the model returns must satisfy the pigeonhole coverage
    rule floor(h/m) <= 2e — otherwise the join would miss pairs."""
    from spark_aknn.pipeline.dedup import multi_index_params

    for h in range(4, 30):
        for n in (100, 10_000, 1_000_000, 100_000_000):
            m, e = multi_index_params(h, n)
            assert h // m <= 2 * e, (h, n, m, e)


def test_simhash_radius_bounds(spark):
    from spark_aknn.pipeline.dedup import simhash_near_dup_pairs

    # 0 vs -2 is Hamming distance 63 (all bits but the lowest differ);
    # 0 vs -1 is distance 64 — beyond any valid radius
    df = spark.createDataFrame([(1, 0), (2, -2), (3, -1)], "doc_id long, simhash long")
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(df, max_hamming=64)
    # h=63: near-complements are found (the old min(64, h+1) banding
    # could lose pairs at the top of the radius range)
    got = simhash_near_dup_pairs(df, max_hamming=63).toPandas()
    found = {(a, b) for a, b in zip(got.a, got.b)}
    assert (1, 2) in found and (1, 3) not in found
    assert (2, 3) in found  # -2 vs -1 differ in 1 bit


def test_cosine_excludes_zero_vectors(spark):
    from spark_aknn.pipeline.ann import cosine_near_dup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: undefined cosine
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_near_dup_pairs(df, min_cosine=-1.0, num_centroids=2).toPandas()
    assert set(zip(got.a, got.b)) == {(1, 2)}


def test_ivf_deterministic_matches_duckdb(spark):
    """ivf_topk(deterministic=True) equals its SQL twin bit-for-bit —
    centroid choice, exact-ltr assignment/probing, and top-k."""
    import duckdb

    from spark_aknn.pipeline.ann import ivf_duckdb_sql, ivf_topk

    rng = np.random.default_rng(31)
    dim = 8
    mat = rng.standard_normal((120, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(120), "embedding": list(map(list, mat))})
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    got = (
        ivf_topk(df, k=4, num_centroids=5, nprobe=3, deterministic=True)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    import pyarrow as pa

    con = duckdb.connect()
    con.register(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(pdf.vec_id.to_numpy(), type=pa.int64()),
                "embedding": pa.array(list(pdf.embedding), type=pa.list_(pa.float32())),
            }
        ),
    )
    exp = (
        con.execute(ivf_duckdb_sql(dim, k=4, num_centroids=5, nprobe=3))
        .fetchdf().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["query_id", "rank", "neighbor_id", "dist_sq"]:
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c


# ----------------------------------------------------------------- image tier


def test_blocky_phash_variant_arithmetic():
    """Variant v flips cells [0, v): hamming between decoded-pixel
    phashes of same-seed variants is exactly |set difference|, and it
    survives the lossy codec (the bimodal design margin)."""
    from spark_aknn.pipeline.images import SIDE, QUALITY, _render

    for seed in (0, 7, 41):
        ph = {v: _render(seed, v, SIDE, QUALITY)[1] for v in range(3)}
        ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
        assert (ham(ph[0], ph[1]), ham(ph[0], ph[2]), ham(ph[1], ph[2])) == (1, 2, 1)


def test_blocky_psnr_invariant():
    """Per-row invariant of BASELINE.json input_hint: lossy decode stays
    >= 40 dB PSNR vs the source, across all (seed, variant) renders."""
    from spark_aknn.pipeline.images import (
        DEFAULT_NSEEDS, DEFAULT_NVARIANTS, SIDE, QUALITY, _constants,
    )

    cs = _constants(DEFAULT_NSEEDS, DEFAULT_NVARIANTS, SIDE, QUALITY)
    assert len(cs) == DEFAULT_NSEEDS * DEFAULT_NVARIANTS
    assert min(c[3] for c in cs) >= 40.0


def test_keyed_images_distributed_matches_kernel(spark):
    """The mapInPandas render equals the single-node kernel per key, and
    phash_near_dup_pairs equals numpy brute force at hamming <= 4."""
    from spark_aknn.pipeline.images import (
        SIDE, QUALITY, _render, keyed_images, phash_near_dup_pairs,
    )

    keys = spark.range(0, 120, 1, 8).select(F.col("id").alias("k"))
    imgs = keyed_images(keys, "k", nseeds=11, nvariants=3).cache()
    pdf = imgs.toPandas().sort_values("key").reset_index(drop=True)
    assert list(pdf.columns) == [
        "key", "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "psnr"
    ]
    for _, r in pdf.iloc[::17].iterrows():
        buf, ph, db = _render(int(r.key) % 11, int(r.key) % 3, SIDE, QUALITY)
        assert r.bytes == buf and r.phash == ph and r.psnr == db
        assert r.image_id == f"img_{int(r.key):012d}"

    got = (
        phash_near_dup_pairs(imgs, max_hamming=4, n_hint=120)
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    ph = pdf.phash.to_numpy(np.uint64)
    exp = [
        (int(pdf.key[i]), int(pdf.key[j]), int(bin(int(ph[i] ^ ph[j])).count("1")))
        for i in range(len(ph)) for j in range(i + 1, len(ph))
        if bin(int(ph[i] ^ ph[j])).count("1") <= 4
    ]
    exp = sorted((min(a, b), max(a, b), h) for a, b, h in exp)
    assert [tuple(r) for r in got.to_numpy()] == exp
    imgs.unpersist()
