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


def test_lossy_decode_is_stubbed(spark):
    from spark_aknn.media import _HAS_PIL, decode_image

    if not _HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8", 4, 4, "jpeg")


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
