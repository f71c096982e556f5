"""Driver contract for the spark-graft builder (PySpark target).

Every queries() entry is an operator of the spark_aknn engine
(SURVEY.md §2 / §7.5, plus the training-data pipeline ops); each
oracle_sql() entry is the equivalent DuckDB SQL over the same parquet
tables. Point coordinates derive from integer keys through an LCG that
Spark, DuckDB and numpy evaluate bit-identically (spark_aknn/points.py),
so even float distance columns hash-match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_aknn.aknn import all_knn_join
from spark_aknn.cells import cell_id, cell_sql
from spark_aknn.pip import pip_sql, points_in_polygon_col
from spark_aknn.points import lcg_sql, points_from_keys
from spark_aknn.raster import tile_histogram, tile_id_col, tile_sql
from spark_aknn.spatial_join import radius_join_count

K = 10
POLY = [(0.2, 0.1), (0.9, 0.3), (0.7, 0.8), (0.5, 0.35), (0.3, 0.9), (0.1, 0.5)]  # concave
RADIUS = 0.02
TILE_T = 32
CELL_LEVEL = 10
EMB_DIM = 64

_POINT_KEYS = {  # table -> key column used for LCG point derivation
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}


def _pts(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    return points_from_keys(df, _POINT_KEYS[table])


def _pts_cte(table: str) -> str:
    key = _POINT_KEYS[table]
    x, y = lcg_sql(key)
    return f"SELECT {key} + 1 AS id, {x} AS x, {y} AS y FROM {table}"


def _ring_col():
    return F.array(*[F.struct(F.lit(a).alias("x"), F.lit(b).alias("y")) for a, b in POLY])


# --------------------------------------------------------------------- queries


def q_aknn_customer_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pts(spark, sf_dir, "customer")
    return all_knn_join(p, p, k=K)


def q_aknn_part_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return all_knn_join(
        _pts(spark, sf_dir, "part"), _pts(spark, sf_dir, "orders"), k=K
    )


def q_aknn_customer_self_k30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=30 variant (the reference's run_syntheticdata3.cmd:1 k=30
    precedent): the auto stripe formula sqrt(|T|/k) and the margin
    radius both depend on k, so this exercises a materially different
    grid than k=10."""
    p = _pts(spark, sf_dir, "customer")
    return all_knn_join(p, p, k=30)


def q_aknn_supplier_lineitem_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-query x big-training with k=3 — exercises the two-table
    path with unbalanced sides."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    trn = points_from_keys(
        li.select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("lkey")).distinct(),
        "lkey",
    )
    return all_knn_join(_pts(spark, sf_dir, "supplier"), trn, k=3)


def q_radius_count_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return radius_join_count(
        _pts(spark, sf_dir, "customer"), _pts(spark, sf_dir, "orders"), RADIUS
    )


def q_cell_tile_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pts(spark, sf_dir, "part")
    return p.select(
        F.col("id").alias("input_id"),
        cell_id(F.col("x"), F.col("y"), CELL_LEVEL).alias("cell_id"),
        tile_id_col(F.col("x"), F.col("y"), TILE_T).alias("tile_id"),
    )


def q_tile_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_histogram(_pts(spark, sf_dir, "orders"), TILE_T)


def q_pip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pts(spark, sf_dir, "customer")
    return p.select(
        F.col("id").alias("input_id"),
        points_in_polygon_col(F.col("x"), F.col("y"), _ring_col()).alias("inside"),
    )


def q_aknn_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-constrained kNN: neighbors restricted to training points
    inside a polygon — the PIP layer composed with the kNN join
    (SURVEY.md §7.5 'region-constrained kNN')."""
    trn = _pts(spark, sf_dir, "orders").filter(
        points_in_polygon_col(F.col("x"), F.col("y"), _ring_col())
    )
    return all_knn_join(_pts(spark, sf_dir, "supplier"), trn, k=5)


def q_multiply_x4_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.multiplier import multiply_x4

    return multiply_x4(_pts(spark, sf_dir, "supplier")).withColumnRenamed("id", "input_id")


def q_multiply_x2_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.multiplier import multiply_x2

    return multiply_x2(_pts(spark, sf_dir, "supplier")).withColumnRenamed("id", "input_id")


def q_event_tile_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.streaming import stream_tile_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return stream_tile_counts(events, tiles_per_side=16, window="1 hour")


def q_polygon_tile_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.raster import polygon_tile_cover

    polys = spark.createDataFrame(
        [("p0", [{"x": float(a), "y": float(b)} for a, b in POLY])],
        "poly_id string, ring array<struct<x:double,y:double>>",
    )
    return polygon_tile_cover(spark, polys, TILE_T)


def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(docs)


def q_text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.text import text_stats

    return text_stats(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_ann_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.ann import all_pairs_l2_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return all_pairs_l2_topk(emb, k=5)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.ann import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_pairs(emb, max_dist_sq=1.2)


def q_minhash_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, banding derived from the threshold.
    hash_family='md5' selects the shared-md5 word hash so the DuckDB
    twin (minhash_duckdb_sql) reproduces the pipeline bit-exactly; the
    engine default (xxhash64) is the faster scale path with identical
    structure."""
    from spark_aknn.pipeline.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_dedup_pairs(docs, threshold=0.5, hash_family="md5")


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.dedup import simhash, simhash_near_dup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dup_pairs(simhash(docs), max_hamming=8)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k, deterministic variant: first-id centroids
    + exact-left-to-right ranking make the whole bucketing/probe/top-k
    machinery bit-reproducible by the DuckDB twin (ivf_duckdb_sql); the
    kmeans default differs only in centroid quality (recall-tested)."""
    from spark_aknn.pipeline.ann import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, k=5, num_centroids=8, nprobe=6, deterministic=True)


def q_language_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.text import language_id

    return language_id(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.text import doc_fingerprint

    return doc_fingerprint(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_token_bpe_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.text import token_count_bpe

    return token_count_bpe(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.ann import cosine_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_near_dup_pairs(emb, min_cosine=0.35)


def _part_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_aknn.pipeline.images import keyed_images

    return keyed_images(spark.read.parquet(f"{sf_dir}/part.parquet"), "p_partkey")


def q_image_decode_psnr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graft's per-row image invariant at the oracle surface: the
    distributed jpeg_lite encode->decode->phash/PSNR path (input_hint
    schema) vs single-node kernel constants (pipeline/images.py)."""
    return _part_images(spark, sf_dir).select(
        "image_id", "caption", "w", "h", "fmt", "phash", "psnr"
    )


def q_image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs: exact multi-index Hamming search over
    the phash of DECODED pixels, vs a brute-force bit_count oracle."""
    from spark_aknn.pipeline.images import phash_near_dup_pairs

    n = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    return phash_near_dup_pairs(_part_images(spark, sf_dir), max_hamming=4, n_hint=n)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "aknn_customer_self": q_aknn_customer_self,
        "aknn_customer_self_k30": q_aknn_customer_self_k30,
        "aknn_part_orders": q_aknn_part_orders,
        "aknn_supplier_lineitem_k3": q_aknn_supplier_lineitem_k3,
        "radius_count_customer_orders": q_radius_count_customer_orders,
        "cell_tile_part": q_cell_tile_part,
        "tile_histogram_orders": q_tile_histogram_orders,
        "pip_customer": q_pip_customer,
        "aknn_in_polygon": q_aknn_in_polygon,
        "multiply_x4_supplier": q_multiply_x4_supplier,
        "multiply_x2_supplier": q_multiply_x2_supplier,
        "event_tile_hourly": q_event_tile_hourly,
        "polygon_tile_cover": q_polygon_tile_cover,
        "dedup_exact_documents": q_dedup_exact_documents,
        "text_stats_documents": q_text_stats_documents,
        "ann_l2_topk": q_ann_l2_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "simhash_near_dups": q_simhash_near_dups,
        "language_id_documents": q_language_id_documents,
        "fingerprint_documents": q_fingerprint_documents,
        "token_bpe_documents": q_token_bpe_documents,
        # r2's three rows-only entries, all upgraded to full hash
        # oracles in r3: minhash via the shared-md5 hash family +
        # splitmix64-in-SQL twin; IVF via the deterministic variant;
        # cosine via float64 normalization with deterministic op order
        "minhash_dedup_documents": q_minhash_dedup_documents,
        "ann_ivf_topk": q_ann_ivf_topk,
        "cosine_near_dup": q_cosine_near_dup,
        # r5: the image payload (input_hint schema) enters the oracle
        # gate — distributed codec+phash vs single-node constants, and
        # the multi-index Hamming search vs brute force
        "image_decode_psnr": q_image_decode_psnr,
        "image_phash_near_dup": q_image_phash_near_dup,
    }


# ---------------------------------------------------------------------- oracle


def _aknn_oracle(input_cte: str, training_cte: str, k: int) -> str:
    d = "(a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)"
    return f"""
WITH inp AS ({input_cte}), trn AS ({training_cte})
SELECT a.id AS input_id,
       row_number() OVER (PARTITION BY a.id ORDER BY {d}, b.id) AS rank,
       b.id AS neighbor_id,
       {d} AS dist_sq
FROM inp a CROSS JOIN trn b
QUALIFY rank <= {k}
"""


def oracle_sql() -> dict[str, str]:
    xs_c, ys_c = lcg_sql("c_custkey")
    xs_o, ys_o = lcg_sql("o_orderkey")
    xs_p, ys_p = lcg_sql("p_partkey")
    d_emb = _l2_unrolled("a.embedding", "b.embedding")
    return {
        "aknn_customer_self": _aknn_oracle(_pts_cte("customer"), _pts_cte("customer"), K),
        "aknn_customer_self_k30": _aknn_oracle(_pts_cte("customer"), _pts_cte("customer"), 30),
        "aknn_part_orders": _aknn_oracle(_pts_cte("part"), _pts_cte("orders"), K),
        "aknn_supplier_lineitem_k3": _aknn_oracle(
            _pts_cte("supplier"),
            "SELECT lkey + 1 AS id, "
            + lcg_sql("lkey")[0]
            + " AS x, "
            + lcg_sql("lkey")[1]
            + " AS y FROM (SELECT DISTINCT l_orderkey * 8 + l_linenumber AS lkey FROM lineitem)",
            3,
        ),
        "radius_count_customer_orders": f"""
WITH inp AS ({_pts_cte('customer')}), trn AS ({_pts_cte('orders')})
SELECT a.id AS input_id,
       count(b.id) AS n_within
FROM inp a LEFT JOIN trn b
  ON (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {RADIUS * RADIUS!r}
GROUP BY a.id
""",
        "cell_tile_part": f"""
SELECT p_partkey + 1 AS input_id,
       {cell_sql(xs_p, ys_p, CELL_LEVEL)} AS cell_id,
       {tile_sql(xs_p, ys_p, TILE_T)} AS tile_id
FROM part
""",
        "tile_histogram_orders": f"""
SELECT {tile_sql(xs_o, ys_o, TILE_T)} AS tile_id, count(*) AS n_points
FROM orders GROUP BY 1
""",
        "pip_customer": f"""
SELECT c_custkey + 1 AS input_id, {pip_sql(xs_c, ys_c, POLY)} AS inside
FROM customer
""",
        "aknn_in_polygon": _aknn_oracle(
            _pts_cte("supplier"),
            f"SELECT * FROM ({_pts_cte('orders')}) WHERE "
            + pip_sql("x", "y", POLY),
            5,
        ),
        "multiply_x4_supplier": _x4_oracle(),
        "multiply_x2_supplier": _x2_oracle(),
        "event_tile_hourly": f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       {tile_sql(lcg_sql('event_id')[0], lcg_sql('event_id')[1], 16)} AS tile_id,
       count(*) AS n_events,
       cast(sum(cast(value AS decimal(14,2))) AS double) AS sum_value
FROM events GROUP BY 1, 2, 3
""",
        "polygon_tile_cover": f"""
SELECT 'p0' AS poly_id, i AS tile_id
FROM range({TILE_T * TILE_T}) t(i)
WHERE {pip_sql(f"((i % {TILE_T}) + 0.5) / {TILE_T}.0", f"(cast(floor(i / {TILE_T}.0) as bigint) + 0.5) / {TILE_T}.0", POLY)}
""",
        "dedup_exact_documents": """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
        "text_stats_documents": r"""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], w))) AS n_stop
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_tokens > 0 THEN cast(n_chars AS double) / n_tokens ELSE 0.0 END AS avg_token_len,
       CASE WHEN n_chars > 0 THEN cast(n_punct AS double) / n_chars ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_tokens > 0 THEN cast(n_stop AS double) / n_tokens ELSE 0.0 END AS stopword_ratio
FROM t
""",
        "ann_l2_topk": f"""
SELECT a.vec_id AS query_id,
       row_number() OVER (PARTITION BY a.vec_id ORDER BY {d_emb}, b.vec_id) AS rank,
       b.vec_id AS neighbor_id,
       {d_emb} AS dist_sq
FROM embeddings a CROSS JOIN embeddings b
QUALIFY rank <= 5
""",
        "embedding_near_dup": f"""
SELECT a.vec_id AS a, b.vec_id AS b, {d_emb} AS dist_sq
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id < b.vec_id AND {d_emb} <= 1.2
""",
        "simhash_near_dups": _simhash_oracle(),
        "minhash_dedup_documents": _minhash_oracle(),
        "ann_ivf_topk": _ivf_oracle(),
        "cosine_near_dup": _cosine_oracle(),
        "language_id_documents": _text_oracle("language_id"),
        "fingerprint_documents": _text_oracle("fingerprint"),
        "token_bpe_documents": _text_oracle("token_bpe"),
        "image_decode_psnr": _image_oracle("psnr"),
        "image_phash_near_dup": _image_oracle("pairs"),
    }


def _image_oracle(which: str) -> str:
    from spark_aknn.pipeline.images import (
        decode_psnr_duckdb_sql,
        phash_pairs_duckdb_sql,
    )

    if which == "psnr":
        return decode_psnr_duckdb_sql("p_partkey", "part")
    return phash_pairs_duckdb_sql("p_partkey", "part", max_hamming=4)


def _simhash_oracle() -> str:
    from spark_aknn.pipeline.dedup import simhash_duckdb_sql

    return simhash_duckdb_sql(8, "documents")


def _minhash_oracle() -> str:
    from spark_aknn.pipeline.dedup import minhash_duckdb_sql

    return minhash_duckdb_sql("documents", threshold=0.5)


def _ivf_oracle() -> str:
    from spark_aknn.pipeline.ann import ivf_duckdb_sql

    return ivf_duckdb_sql(EMB_DIM, k=5, num_centroids=8, nprobe=6, table="embeddings")


def _cosine_oracle() -> str:
    from spark_aknn.pipeline.ann import cosine_duckdb_sql

    return cosine_duckdb_sql(EMB_DIM, min_cosine=0.35, table="embeddings")


def _text_oracle(which: str) -> str:
    from spark_aknn.pipeline import text as textmod

    return {
        "language_id": textmod.language_id_duckdb_sql,
        "fingerprint": textmod.fingerprint_duckdb_sql,
        "token_bpe": textmod.token_bpe_duckdb_sql,
    }[which]("documents")


def _x4_oracle() -> str:
    # reference quadrant/id order: DatasetMultiplier/main.cpp:74-77
    parts = []
    for q, (dx, dy) in enumerate([(0.0, 0.0), (0.0, 0.5), (0.5, 0.0), (0.5, 0.5)]):
        parts.append(
            f"SELECT (id - 1) * 4 + {q + 1} AS input_id, "
            f"x / 2 + {dx!r} AS x, y / 2 + {dy!r} AS y FROM p"
        )
    return f"WITH p AS ({_pts_cte('supplier')})\n" + "\nUNION ALL\n".join(parts)


def _x2_oracle() -> str:
    # factor 2: keep even dense ids (positions i%2==1, main.cpp:205),
    # renumber survivor j = id//2 - 1, full four-quadrant expansion.
    # DuckDB `/` is float division — `//` keeps input_id BIGINT so the
    # value hash matches Spark's long column (r2 verdict What's-wrong #1).
    parts = []
    for q, (dx, dy) in enumerate([(0.0, 0.0), (0.0, 0.5), (0.5, 0.0), (0.5, 0.5)]):
        parts.append(
            f"SELECT (id // 2 - 1) * 4 + {q + 1} AS input_id, "
            f"x / 2 + {dx!r} AS x, y / 2 + {dy!r} AS y FROM p WHERE id % 2 = 0"
        )
    return f"WITH p AS ({_pts_cte('supplier')})\n" + "\nUNION ALL\n".join(parts)


def _l2_unrolled(a: str, b: str) -> str:
    from spark_aknn.pipeline.ann import l2_sql

    return l2_sql(a, b, EMB_DIM)


# ----------------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: all-kNN self-join (k=10) over points derived from the
    sf0.001 orders table — the reference's core query end to end."""
    return q_aknn_customer_self(spark, "/root/testdata/sf0.001")
