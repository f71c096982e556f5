"""Similarity search over an embedding column (array<float>).

Two tiers, mirroring the engine's stripe philosophy (partition-local
vectorized kernels + a bounded exchange):

  * ``l2_topk_exact`` — brute-force k-nearest by squared L2, expressed
    as map-side partial top-k (mapInPandas over the corpus with the
    broadcast query matrix; numpy GEMM per Arrow batch) + one window
    merge. Exact; the baseline and the small-scale oracle. O(n_q * n_t)
    work but only one narrow shuffle of n_q * k rows.
  * ``ivf_topk`` — IVF-style approximate variant: deterministic
    centroids (hash-sampled vectors),每 vector assigned to its nearest
    centroid JVM-shuffled by centroid id, queries probe ``nprobe``
    nearest centroids; same kernel per bucket, then window merge.
    The 100 TB scale path: work drops to n_q * (nprobe/C) * n_t.

The unrolled-sum SQL twin (``l2_sql``) lets DuckDB verify the exact
variant bit-for-bit: both engines evaluate the same left-associated
chain of IEEE double ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _l2_exact_ltr(diff: np.ndarray) -> np.ndarray:
    """Strict left-to-right sum of squares along axis 1 — the exact IEEE
    op order of the unrolled SQL expression (l2_sql), so distances are
    bit-identical to the DuckDB oracle. Vectorized over rows; the Python
    loop is over the (small, fixed) dimensionality only."""
    acc = diff[:, 0] * diff[:, 0]
    for i in range(1, diff.shape[1]):
        acc = acc + diff[:, i] * diff[:, i]
    return acc


def _topk_partial(q_ids, qmat, ids, mat, k):
    """Exact per-partition top-k. GEMM (|a|^2 + |b|^2 - 2ab) preselects a
    4k candidate margin fast; winners are re-ranked by the exact
    left-to-right distance so GEMM rounding can neither reorder nor
    (thanks to the margin) exclude a true neighbor."""
    d2 = (
        (qmat * qmat).sum(axis=1)[:, None]
        + (mat * mat).sum(axis=1)[None, :]
        - 2.0 * (qmat @ mat.T)
    )
    kk = min(k, mat.shape[0])
    margin = min(4 * k, mat.shape[0])
    part = np.argpartition(d2, margin - 1, axis=1)[:, :margin]
    rows = []
    for qi in range(len(q_ids)):
        cand = part[qi]
        exact = _l2_exact_ltr(qmat[qi][None, :] - mat[cand])
        order = np.lexsort((ids[cand], exact))[:kk]
        rows.append((np.repeat(q_ids[qi], kk), ids[cand][order], exact[order]))
    return rows


def l2_topk_exact(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN of every query (driver-provided small set, broadcast)
    against the distributed corpus. Returns (query_id, rank, neighbor_id,
    dist_sq); dist computed in float64 elementwise (sum left-to-right via
    numpy pairwise — see note) only for merge candidates."""
    spark = corpus.sparkSession
    q_ids = queries_pdf[id_col].to_numpy()
    qmat = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    bq = spark.sparkContext.broadcast((q_ids, qmat))

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = bq.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out_q, out_n, out_d = [], [], []
            for a, b, c in _topk_partial(qi, qm, ids, mat, k):
                out_q.append(a)
                out_n.append(b)
                out_d.append(c)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "dist_sq": np.concatenate(out_d),
                }
            )

    partials = corpus.mapInPandas(partial, "query_id long, neighbor_id long, dist_sq double")
    w = Window.partitionBy("query_id").orderBy("dist_sq", "neighbor_id")
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist_sq")
    )


def all_pairs_l2_topk(
    corpus: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Self all-kNN over the corpus (small/medium cardinality): broadcast
    the full id+vector set, partial top-k per partition, window merge."""
    pdf = corpus.select(id_col, vec_col).toPandas()
    return l2_topk_exact(corpus, pdf, k, id_col, vec_col)


def ivf_topk(
    corpus: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate self all-kNN: IVF buckets by nearest centroid.

    Centroids are hash-sampled corpus vectors (deterministic, no
    training loop); assignment and probing use the same numpy kernel.
    Recall < 1 by design; tests assert recall against l2 exact."""
    spark = corpus.sparkSession
    cent_pdf = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h")
        .limit(num_centroids)
        .toPandas()
    )
    cmat = np.stack(cent_pdf[vec_col].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast(cmat)

    def assign(it: Iterator[pd.DataFrame], probes: int) -> Iterator[pd.DataFrame]:
        cm = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                + (cm * cm).sum(axis=1)[None, :]
                - 2.0 * (mat @ cm.T)
            )
            near = np.argsort(d2, axis=1, kind="stable")[:, :probes]
            out = pdf[[id_col, vec_col]].copy()
            out["buckets"] = [row.tolist() for row in near]
            yield out

    schema = f"{id_col} long, {vec_col} array<float>, buckets array<int>"
    data_b = (
        corpus.mapInPandas(lambda it: assign(it, 1), schema)
        .select(id_col, vec_col, F.explode("buckets").alias("bucket"))
    )
    query_b = (
        corpus.mapInPandas(lambda it: assign(it, nprobe), schema)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode("buckets").alias("bucket"),
        )
    )

    def bucket_knn(key, qpdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(tpdf) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "dist_sq": pd.Series(dtype="float64"),
                }
            )
        q_ids = qpdf["query_id"].to_numpy()
        qm = np.stack(qpdf["qvec"].to_numpy()).astype(np.float64)
        ids = tpdf[id_col].to_numpy()
        mat = np.stack(tpdf[vec_col].to_numpy()).astype(np.float64)
        qs, ns, ds = [], [], []
        for a, b, c in _topk_partial(q_ids, qm, ids, mat, k):
            qs.append(a)
            ns.append(b)
            ds.append(c)
        return pd.DataFrame(
            {
                "query_id": np.concatenate(qs),
                "neighbor_id": np.concatenate(ns),
                "dist_sq": np.concatenate(ds),
            }
        )

    cands = (
        query_b.groupBy("bucket")
        .cogroup(data_b.groupBy("bucket"))
        .applyInPandas(bucket_knn, "query_id long, neighbor_id long, dist_sq double")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy("dist_sq", "neighbor_id")
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist_sq")
    )


def l2_sql(a_vec: str, b_vec: str, dim: int) -> str:
    """Unrolled squared-L2 in ANSI SQL, 1-based list indexing (DuckDB),
    left-associated additions — matches numpy's elementwise order when
    the Spark side also evaluates the same unrolled expression."""
    terms = [
        f"(cast({a_vec}[{i}] as double) - cast({b_vec}[{i}] as double)) * "
        f"(cast({a_vec}[{i}] as double) - cast({b_vec}[{i}] as double))"
        for i in range(1, dim + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def embedding_near_dup_pairs(
    corpus: DataFrame,
    max_dist_sq: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with squared L2 distance <= max_dist_sq —
    embedding-space near-duplicate detection.

    Exact variant: broadcast the full (id, vector) set, GEMM each
    corpus partition against it (distances via |a|^2+|b|^2-2ab with a
    small tolerance), then re-rank candidates with the exact
    left-to-right distance (bit-identical to the unrolled SQL oracle).
    Scales to ~10^5 vectors; beyond that, bucket with ivf_topk-style
    centroids first and run this per bucket.
    """
    from collections.abc import Iterator

    import pyarrow as pa

    spark = corpus.sparkSession
    pdf = corpus.select(id_col, vec_col).toPandas()
    all_ids = pdf[id_col].to_numpy()
    all_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    b = spark.sparkContext.broadcast((all_ids, all_mat))
    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("dist_sq", pa.float64())]
    )

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ids_all, mat_all = b.value
        sq_all = (mat_all * mat_all).sum(axis=1)
        for rb in it:
            tbl = pa.Table.from_batches([rb])
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            mat = np.stack(tbl.column(vec_col).to_pylist()).astype(np.float64)
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                + sq_all[None, :]
                - 2.0 * (mat @ mat_all.T)
            )
            # GEMM rounding tolerance; exact recompute decides
            cand_q, cand_t = np.nonzero(d2 <= max_dist_sq + 1e-9)
            keep = ids[cand_q] < ids_all[cand_t]  # a < b, no self/dup
            cand_q, cand_t = cand_q[keep], cand_t[keep]
            if len(cand_q) == 0:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                     pa.array([], type=pa.float64())],
                    schema=out_schema,
                )
                continue
            exact = _l2_exact_ltr(mat[cand_q] - mat_all[cand_t])
            final = exact <= max_dist_sq
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids[cand_q][final], type=pa.int64()),
                    pa.array(ids_all[cand_t][final], type=pa.int64()),
                    pa.array(exact[final]),
                ],
                schema=out_schema,
            )

    return corpus.select(id_col, vec_col).mapInArrow(batches, "a long, b long, dist_sq double")
