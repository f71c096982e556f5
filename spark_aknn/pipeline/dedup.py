"""Deduplication operators over a document corpus.

Scale design: every variant is one-or-two shuffles with map-side partial
work; no Python in the exact/minhash paths (JVM higher-order functions +
xxhash64), numpy batches only for simhash bit-voting.

  * exact_dedup        — hash-groupBy on md5(text); survivor = min(doc_id)
  * minhash_signatures — word-shingle MinHash (P permutations via seeded
    xxhash64), LSH banding -> candidate pairs -> exact Jaccard verify
  * simhash            — 64-bit majority-vote fingerprint (numpy batch),
    near-dup via 16-bit band join on Hamming distance
  * ngram_jaccard_pairs — exact n-gram Jaccard for candidate pairs
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: (text_hash, doc_id=min survivor, n_dups)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _shingles(text_col: str, n: int):
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return df.withColumn("shingles", F.array_distinct(_shingles(text_col, n)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shingle_hashes array<long>, signature array<long>).

    sig[p] = min over distinct word-n-gram shingles of mix64(h ^ seed_p),
    h = 64-bit shingle hash. Implemented as a mapInArrow numpy kernel:
    Spark's higher-order functions run on the interpreted (non-codegen)
    expression path, so the equivalent transform/array_min chain costs
    ~num_perm interpreted passes per row — the vectorized batch kernel
    (np.minimum.reduceat over a (total_shingles x num_perm) matrix) is
    ~10x faster and shuffles nothing. Shingles are carried as int64
    hashes; Jaccard on hash sets equals Jaccard on shingle sets up to
    negligible 64-bit collision probability.
    """
    from collections.abc import Iterator

    seeds = (np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(
        0xD1B54A32D192ED03
    )

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_

        for rb in it:
            tbl = pa_.Table.from_batches([rb])
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            texts = tbl.column(text_col).to_pylist()
            all_h: list[np.ndarray] = []
            counts = np.zeros(len(ids), dtype=np.int64)
            for i, text in enumerate(texts):
                words = str(text or "").lower().split()
                if len(words) < n:
                    grams = [" ".join(words)] if words else [""]
                else:
                    grams = {" ".join(words[j : j + n]) for j in range(len(words) - n + 1)}
                hs = np.unique(np.array([_word_key(g) for g in grams], dtype=np.uint64))
                all_h.append(hs)
                counts[i] = len(hs)
            flat = np.concatenate(all_h) if all_h else np.zeros(0, dtype=np.uint64)
            # (total_shingles x num_perm) permuted hashes, one reduceat per batch
            with np.errstate(over="ignore"):
                mat = _mix64(flat[:, None] ^ seeds[None, :]).view(np.int64)
            starts = np.zeros(len(ids), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            sig = np.minimum.reduceat(mat, starts, axis=0) if len(flat) else np.zeros((0, num_perm))
            offs = np.zeros(len(ids) + 1, dtype=np.int32)
            np.cumsum(counts, out=offs[1:])
            sig_offs = np.arange(0, (len(ids) + 1) * num_perm, num_perm, dtype=np.int32)
            yield pa_.RecordBatch.from_arrays(
                [
                    pa_.array(ids, type=pa_.int64()),
                    pa_.ListArray.from_arrays(pa_.array(offs), pa_.array(flat.view(np.int64))),
                    pa_.ListArray.from_arrays(pa_.array(sig_offs), pa_.array(sig.ravel())),
                ],
                names=[id_col, "shingle_hashes", "signature"],
            )

    out_schema = f"{id_col} long, shingle_hashes array<long>, signature array<long>"
    return df.select(id_col, text_col).mapInArrow(batches, out_schema)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode signatures into (band, band_hash) buckets; self-join the
    buckets for candidate pairs (a < b). The join key is the band hash —
    an equi-join Catalyst shuffles on, skew-safe under AQE."""
    b = sigs.select(
        F.col(id_col).alias("a"),
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(F.slice("signature", i * rows_per_band + 1, rows_per_band), lambda v: v.cast("string"))),
                        i,
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("a", "signature", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    left = b.select("band", "bh", F.col("a"), F.col("signature").alias("sig_a"))
    right = b.select("band", "bh", F.col("a").alias("b"), F.col("signature").alias("sig_b"))
    pairs = (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .dropDuplicates(["a", "b"])
    )
    est = (
        F.size(F.filter(F.arrays_zip("sig_a", "sig_b"), lambda z: z["sig_a"] == z["sig_b"]))
        / F.size("sig_a")
    )
    return pairs.withColumn("est_jaccard", est).drop("sig_a", "sig_b")


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs with exact n-gram Jaccard >= threshold.

    Verification joins the shingle sets back (broadcastable when the
    candidate set is small; Catalyst decides) and computes
    |A ∩ B| / |A ∪ B| with array_intersect — exact, JVM-side."""
    sigs = (
        minhash_signatures(df, text_col, n, num_perm, id_col=id_col)
        .persist()  # reused by banding and both verify joins
    )
    sigs.count()  # materialize so downstream joins plan with known sizes
    cand = lsh_candidate_pairs(sigs, id_col, bands, num_perm // bands)
    sh = sigs.select(F.col(id_col), F.col("shingle_hashes").alias("shingles"))
    joined = (
        cand.join(sh.withColumnsRenamed({id_col: "a", "shingles": "sh_a"}), "a")
        .join(sh.withColumnsRenamed({id_col: "b", "shingles": "sh_b"}), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "est_jaccard", "jaccard")
    )


# ------------------------------------------------------------------- simhash

_SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash by per-bit majority vote over word hashes.

    numpy batch kernel: hash words with a splitmix-style integer mix
    (vectorized), accumulate +-1 votes per bit — O(words x 64) per batch
    with no Python-level inner loop over documents' words."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            for row_i, text in enumerate(pdf[text_col]):
                words = str(text).lower().split()
                if not words:
                    continue
                hs = _mix64(
                    np.array([_word_key(w) for w in words], dtype=np.uint64)
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                val = np.uint64(0)
                for i in np.nonzero(votes > 0)[0]:
                    val |= np.uint64(1) << np.uint64(i)
                out[row_i] = np.int64(val.astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf[id_col].to_numpy(), "simhash": out})

    return df.mapInPandas(batches, _SIMHASH_SCHEMA)


def _word_key(w: str) -> int:
    # deterministic across processes (unlike salted Python hash())
    import zlib

    b = w.encode("utf-8", "surrogatepass")
    return (zlib.crc32(b) << 32) | zlib.adler32(b)


def _mix64(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer — spreads the crc/adler word keys over 64 bits
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def simhash_near_dup_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Band join: 4 x 16-bit chunks; pairs agreeing on >=1 chunk are
    candidates (guaranteed complete for hamming <= 3), verified by exact
    popcount via bit_count."""
    chunks = sim.select(
        F.col("doc_id").alias("a"),
        F.col("simhash").alias("sh_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("a", "sh_a", F.col("c.chunk").alias("chunk"), F.col("c.cv").alias("cv"))
    right = chunks.select(
        F.col("a").alias("b"), F.col("sh_a").alias("sh_b"), "chunk", "cv"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        chunks.join(right, ["chunk", "cv"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
