"""MinHash verify-strategy bench at inflated doc lengths (r3 task #5).

A/B-times the two verify strategies of minhash_dedup_pairs over the
SAME persisted signatures + candidates, in tight alternation (drift
protocol): 'arrays' (join both shingle-hash arrays, one JVM
array_intersect per pair) vs 'exploded' (the r3-verdict-prescribed
(doc, hash) equi-join aggregation). The two functions below mirror the
shipped strategies exactly (pipeline/dedup.py minhash_dedup_pairs).

MEASURED OUTCOME (see BENCH/MINHASH.md): 'arrays' wins ~2.4x even at
10^3-token docs — packed array values move ~3x cheaper per element
than exploded 24-byte rows, and the exploded form still ships L rows
per candidate through its first join. 'arrays' is therefore the
default; 'exploded' remains the wide-row escape hatch (10^5+-token
docs). This is the r1 stripe-formula story again: the prescribed
rewrite, measured, and sent back.

Usage: python tools/bench_minhash_payload.py [n_docs] [tokens_per_doc] [rounds]
Prints a markdown table (pasted into BENCH/MINHASH.md).
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from spark_aknn.session import get_spark  # noqa: E402


def make_docs(spark, n_docs: int, tokens: int):
    """Long docs with planted near-duplicates: doc 2i+1 = doc 2i with a
    tail perturbation (~90% token overlap), vocabulary per pair so
    unrelated docs share little."""
    base = spark.range(n_docs)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(tokens - 1)),
        lambda i: F.concat(
            F.lit("w"),
            # pair vocabulary + position; the last 10% of tokens differ
            # between the two members of a pair
            (F.col("id") / 2).cast("long").cast("string"),
            F.lit("_"),
            F.when(
                (i < int(tokens * 0.9)) | (F.col("id") % 2 == 0),
                i.cast("string"),
            ).otherwise(F.concat(F.lit("alt"), i.cast("string"), F.col("id").cast("string"))),
        ),
    )
    return base.select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def old_array_verify(sigs, cand, num_perm: int, threshold: float):
    """The r3 implementation: join both full shingle arrays per pair,
    one array_intersect each — reproduced here only as the bench
    comparator."""
    sv = sigs.select(
        F.col("doc_id"), F.col("shingle_hashes").alias("sh"), F.col("signature").alias("sig")
    )
    joined = (
        cand.join(sv.withColumnsRenamed({"doc_id": "a", "sh": "sh_a", "sig": "sig_a"}), "a")
        .join(sv.withColumnsRenamed({"doc_id": "b", "sh": "sh_b", "sig": "sig_b"}), "b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    est = F.size(
        F.filter(F.arrays_zip("sig_a", "sig_b"), lambda z: z["sig_a"] == z["sig_b"])
    ) / F.lit(num_perm)
    jac = F.col("n_inter") / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter"))
    return (
        joined.withColumn("est_jaccard", est)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "est_jaccard", "jaccard")
    )


def new_exploded_verify(sigs, cand, num_perm: int, threshold: float):
    """The shipped verify shape (pipeline/dedup.py minhash_dedup_pairs)."""
    shr = sigs.select(F.col("doc_id"), F.explode("shingle_hashes").alias("h"))
    inter = (
        cand.join(shr.withColumnsRenamed({"doc_id": "a"}), "a")
        .join(shr.withColumnsRenamed({"doc_id": "b"}), ["b", "h"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sv = sigs.select(
        F.col("doc_id"), F.col("signature").alias("sig"), F.size("shingle_hashes").alias("sz")
    )
    joined = (
        cand.join(inter, ["a", "b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0).cast("long")))
        .join(sv.withColumnsRenamed({"doc_id": "a", "sig": "sig_a", "sz": "sz_a"}), "a")
        .join(sv.withColumnsRenamed({"doc_id": "b", "sig": "sig_b", "sz": "sz_b"}), "b")
    )
    est = F.size(
        F.filter(F.arrays_zip("sig_a", "sig_b"), lambda z: z["sig_a"] == z["sig_b"])
    ) / F.lit(num_perm)
    jac = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    return (
        joined.withColumn("est_jaccard", est)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "est_jaccard", "jaccard")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("minhash_payload")

    from spark_aknn.pipeline.dedup import (
        derive_banding,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    num_perm, threshold = 32, 0.5
    docs = make_docs(spark, n_docs, tokens)
    sigs = minhash_signatures(docs, num_perm=num_perm).persist()
    sigs.count()
    bands, rpb = derive_banding(num_perm, threshold)
    cand = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rpb).persist()
    n_cand = cand.count()
    print(f"n_docs={n_docs} tokens/doc~{tokens} candidates={n_cand}")

    rows_old = old_array_verify(sigs, cand, num_perm, threshold).count()
    rows_new = new_exploded_verify(sigs, cand, num_perm, threshold).count()
    assert rows_old == rows_new, (rows_old, rows_new)
    print(f"both verifies agree: {rows_new} pairs >= {threshold}")

    old_t, new_t = [], []
    for r in range(rounds):
        t0 = time.time()
        new_exploded_verify(sigs, cand, num_perm, threshold).count()
        new_t.append(time.time() - t0)
        t0 = time.time()
        old_array_verify(sigs, cand, num_perm, threshold).count()
        old_t.append(time.time() - t0)
        print(f"round {r}: exploded {new_t[-1]:.2f}s array-join {old_t[-1]:.2f}s", flush=True)

    ratios = [o / n for o, n in zip(old_t, new_t)]
    print("\n| round | exploded verify (s) | array-join verify (s) | array/exploded |")
    print("|---|---|---|---|")
    for r in range(rounds):
        print(f"| {r} | {new_t[r]:.2f} | {old_t[r]:.2f} | {ratios[r]:.2f} |")
    print(f"median speedup: {statistics.median(ratios):.2f}x "
          f"(identical {rows_new}-pair output)")
    spark.stop()


if __name__ == "__main__":
    main()
