"""spark-submit --py-files smoke: the north rule's deployment surface.

Packages spark_aknn into a zip (the artifact a real cluster ships to
executors), then runs the CLI through `spark-submit --py-files` from a
NEUTRAL working directory — so every import on driver AND executors
resolves from the zip, not from a checkout — and checks the output:
row count == n*k, every input id present, ranks 1..k.

This is the closest a single-node sandbox gets to the reference's
deployment story (bin/Release/run_*.cmd launch scripts): same artifact,
same launcher, same entry point as a 1000-executor cluster; only the
master URL differs.

Usage: python tools/run_submit.py [n] [k] [cpus]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest: str) -> str:
    """Zip the spark_aknn package (sources only) -> dest/spark_aknn.zip."""
    zpath = os.path.join(dest, "spark_aknn.zip")
    pkg = os.path.join(REPO, "spark_aknn")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def main(n: int = 100000, k: int = 10, cpus: int = 8) -> int:
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    work = tempfile.mkdtemp(prefix="submit_smoke_")
    zpath = build_zip(work)
    out = os.path.join(work, "out")
    # driver file shipped as a standalone script: a 3-line shim that
    # imports from the --py-files zip, exactly like a cluster job
    job = os.path.join(work, "job.py")
    with open(job, "w") as f:
        f.write("from spark_aknn.cli import main\nimport sys\nmain(sys.argv[1:])\n")
    cmd = [
        spark_submit,
        "--master", f"local[{cpus}]",
        "--conf", "spark.sql.shuffle.partitions=%d" % (2 * cpus),
        "--py-files", zpath,
        job,
        "--synthetic", str(n), "--k", str(k), "--output", out,
    ]
    env = {kk: v for kk, v in os.environ.items() if kk != "PYTHONPATH"}
    print("+", " ".join(cmd), flush=True)
    # cwd=work: nothing importable from the checkout by accident
    r = subprocess.run(cmd, cwd=work, env=env, capture_output=True, text=True, timeout=900)
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode != 0:
        print("SUBMIT FAILED", r.returncode)
        return 1

    import duckdb

    rows, distinct, rmin, rmax = duckdb.sql(
        f"select count(*), count(distinct input_id), min(rank), max(rank) "
        f"from '{out}/*.parquet'"
    ).fetchall()[0]
    ok = rows == n * k and distinct == n and (rmin, rmax) == (1, k)
    print(
        f"RESULT zip={os.path.getsize(zpath)}B rows={rows} distinct={distinct} "
        f"ranks={rmin}..{rmax} => {'OK' if ok else 'MISMATCH'}"
    )
    shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    raise SystemExit(main(*args))
