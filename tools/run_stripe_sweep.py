"""Stripe-count sweep -> BENCH/STRIPES.md.

Mirrors the reference's published stripe sweep
(/root/reference/PlaneSweepParallel/bin/Release/run_sustripes8M.cmd:
numStripes 50..6400 at fixed n, algo 12) and justifies the engine's
auto formula sqrt(|T|/k) (spark_aknn/stripes.py — the reference's own
P9 formula; round-1's /3 retune was retired by this sweep's data) by
running the headline all-kNN self-join at multiples of the auto count.

One session, levels interleaved twice, best-of-2 per level (the host
VM's speed drifts; relative ordering within a tight loop is reliable).

Usage: python tools/run_stripe_sweep.py [n_points] [k]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_aknn.aknn import all_knn_join  # noqa: E402
from spark_aknn.grid import build_grid, count_and_quantile_sketch  # noqa: E402
from spark_aknn.points import lcg_x, lcg_y  # noqa: E402
from spark_aknn.session import default_cpus, get_spark  # noqa: E402
from spark_aknn.stripes import auto_num_stripes  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = default_cpus()
    spark = get_spark("stripe_sweep", cpus=cpus)
    w = spark.range(2000).select(
        (F.col("id") + 1).alias("id"), lcg_x(F.col("id")).alias("x"), lcg_y(F.col("id")).alias("y")
    )
    all_knn_join(w, w, k=5, num_stripes=max(2, cpus)).count()  # warm
    pts = spark.range(n).select(
        (F.col("id") + 1).alias("id"), lcg_x(F.col("id")).alias("x"), lcg_y(F.col("id")).alias("y")
    ).persist()
    pts.count()
    _, sketch, _xe = count_and_quantile_sketch(pts)

    auto = auto_num_stripes(n, k, cpus)
    ref = max(1, round(math.sqrt(n / k)))  # reference formula, AllKnnResultStripes.h:141-151
    levels = sorted({max(2, auto // 4), max(2, auto // 2), auto, auto * 2, auto * 4, ref})
    best: dict[int, float] = {}
    for _pass in range(2):
        for s in levels:
            grid = build_grid(pts, s, sketch=sketch)
            t0 = time.time()
            all_knn_join(pts, pts, k=k, grid=grid).count()
            dt = time.time() - t0
            best[s] = min(best.get(s, float("inf")), dt)
            print(f"pass{_pass} stripes={s}: {dt:.1f}s", file=sys.stderr)

    lines = [
        "# BENCH/STRIPES — stripe-count sweep (reference run_sustripes8M.cmd twin)",
        "",
        f"all-kNN self-join, k={k}, n={n:,} uniform LCG points, local[{cpus}],",
        "prebuilt grid per level, interleaved twice, best-of-2.",
        "",
        f"auto = sqrt(|T|/k) = {auto} (spark_aknn/stripes.py, the reference's",
        f"own formula, AllKnnResultStripes.h:141-151; ref check = {ref}).",
        "",
        "| num_stripes | relation | kNN sec | pts/s |",
        "|---|---|---|---|",
    ]
    for s in sorted(best):
        rel = []
        if s == auto:
            rel.append("auto")
        if s == ref:
            rel.append("reference formula")
        for mult, name in [(0.25, "auto/4"), (0.5, "auto/2"), (2, "auto*2"), (4, "auto*4")]:
            if s == max(2, int(auto * mult)):
                rel.append(name)
        lines.append(f"| {s} | {', '.join(rel) or '-'} | {best[s]:.1f} | {n / best[s]:.0f} |")
    argmin = min(best, key=best.get)
    lines += [
        "",
        f"Best level this host: {argmin} stripes ({best[argmin]:.1f}s). The auto",
        "formula (= the reference's sqrt(|T|/k)) sizes stripe height to the",
        "expected kth radius: wider stripes inflate the kernel's sweep-window",
        "width (the dominant distance-evaluation cost), many-times-narrower",
        "stripes explode the escape frontier (see the auto*4 row). Round 1's",
        "/3 retune sat on the wide side and this sweep retired it.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "STRIPES.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
