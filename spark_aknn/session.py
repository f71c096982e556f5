"""SparkSession builder for the engine.

Tuned for the sandbox (single JVM, ``local[N]``) but every knob is the
one you would also set on a real multi-executor cluster: AQE on (runtime
re-plan + skew-join splitting stands in for the reference's
``schedule(dynamic)`` stripe scheduling, PlaneSweepStripesParallelAlgorithm.h:81),
Arrow on (all Python kernels are pandas/Arrow batch kernels, never
per-row), shuffle partitions sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spark_aknn",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_cpus()
    # 2x cores: finer tasks balance skewed cells; AQE advisory size is
    # lowered below so coalescing doesn't fold CPU-bound stages into a
    # handful of oversized partitions
    shuffle_partitions = shuffle_partitions or 2 * cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # large Arrow batches keep the numpy kernels amortized; the
        # kernels themselves chunk internally to bound memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.extraJavaOptions",
            "-Dio.netty.tryReflectionSetAccessible=true -Xms8g -XX:+UseG1GC",
        )
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
