"""Iceberg-or-parquet table catalog shim.

BASELINE.json's design point is an "Iceberg table of image + caption
rows at 10^12 scale". The engine itself is storage-agnostic — every
operator takes a DataFrame — so the catalog layer is a thin dispatch:

  * ``table:<catalog.db.name>`` / ``iceberg:<...>`` — resolved through
    the Spark session catalog (``spark.read.table`` /
    ``df.writeTo(...)``), which is how Iceberg tables are addressed once
    the standard public Iceberg-Spark runtime is on the classpath
    (https://iceberg.apache.org/docs/latest/spark-configuration/):
    ``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
    + a warehouse location. ``iceberg_session_conf()`` builds exactly
    that config dict for ``get_spark(extra_conf=...)``.
  * anything else — a path: ``.bin``/``.txt`` reference point files or
    parquet (spark_aknn.sources.read_points_any).

The Iceberg runtime jar is NOT shipped in this sandbox, so the
table-ref path is gated: ``iceberg_available()`` probes the JVM for the
SparkCatalog class, writes raise a clear error when it is absent, and
the tests assert the gate rather than pretend. Everything the engine
needs from the table format at 10^12 scale — partition pruning, column
projection, snapshot isolation for the resumable batches — comes
through the DataFrame reader either way; the parquet path exercises the
identical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_session_conf(
    catalog_name: str = "spark_aknn", warehouse: str = "/tmp/spark_aknn_warehouse"
) -> dict[str, str]:
    """extra_conf for spark_aknn.session.get_spark enabling a
    Hadoop-warehouse Iceberg catalog (takes effect only when the public
    iceberg-spark-runtime jar is on the classpath)."""
    return {
        f"spark.sql.catalog.{catalog_name}": _ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{catalog_name}.type": "hadoop",
        f"spark.sql.catalog.{catalog_name}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_CATALOG_IMPL)
        return True
    except Exception:
        return False


def _is_table_ref(ref: str) -> bool:
    return ref.startswith(("table:", "iceberg:"))


def _table_name(ref: str) -> str:
    return ref.split(":", 1)[1]


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """Catalog-ref or path -> DataFrame (the engine's one input type)."""
    if _is_table_ref(ref):
        return spark.read.table(_table_name(ref))
    from spark_aknn.sources import read_points_any

    return read_points_any(spark, ref)


def save_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """DataFrame -> catalog table (Iceberg when configured) or parquet
    path. Table writes use the DataFrameWriterV2 API (createOrReplace /
    append), the Iceberg-native write path."""
    if _is_table_ref(ref):
        if not iceberg_available(df.sparkSession):
            raise NotImplementedError(
                f"table ref {ref!r} needs the iceberg-spark-runtime jar on the "
                "classpath (configure via catalog.iceberg_session_conf); this "
                "sandbox ships none — use a parquet path instead"
            )
        writer = df.writeTo(_table_name(ref))
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    df.write.mode(mode).parquet(ref)
