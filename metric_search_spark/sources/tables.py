"""Table IO seam — Iceberg when its Spark runtime is on the classpath,
Parquet otherwise, behind ONE switch so every operator reads and writes
through the same call. The engine's table semantics (append delta,
tombstone DELETE, compaction MERGE — streaming/incremental.py) map 1:1 to
Iceberg row-level operations; on plain Parquet the engine ships its own
LSM delta log (`streaming/incremental.py`), which is the container-honest
fallback since this environment has no iceberg-spark-runtime jar.

A path-like identifier (contains "/" or a URI scheme) selects Parquet; a
catalog identifier (``db.table``) selects Iceberg and fails with a clear
message when the runtime is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["iceberg_available", "read_table", "write_table"]

_ICEBERG_CLASS = "org.apache.iceberg.spark.source.IcebergSource"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound surfaces as Py4JError
        return False


def _is_path(ident: str) -> bool:
    return "/" in ident or "://" in ident


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    """Read a table by path (Parquet) or catalog identifier (Iceberg)."""
    if _is_path(ident):
        return spark.read.parquet(ident)
    if not iceberg_available(spark):
        raise RuntimeError(
            f"catalog identifier {ident!r} needs the iceberg-spark-runtime "
            "jar on the classpath (absent in this container); pass a "
            "filesystem path to use the Parquet table format instead"
        )
    return spark.read.format("iceberg").load(ident)


def write_table(df: DataFrame, ident: str, mode: str = "append") -> None:
    """Write by path (Parquet) or catalog identifier (Iceberg)."""
    if _is_path(ident):
        df.write.mode(mode).parquet(ident)
        return
    if not iceberg_available(df.sparkSession):
        raise RuntimeError(
            f"catalog identifier {ident!r} needs the iceberg-spark-runtime "
            "jar on the classpath (absent in this container); pass a "
            "filesystem path to use the Parquet table format instead"
        )
    df.writeTo(ident).append() if mode == "append" else df.writeTo(
        ident
    ).createOrReplace()
