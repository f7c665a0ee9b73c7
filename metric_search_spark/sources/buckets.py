"""Bucketed tables — the co-located-join seam for repeated large joins.

At 100 TB the dominant cost of a recurring fact⋈fact join is the shuffle
of both sides on the key, paid on EVERY run. Spark's answer is bucketed
storage: write each table ONCE pre-hash-partitioned into n buckets on the
join key (``bucketBy`` + ``sortBy``), and every later sort-merge join on
that key reads bucket i against bucket i directly — zero Exchange in the join plan,
for as many runs as the tables live. The write pays one shuffle; every
subsequent join is free of it. That contract is pinned in
tests/test_bucketed.py, alongside the contrast pin that the identical
join over plain Parquet shuffles both sides every run.

What bucketing does NOT remove on Spark 3+: the per-task Sort under the
SMJ. SPARK-28632 stopped propagating sortBy file order to the scan's
outputOrdering (the legacy flag
``spark.sql.legacy.bucketedTableScan.outputOrdering`` restores it only
partially), so plans keep a bucket-LOCAL in-memory sort — cheap (no
spill risk beyond one bucket, no network) next to the Exchange it
replaces. We still sortBy: rows arrive clustered, making that residual
sort a near-no-op merge.

Mechanics worth stating:
- Bucket routing uses Spark's Murmur3 hash — engine-internal, but the
  OUTPUT of any join over bucketed tables is routing-independent, which
  is what the driver oracle checks (results equal the plain SQL join).
- Both sides must agree on bucket count (or be integer multiples, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); we require
  equality — the simple contract.
- Bucketed tables are CATALOG tables (saveAsTable) with an explicit
  ``path`` — metastore entry + self-describing Parquet; a plain
  ``spark.read.parquet(path)`` of the same files still works but loses
  the bucket metadata (and the free join). Reading through the catalog
  name is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "read_bucketed", "bucketed_ready"]


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str | list[str],
    n_buckets: int,
    *,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed catalog table at ``path`` (overwrite).
    One shuffle now; every later equi-join on ``key`` between tables
    bucketed at the same ``n_buckets`` is Exchange-free (a bucket-local
    sort remains — see module docstring)."""
    keys = [key] if isinstance(key, str) else list(key)
    if n_buckets < 1:
        raise ValueError(f"n_buckets {n_buckets} must be >= 1")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # One file per bucket: repartition on the same keys/count as the
    # bucket spec (Spark routes both with the same Murmur3 hash, so each
    # write task holds exactly one bucket's rows). With multiple files
    # per bucket Spark must re-Sort under every SMJ even when sortBy
    # metadata is present — this is what makes the join Sort-free too.
    w = (
        df.repartition(n_buckets, *[F.col(c) for c in keys])
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket-metadata-
    preserving path)."""
    return spark.table(table)


def bucketed_ready(spark: SparkSession, table: str, n_buckets: int) -> bool:
    """True iff ``table`` exists in the catalog with ``n_buckets`` buckets
    — the idempotence probe a resumable pipeline uses to skip the
    one-time bucketing shuffle on re-run."""
    if not spark.catalog.tableExists(table):
        return False
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    for r in rows:
        if r["col_name"] == "Num Buckets":
            return int(r["data_type"]) == n_buckets
    return False
