"""Bucketed-table co-location: write once, join/aggregate many times
with ZERO shuffles on the bucket key.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides;
bucketed external parquet tables (`bucketBy` + `sortBy`) persist the
hash-partitioning so every later equi-join or groupBy on the bucket key
satisfies EnsureRequirements' distribution straight off the scan — no
Exchange in the plan (asserted in tests/test_bucketed.py).  This is the
batch analogue of co-partitioned state: pay one write-side shuffle, then
every downstream pipeline (daily dedup sweeps, repeated fact joins over
the same key) reads pre-clustered data.

Rules of use:
  * Both join sides must be bucketed on the join key with the SAME
    bucket count (Spark can coalesce mismatched counts when one divides
    the other — ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
  * Bucket count sizes the read parallelism floor: at 100 TB pick
    buckets ≈ data / target-partition-size (e.g. 8192), not the local
    default.
  * ``sortBy`` the same key so sort-merge join skips its sort too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_by: Sequence[str],
    buckets: int,
    sort_by: Sequence[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as an external parquet table bucketed (and sorted)
    by ``bucket_by``, returning the re-read table.  ``path`` keeps the
    data outside the warehouse so tests/jobs control the location."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, *bucket_by)
        .sortBy(*(sort_by or bucket_by))
        .saveAsTable(name)
    )
    return df.sparkSession.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (external data files are left in place)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
