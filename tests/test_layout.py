"""Layout writer: partition pruning and filter pushdown are asserted
against the reader's physical plan, and the small-files property is
asserted on disk."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from yodel_etl_spark.io.layout import write_clustered
from yodel_etl_spark.session import load_tables


def _plan(df) -> str:
    # "formatted" explain prints the full scan metadata sections —
    # plain executedPlan().toString() truncates them at
    # maxMetadataStringLength
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _write_events(spark, sf_small, tmp_path) -> str:
    ev = load_tables(spark, sf_small, ("events",))["events"]
    out = str(tmp_path / "events_clustered")
    write_clustered(
        ev.withColumn("event_date", F.to_date("ts")),
        out,
        partition_by=("event_date",),
        sort_by=("user_id",),
    )
    return out


def test_partition_pruning(spark, sf_small, tmp_path):
    out = _write_events(spark, sf_small, tmp_path)
    days = sorted(
        os.path.basename(d) for d in glob.glob(f"{out}/event_date=*")
    )
    assert len(days) > 1, "need multiple partition dirs for a pruning test"
    one_day = days[0].split("=", 1)[1]
    q = spark.read.parquet(out).where(F.col("event_date") == one_day)
    plan = _plan(q)
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # runtime scan metrics prove the pruning actually happened: exactly
    # one partition directory and one file were read
    q.collect()
    scan = q._jdf.queryExecution().executedPlan().collectLeaves().head()
    metrics = scan.metrics()
    assert metrics.apply("numPartitions").value() == 1
    assert metrics.apply("numFiles").value() == 1


def test_sort_key_filter_pushdown_and_file_layout(spark, sf_small, tmp_path):
    out = _write_events(spark, sf_small, tmp_path)
    q = spark.read.parquet(out).where(F.col("user_id") == 7).select("event_id")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in plan
    # one shuffle on the partition key -> one file per partition dir
    for d in glob.glob(f"{out}/event_date=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"
    # rows inside each file are sorted by user_id (row-group min/max
    # are range-disjoint, so stats-based skipping is effective)
    import pyarrow.parquet as pq

    some_file = glob.glob(f"{out}/event_date=*/*.parquet")[0]
    uid = pq.read_table(some_file, columns=["user_id"])["user_id"].to_pylist()
    assert uid == sorted(uid)


def test_round_trip_values(spark, sf_small, tmp_path):
    ev = load_tables(spark, sf_small, ("events",))["events"]
    out = _write_events(spark, sf_small, tmp_path)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    a = {r["event_id"] for r in ev.select("event_id").collect()}
    b = {r["event_id"] for r in back.select("event_id").collect()}
    assert a == b
