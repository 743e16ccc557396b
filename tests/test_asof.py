"""As-of join: bucketed hot-key form ≡ plain union-window form."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yodel_etl_spark.ops.asof import asof_join_backward, asof_join_backward_bucketed
from yodel_etl_spark.session import load_tables


def _key(rows):
    return sorted(
        (r["event_id"], r["asof_value"]) for r in rows
    )


def test_bucketed_equals_plain_on_events(spark, sf_small):
    ev = load_tables(spark, sf_small, ("events",))["events"]
    # left = click-ish events, right = view-ish events, per user; right
    # timelines deduplicated on ts (the operators' tie precondition)
    left = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    right = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    plain = asof_join_backward(
        left, right, ["user_id"], "ts", "ts", ["value"]
    ).select("event_id", F.col("asof_value"))
    bucketed = asof_join_backward_bucketed(
        left, right, ["user_id"], "ts", "ts", ["value"], bucket_seconds=3600
    ).select("event_id", F.col("asof_value"))
    assert _key(plain.collect()) == _key(bucketed.collect())
    assert plain.count() == left.count()


def test_bucketed_carry_spans_empty_buckets(spark):
    # right rows only in bucket 0; left rows many buckets later — the
    # carry must propagate across the empty buckets in between
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(days=7), 100), (1, t0 - dt.timedelta(hours=1), 101)],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [(1, t0, "early"), (1, t0 + dt.timedelta(hours=2), "late")],
        ["k", "ts", "val"],
    )
    out = {
        r["lid"]: r["asof_val"]
        for r in asof_join_backward_bucketed(
            left, right, ["k"], "ts", "ts", ["val"], bucket_seconds=86400
        ).collect()
    }
    assert out == {100: "late", 101: None}


def test_bucketed_window_partitions_on_bucket(spark):
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, 1)], ["k", "ts", "lid"])
    right = spark.createDataFrame([(1, t0, "v")], ["k", "ts", "val"])
    plan = (
        asof_join_backward_bucketed(left, right, ["k"], "ts", "ts", ["val"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the data-bearing window must partition on (key, bucket), not the
    # bare key: hot keys split across time buckets.  Assert the partition
    # spec explicitly — windowspecdefinition(k#N, _b#N, _ts# ...) — so a
    # regression to partitionBy(k) alone fails here.
    import re

    assert re.search(
        r"windowspecdefinition\(k#\d+L?,_b#\d+L?,_ts#", plan.replace(" ", "")
    ), plan
    assert any(
        "_ts" in ln and "_side" in ln and "_b" in ln
        for ln in plan.splitlines()
        if "Window" in ln
    ), plan
