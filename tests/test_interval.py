"""Interval-join semantics: containment inclusive on both ends, one
output row per (point, containing interval) even when the interval
spans many buckets, and left-join null extension for uncontained
points."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yodel_etl_spark.ops.interval import interval_join


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_interval_join_contains_and_multibucket(spark):
    pts = spark.createDataFrame(
        [(1, _ts(0, 30), "in_a"), (1, _ts(5, 0), "in_a_late"), (1, _ts(9, 0), "outside")],
        "uid int, ts timestamp, tag string",
    )
    # interval a spans 0:00-6:00 = 7 buckets at 1h; b belongs to uid 2
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(6), "a"), (2, _ts(0), _ts(23), "b")],
        "uid int, lo timestamp, hi timestamp, name string",
    )
    out = interval_join(pts, iv, "ts", "lo", "hi", keys=("uid",), bucket_seconds=3600)
    got = sorted((r["tag"], r["name"]) for r in out.collect())
    assert got == [("in_a", "a"), ("in_a_late", "a")]


def test_interval_join_inclusive_bounds(spark):
    pts = spark.createDataFrame(
        [(1, _ts(1, 0), "at_start"), (1, _ts(2, 0), "at_end")],
        "uid int, ts timestamp, tag string",
    )
    iv = spark.createDataFrame(
        [(1, _ts(1), _ts(2), "x")], "uid int, lo timestamp, hi timestamp, name string"
    )
    out = interval_join(pts, iv, "ts", "lo", "hi", keys=("uid",))
    assert out.count() == 2


def test_interval_join_left_null_extends(spark):
    pts = spark.createDataFrame(
        [(1, _ts(0, 30), "hit"), (1, _ts(0, 45), "miss_contained")],
        "uid int, ts timestamp, tag string",
    )
    # bucket matches both points (same hour) but only contains the first
    iv = spark.createDataFrame(
        [(1, _ts(0, 0), _ts(0, 40), "x")],
        "uid int, lo timestamp, hi timestamp, name string",
    )
    out = interval_join(pts, iv, "ts", "lo", "hi", keys=("uid",), how="left")
    rows = {r["tag"]: r["name"] for r in out.collect()}
    assert rows == {"hit": "x", "miss_contained": None}
