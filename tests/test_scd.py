"""SCD2 history semantics: run compression, tie-breaks, sentinel."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yodel_etl_spark.ops.scd import scd2_history


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_runs_collapse_and_intervals(spark):
    rows = [
        # key 1: A A B A  -> runs A, B, A
        (1, _ts("2024-01-01T00:00:00"), "A", 1),
        (1, _ts("2024-01-01T01:00:00"), "A", 2),
        (1, _ts("2024-01-01T02:00:00"), "B", 3),
        (1, _ts("2024-01-01T03:00:00"), "A", 4),
        # key 2: single observation
        (2, _ts("2024-01-01T00:30:00"), "X", 5),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "attr", "eid"])
    out = scd2_history(df, "k", "ts", "attr", tiebreak_col="eid")
    got = {
        (r.k, r.attr, r.valid_from.isoformat()): (r.valid_to.isoformat(), r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, "A", "2024-01-01T00:00:00"): ("2024-01-01T02:00:00", False),
        (1, "B", "2024-01-01T02:00:00"): ("2024-01-01T03:00:00", False),
        (1, "A", "2024-01-01T03:00:00"): ("2200-01-01T00:00:00", True),
        (2, "X", "2024-01-01T00:30:00"): ("2200-01-01T00:00:00", True),
    }
    # intervals tile the key's observed range: each run's valid_to is
    # the next run's valid_from
    assert out.where(F.col("valid_to") < F.col("valid_from")).isEmpty()


def test_scd2_equal_ts_ties_are_deterministic(spark):
    # two observations at the identical timestamp: the tiebreak column
    # decides run order, so output is stable across shuffles
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "A", 10),
        (1, _ts("2024-01-01T00:00:00"), "B", 11),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "attr", "eid"])
    out = scd2_history(df, "k", "ts", "attr", tiebreak_col="eid").collect()
    assert [(r.attr, r.is_current) for r in sorted(out, key=lambda r: r.valid_to)] == [
        ("A", False),
        ("B", True),
    ]


def test_scd2_null_attr_runs_collapse(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), None, 1),
        (1, _ts("2024-01-01T01:00:00"), None, 2),
        (1, _ts("2024-01-01T02:00:00"), "A", 3),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "attr", "eid"])
    out = scd2_history(df, "k", "ts", "attr", tiebreak_col="eid").collect()
    assert len(out) == 2  # NULL run collapsed into one interval
    assert sorted(((r.attr, r.is_current) for r in out), key=lambda t: str(t[0])) == [
        ("A", True),
        (None, False),
    ]


def test_scd2_single_shuffle_plan(spark):
    rows = [(1, _ts("2024-01-01T00:00:00"), "A", 1)]
    df = spark.createDataFrame(rows, ["k", "ts", "attr", "eid"])
    plan = scd2_history(df, "k", "ts", "attr", tiebreak_col="eid")._jdf.queryExecution().executedPlan().toString()
    # both window passes share the (key, order) spec: exactly one
    # exchange in the whole plan
    assert plan.count("Exchange") == 1, plan
