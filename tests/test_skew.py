"""Skew utilities are EXACT rewrites: salted two-phase aggregation and
the replicated-salt join must equal their direct (unsalted) forms row
for row; the join must preserve left-outer nulls and reject
right-preserving modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.registry import load_all
from yodel_etl_spark.scale.skew import replicate_salt_join, salted_agg, with_salt
from yodel_etl_spark.session import load_tables


def _rows(df, *sort_cols):
    return [tuple(r) for r in df.orderBy(*sort_cols).collect()]


def test_salted_agg_equals_direct(spark, sf_small):
    ev = load_tables(spark, sf_small, ("events",))["events"]
    direct = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    salted = salted_agg(
        ev,
        group_cols=("event_type",),
        spread_by=("user_id",),
        partial=(
            F.countDistinct("user_id").alias("pd"),
            F.count(F.lit(1)).alias("pn"),
        ),
        final=(F.sum("pd").alias("n_users"), F.sum("pn").alias("n_events")),
        buckets=7,  # deliberately not a power of two
    )
    assert _rows(salted, "event_type") == _rows(direct, "event_type")


def test_salt_is_deterministic_and_bounded(spark, sf_small):
    ev = load_tables(spark, sf_small, ("events",))["events"]
    s1 = with_salt(ev, ("user_id",), 16).select("_salt")
    lo, hi = s1.agg(F.min("_salt"), F.max("_salt")).first()
    assert 0 <= lo and hi <= 15
    # same inputs → same salts (deterministic hash, no rand())
    a = with_salt(ev, ("user_id",), 16).groupBy("_salt").count()
    b = with_salt(ev, ("user_id",), 16).groupBy("_salt").count()
    assert _rows(a, "_salt") == _rows(b, "_salt")


def test_replicate_salt_join_equals_plain_inner(spark, sf_small):
    t = load_tables(spark, sf_small, ("lineitem", "orders"))
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"), "l_linenumber", "l_quantity"
    )
    o = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    plain = li.join(o, "okey")
    salted = replicate_salt_join(li, o, ("okey",), ("okey", "l_linenumber"), buckets=5)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_replicate_salt_join_left_outer_preserves_unmatched(spark, sf_small):
    t = load_tables(spark, sf_small, ("lineitem", "orders"))
    li = t["lineitem"].select(F.col("l_orderkey").alias("okey"), "l_linenumber")
    # drop half the orders so some left rows have no match
    o = t["orders"].where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    plain = li.join(o, "okey", "left")
    salted = replicate_salt_join(li, o, ("okey",), ("okey", "l_linenumber"), buckets=3, how="left")
    assert sorted(map(lambda r: tuple(r), salted.collect())) == sorted(
        map(lambda r: tuple(r), plain.collect())
    )
    # unmatched rows really exist (the test is not vacuous)
    assert salted.where(F.col("o_orderpriority").isNull()).count() > 0


def test_replicate_salt_join_rejects_right_preserving():
    with pytest.raises(ValueError, match="supports"):
        replicate_salt_join(None, None, ("k",), ("k",), how="right")


def test_skew_queries_match_plain_sql(spark, sf_small):
    qs = load_all()
    for name in ("skew_dusers", "skew_join"):
        df = qs[name].build(spark, sf_small)
        assert df.count() > 0
