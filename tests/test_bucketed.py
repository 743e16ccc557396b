"""Bucketed co-located join: same-key/same-count bucketed tables must
join AND aggregate with no shuffle exchange at all, and results must
equal the plain join."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from yodel_etl_spark.io.bucketed import drop_bucketed, write_bucketed
from yodel_etl_spark.session import load_tables


@contextmanager
def _no_broadcast(spark):
    """Force shuffle-based planning so the test exercises the bucketed
    sort-merge path rather than a broadcast join."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_and_agg_have_no_exchange(spark, sf_small, tmp_path):
    t = load_tables(spark, sf_small, ("lineitem", "orders"))
    li = t["lineitem"].select(F.col("l_orderkey").alias("okey"), "l_quantity")
    o = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    try:
        bli = write_bucketed(li, "b_li", str(tmp_path / "b_li"), ("okey",), 4)
        bo = write_bucketed(o, "b_o", str(tmp_path / "b_o"), ("okey",), 4)
        with _no_broadcast(spark):
            joined = bli.join(bo, "okey")
            # groupBy on the bucket key: the agg's distribution is also
            # already satisfied — the whole pipeline is shuffle-free
            agg = joined.groupBy("okey").agg(F.sum("l_quantity").alias("qty"))
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and it is not just a pretty plan — results match plain join
            plain = (
                li.join(o, "okey").groupBy("okey").agg(F.sum("l_quantity").alias("qty"))
            )
            assert sorted(map(tuple, agg.collect())) == sorted(
                map(tuple, plain.collect())
            )
    finally:
        drop_bucketed(spark, "b_li")
        drop_bucketed(spark, "b_o")


def test_unbucketed_join_needs_exchange(spark, sf_small):
    """Control: the same join without bucketing plans shuffles — proves
    the bucketed test is asserting something real."""
    t = load_tables(spark, sf_small, ("lineitem", "orders"))
    li = t["lineitem"].select(F.col("l_orderkey").alias("okey"), "l_quantity")
    o = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    with _no_broadcast(spark):
        plan = li.join(o, "okey")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
