"""Grouping-set pass-throughs (SURVEY §2.4: the reference has no
cube/rollup, but the engine exposes Spark's built-ins as first-class
surface) + approximate distinct counting.

Scale: cube/rollup expand to grouping sets in ONE shuffle (Spark tags
rows with grouping ids map-side); ``approx_count_distinct`` (HLL++)
keeps distinct-counting mergeable — the 100 TB answer to exact
``countDistinct``'s two-shuffle plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.queries._util import cents, money
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables


@register(
    "rollup_revenue",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           CAST(grouping(o_orderpriority) AS INT) * 2 + CAST(grouping(o_orderstatus) AS INT) AS gid,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP hierarchy (priority → status → grand total) in one "
    "shuffle; grouping() ids disambiguate NULL-as-ALL from real NULLs.",
    tags=("grouping",),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(cents("o_totalprice"))).alias("total_price"),
            (F.grouping("o_orderpriority") * 2 + F.grouping("o_orderstatus")).alias("gid"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.col("gid").cast("int").alias("gid"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "cube_lineitem_flags",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) AS INT) * 2 + CAST(grouping(l_linestatus) AS INT) AS gid,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus): all 4 grouping sets in one "
    "pass/shuffle with map-side partial aggregation.",
    tags=("grouping",),
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("gid").cast("int").alias("gid"),
            "n_items",
            "sum_qty",
        )
    )


@register(
    "distinct_counts",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact per-group distinct (expand+two-phase agg).  The HLL++ "
    "scale path (approx_count_distinct, mergeable sketches, one "
    "shuffle) is asserted within 5%% relative error in "
    "tests/test_grouping.py — approximate results cannot hash-match an "
    "oracle, so the exact form is what the driver checks.",
    tags=("grouping",),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
