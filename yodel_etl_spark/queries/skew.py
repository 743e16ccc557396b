"""Skew-posture queries: salted two-phase distinct aggregation and the
replicated-salt join, oracle-checked against the plain (unsalted) SQL —
the rewrites are exact, so the DuckDB oracle is just the direct form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.queries._util import cents, money
from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.skew import replicate_salt_join, salted_agg
from yodel_etl_spark.session import load_tables


@register(
    "skew_dusers",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="Per-event-type distinct users + totals via salted two-phase "
    "aggregation: only 5 group keys exist, so the direct plan funnels "
    "every row to 5 reducers at 100 TB; salting on the distinct column "
    "spreads phase 1 over 32× more reducers and phase 2 merges one tiny "
    "partial row per (type, salt).  Exact — oracle is the plain GROUP BY.",
    tags=("skew", "grouping"),
    bench=True,
)
def skew_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return salted_agg(
        ev,
        group_cols=("event_type",),
        spread_by=("user_id",),  # salt = f(distinct col) → exact distinct
        partial=(
            F.countDistinct("user_id").alias("pd_users"),
            F.count(F.lit(1)).alias("pn"),
            F.sum(cents("value")).alias("pc"),
        ),
        final=(
            F.sum("pd_users").alias("n_users"),
            F.sum("pn").alias("n_events"),
            money(F.sum("pc")).alias("sum_value"),
        ),
        buckets=32,
    )


@register(
    "skew_join",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) AS n_items,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
               AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="lineitem ⋈ orders through the replicated-salt join (buckets=8, "
    "spread by line number within the order key), then revenue per "
    "priority.  Demonstrates the hot-key escape hatch for when AQE "
    "skew-split cannot apply (post-join key-grouped consumers); the "
    "rewrite is exact, so the oracle is the plain join.",
    tags=("skew", "join"),
    bench=True,
)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"), "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    joined = replicate_salt_join(
        li, o, on=("okey",), spread_by=("okey", "l_linenumber"), buckets=8
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))).alias(
                "revenue"
            ),
        )
    )
