"""Core relational surface: scan → filter → join → aggregate → window.

The reference performs no relational joins (SURVEY.md §2.3) — correlation
is nested iteration (extract_chat_qa_tsv.py:151-161).  The engine exposes
Spark's full join/agg/window surface as first-class pass-through; these
queries pin its semantics against the DuckDB oracle and are the
scale-critical plans (star joins at 100 TB).

Scale notes per query are inline; the common posture:
  * dims (region/nation/customer/supplier/part) are broadcast — no
    shuffle of the fact table for star joins;
  * aggregates are partial (map-side combine) because they are
    sum/count/min/max of longs — Catalyst does this automatically;
  * exact integer cents arithmetic keeps results shuffle-order-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.queries._util import cents
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables


@register(
    "flagship",
    oracle="""
    SELECT n.n_name,
           r.r_name,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders   o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation   n ON c.c_nationkey = n.n_nationkey
    JOIN region   r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus <> 'X'
    GROUP BY n.n_name, r.r_name
    """,
    doc="Flagship star join: lineitem⋈orders⋈customer⋈nation⋈region, "
    "revenue by nation.  Dims broadcast; single shuffle on the group key.",
    tags=("join", "agg"),
    bench=True,
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region"))
    revenue = cents(t["lineitem"].l_extendedprice * (1 - t["lineitem"].l_discount))
    return (
        t["lineitem"]
        .join(t["orders"].where(F.col("o_orderstatus") != "X"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            (F.sum(revenue) / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_disc_price,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_charge,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_qty,
           CAST(SUM(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) / 10000.0 / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary — full-scan agg throughput probe. "
    "Pure map-side-combinable aggregates; filter pushed to parquet scan.",
    tags=("agg", "scan"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    li = li.where(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
        (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
        (F.sum(cents(disc_price)) / 100.0).alias("sum_disc_price"),
        (F.sum(cents(charge)) / 100.0).alias("sum_charge"),
        (F.sum(cents("l_quantity")) / 100.0 / n).alias("avg_qty"),
        (F.sum((F.round(F.col("l_discount") * 10000)).cast("long")) / 10000.0 / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "topord",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice_r, rk
    FROM (
      SELECT c.c_custkey, c.c_name, o.o_orderkey,
             round(o.o_totalprice * 100) / 100.0 AS o_totalprice_r,
             row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY round(o.o_totalprice * 100) DESC, o.o_orderkey
             ) AS rk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rk <= 3
    """,
    doc="Window top-k: row_number over (custkey, price desc) — the engine's "
    "per-group LIMIT (reference analogue: first-12-chunks cap, "
    "test_chat_assistant_with_judge.py:207).  One shuffle on custkey "
    "serves both the join (post-broadcast) and the window.",
    tags=("window", "join"),
    bench=True,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    price_cents = cents("o_totalprice")
    w = Window.partitionBy("c_custkey").orderBy(price_cents.desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            (price_cents / 100.0).alias("o_totalprice_r"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "brand_part_stats",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_items,
           CAST(SUM(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_qty,
           count(DISTINCT l.l_suppkey) AS n_suppliers
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Broadcast-join fact⋈dim + distinct agg. part is tiny → broadcast; "
    "countDistinct expands to a two-phase agg Spark plans automatically.",
    tags=("join", "agg"),
)
def brand_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(cents("l_quantity")) / 100.0).alias("total_qty"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


@register(
    "segprio",
    oracle="""
    SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderpriority
    """,
    doc="Two-key rollup feed (A1 value-counts generalization).",
    tags=("join", "agg"),
)
def segment_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("total_price"),
        )
    )


@register(
    "orders_semi_anti",
    oracle="""
    SELECT 'with_lineitems' AS bucket, count(*) AS n FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    UNION ALL
    SELECT 'without_lineitems' AS bucket, count(*) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    doc="Semi/anti join surface (engine pass-through; no reference analogue "
    "— SURVEY §2.3 extension).",
    tags=("join",),
)
def orders_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    on = F.col("l_orderkey") == F.col("o_orderkey")
    semi = t["orders"].join(t["lineitem"], on, "left_semi").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("with_lineitems").alias("bucket"), "n"
    )
    anti = t["orders"].join(t["lineitem"], on, "left_anti").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("without_lineitems").alias("bucket"), "n"
    )
    return semi.unionByName(anti)


@register(
    "set_ops_customers",
    oracle="""
    SELECT c_custkey, 'both' AS bucket FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT c_custkey, 'building_only' AS bucket FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
    doc="Set-operation pass-through (SURVEY §2.7): INTERSECT and EXCEPT "
    "(both shuffle-dedup on the key) unioned with a tag column.",
    tags=("relational", "setops"),
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    building = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    both = building.intersect(urgent).select("c_custkey", F.lit("both").alias("bucket"))
    only = building.exceptAll(urgent).distinct().select(
        "c_custkey", F.lit("building_only").alias("bucket")
    )
    return both.unionByName(only)


@register(
    "top_events_global",
    oracle="""
    SELECT event_id, event_type, round(value, 2) AS value_r
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 100
    """,
    doc="Global sort + limit (SURVEY §2.7): TakeOrderedAndProject — the "
    "planner turns orderBy+limit into a per-partition top-k + driver "
    "merge, never a full sort of the table; ties broken by event_id "
    "for determinism.",
    tags=("relational", "sort"),
)
def top_events_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.orderBy(F.col("value").desc(), "event_id")
        .limit(100)
        .select("event_id", "event_type", F.round("value", 2).alias("value_r"))
    )


@register(
    "supplier_topk",
    oracle="""
    SELECT n_name, s_name, revenue, rk
    FROM (
      SELECT n.n_name, s.s_name,
             CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS revenue,
             row_number() OVER (
               PARTITION BY n.n_name
               ORDER BY SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) DESC,
                        s.s_suppkey
             ) AS rk
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation   n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name, s.s_name, s.s_suppkey
    ) WHERE rk <= 3
    """,
    doc="Supplier-side star probe (TPC-H Q5/Q15 shape): top-3 suppliers "
    "by lineitem revenue within each nation.  supplier and nation "
    "broadcast so the fact table never shuffles for the joins; the "
    "fact-sized exchange is the (nation, supplier) aggregate — the "
    "rank window then repartitions only supplier-grain rows; exact "
    "integer cents keep the hash shuffle-order-proof.  Tier 2: yields its "
    "driver-window slot; parity via pytest oracle suite + driver-sim.",
    tags=("join", "agg", "window"),
    bench=True,
    tier=2,
)
def supplier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    revenue_cents = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "s_name", "s_suppkey")
        .agg(F.sum(revenue_cents).alias("_rev_cents"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("_rev_cents"), F.col("s_suppkey"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "n_name",
            "s_name",
            (F.col("_rev_cents") / 100.0).alias("revenue"),
            "rk",
        )
    )
