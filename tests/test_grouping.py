"""Grouping-set surface + the HLL++ scale path for distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from yodel_etl_spark.session import load_tables


def test_approx_count_distinct_within_5pct(spark, sf_small):
    """The 100 TB path for distinct counting: mergeable HLL++ sketches,
    one shuffle (vs exact distinct's expand + two-phase agg)."""
    o = load_tables(spark, sf_small, ("orders",))["orders"]
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(0.05 * r["exact"], 2), r


def test_rollup_gid_semantics(spark, sf_small):
    """grouping() ids disambiguate the ALL rows from genuine values."""
    from yodel_etl_spark.registry import load_all

    df = load_all()["rollup_revenue"].build(spark, sf_small)
    rows = df.collect()
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["priority"] == "ALL" and grand[0]["status"] == "ALL"
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in rows if r["gid"] == 0)
