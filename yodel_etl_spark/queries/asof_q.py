"""As-of join query: attribute each error event to the user's most
recent prior non-error action — DuckDB's native ``ASOF LEFT JOIN`` is
the oracle for our union-window formulation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.ops.asof import asof_join_backward
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables


@register(
    "asof_last_action",
    oracle="""
    WITH err AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), act AS (
      SELECT user_id, ts,
             max_by(event_id, event_id) AS a_id,
             max_by(event_type, event_id) AS a_type,
             max_by(value, event_id) AS a_value
      FROM events WHERE event_type <> 'error'
      GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts,
           a.a_id AS asof_a_id,
           a.a_type AS asof_a_type,
           a.a_value AS asof_a_value
    FROM err e ASOF LEFT JOIN act a
      ON e.user_id = a.user_id AND a.ts <= e.ts
    """,
    doc="As-of backward join via union + window last(ignorenulls) — one "
    "shuffle, linear in |L|+|R| (vs the inequality-join cross product); "
    "right side pre-deduped per (key, ts) with max_by so the match is "
    "unique.  Oracle: DuckDB native ASOF LEFT JOIN.",
    tags=("asof", "join"),
)
def asof_last_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    err = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    act = (
        ev.where(F.col("event_type") != "error")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("a_id"),
            F.max_by("event_type", "event_id").alias("a_type"),
            F.max_by("value", "event_id").alias("a_value"),
        )
    )
    return asof_join_backward(
        err, act, ["user_id"], "ts", "ts", ["a_id", "a_type", "a_value"]
    )
