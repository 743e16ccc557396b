"""SCD type-2 dimension-history query over the events change log.

``events`` plays the CDC feed: per user, the stream of ``event_type``
observations folds into validity intervals (one row per run of equal
consecutive values).  See ops/scd.py for the one-shuffle plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yodel_etl_spark.ops.scd import scd2_history
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables


@register(
    "scd2_user_history",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_type, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, event_type, ts, event_id
      FROM o WHERE prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM s
    """,
    doc="SCD2 dimension history from a change log: consecutive equal "
    "event_type observations per user collapse into validity intervals "
    "(valid_from / half-open valid_to / is_current).  One shuffle on "
    "the key — change detection and interval closing are two window "
    "passes over the same (partition, order) spec, and each run is "
    "represented by its first row so no groupBy is needed.  The "
    "engine extension past the reference's last-value-wins fold "
    "(test_chat_assistant.py:59-69): keep the history, not just the "
    "final value.",
    tags=("window", "scd"),
    bench=True,
    tier=1,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return scd2_history(ev, "user_id", "ts", "event_type", tiebreak_col="event_id")


@register(
    "cdc",
    oracle="""
    WITH base AS (
      SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-16'
      ) WHERE rn = 1
    ), latest AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM (
        SELECT user_id, ts, event_type, value, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-16'
      ) WHERE rn = 1
    )
    SELECT b.user_id, b.ts, b.event_type, b.value FROM base b
    WHERE b.user_id NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT user_id, ts, event_type, value FROM latest WHERE op <> 'D'
    """,
    doc="CDC MERGE / upsert apply (SCD type 1 — the lakehouse MERGE "
    "INTO): the month of events splits into a keyed snapshot (latest "
    "per-user state before Jan 16) and a change log (the rest, with "
    "event_type='error' playing the delete op); ops/cdc.apply_changes "
    "folds the log into the snapshot — latest change per key wins, "
    "deletes drop the row, unseen keys pass through.  The per-key "
    "window shuffles ONLY the delta; the snapshot is touched once by "
    "the key anti-join (broadcast-able when delta ≪ snapshot, "
    "exchange-free when the snapshot is bucketed on the key).  "
    "Deterministic: (ts, event_id) totally orders changes within a "
    "key.  Tier 2: yields its driver-window slot; parity via pytest "
    "oracle suite.",
    tags=("cdc", "merge", "scale"),
    bench=True,
    tier=2,
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from yodel_etl_spark.ops.cdc import apply_changes

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cut = F.lit("2024-01-16").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        ev.where(F.col("ts") < cut)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", "event_type", "value")
    )
    changes = ev.where(F.col("ts") >= cut).select(
        "user_id",
        "ts",
        "event_type",
        "value",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return apply_changes(
        base,
        changes,
        keys=("user_id",),
        order_by=("ts", "event_id"),
        op_col="op",
        broadcast_changes=True,
    )
