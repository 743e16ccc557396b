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
