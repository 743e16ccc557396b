"""Event-time window queries (SURVEY §2.9) — the batch twins of the
streaming operators in yodel_etl_spark.streaming.events, verified
against DuckDB time_bucket / gaps-and-islands oracles.

(Session timezone is pinned UTC in load_tables, so window boundaries
are engine-identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.queries._util import cents
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables
from yodel_etl_spark.streaming.events import (
    enrich_with_dim,
    session_windows,
    sliding_counts,
    tumbling_counts,
)


@register(
    "ev_hourly",  # r11 rename of events_tumbling_hourly (byte budget; BASELINE.md bullet)
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1-hour event-time window per type — the streaming "
    "aggregation shape (watermark + window) in its batch form.",
    tags=("window", "streaming"),
    bench=True,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return tumbling_counts(ev, "1 hour", value_cents=cents("value"))


@register(
    "events_sliding_counts",
    oracle="""
    WITH k AS (SELECT 0 AS off UNION ALL SELECT 1),
    win AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - off * INTERVAL '30 minutes' AS window_start
      FROM events, k
    )
    SELECT window_start, count(*) AS n_events
    FROM win GROUP BY 1
    """,
    doc="Sliding window (1h / 30m slide): every event lands in 2 "
    "windows; oracle materializes the two offsets explicitly.",
    tags=("window", "streaming"),
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return sliding_counts(ev, "1 hour", "30 minutes")


@register(
    # r14 byte-budget rename: events_session_windows -> evsw (same
    # registration slot, rotation position unchanged; funds the `delw`
    # stdout cost — see the BASELINE.md round-14 bullet for the map)
    "evsw",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
      FROM events
    ), isl AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS session_no
      FROM g
    )
    , sess AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts, count(*) AS n_events
      FROM isl GROUP BY user_id, session_no
    )
    SELECT s.user_id, s.first_ts, s.last_ts, s.n_events,
           count(*) AS n_in_interval
    FROM sess s JOIN events e
      ON e.user_id = s.user_id AND e.ts BETWEEN s.first_ts AND s.last_ts
    GROUP BY 1, 2, 3, 4
    """,
    doc="Per-user session windows (30-min inactivity gap; session_window "
    "in Spark vs. gaps-and-islands oracle) + the range "
    "(interval-containment) join counting each session's events via the "
    "time-bucketed equi-join rewrite — a raw BETWEEN join plans as a "
    "nested-loop O(points × intervals); binning turns it into one "
    "shuffle on (user, bucket) with exact containment in the join "
    "condition (oracle: the literal BETWEEN join).  Same session grain, "
    "so both operators share one registry slot; n_in_interval == "
    "n_events is the built-in cross-check that the rewrite loses "
    "nothing (sessions partition each user's events).",
    tags=("window", "streaming", "sessionize", "join"),
    bench=True,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.ops.interval import interval_join

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sessions = session_windows(ev, "30 minutes")  # user_id, first_ts, last_ts, n_events
    pts = ev.select("user_id", "ts", "event_id")
    joined = interval_join(
        pts,
        sessions,
        pt_col="ts",
        start_col="first_ts",
        end_col="last_ts",
        keys=("user_id",),
        bucket_seconds=1800,
    )
    return joined.groupBy("user_id", "first_ts", "last_ts", "n_events").agg(
        F.count(F.lit(1)).alias("n_in_interval")
    )


@register(
    "ev_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="Stream–static enrichment: events ⋈ broadcast customer dim "
    "(user_id = c_custkey) → per (segment, type) counts.  The stream "
    "side never shuffles for the join; the same function runs on a "
    "readStream frame in tests/test_streaming.py.",
    tags=("streaming", "join"),
    bench=True,
)
def events_enriched_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events", "customer"))
    ev, cust = t["events"], t["customer"]
    joined = enrich_with_dim(
        ev,
        cust.select("c_custkey", "c_mktsegment"),
        on=ev["user_id"] == cust["c_custkey"],
        how="inner",
    )
    return joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum(cents("value")) / 100.0).alias("total_value"),
    )


@register(
    "events_first_seen",
    oracle="""
    SELECT user_id, event_type, first_ts, first_event_id FROM (
      SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Keep-first dedup per (user, type): min_by over the total order "
    "(ts, event_id) — the deterministic batch twin of streaming "
    "dropDuplicatesWithinWatermark (which keeps the first *arrival*; "
    "equivalence on an exactly-redelivered feed is asserted in "
    "tests/test_streaming.py).",
    tags=("streaming", "dedup"),
)
def events_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    order = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.min_by("event_id", order).alias("first_event_id"),
    )


@register(
    "ev_daily",  # r12 rename of events_daily_rollup (byte budget; green r11)
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Hypertable-style continuous aggregate: the daily rollup is "
    "derived from hourly PARTIALS (exact cents + counts), not from raw "
    "events — at 100 TB the coarse rollup reads |hours| rows instead "
    "of |events|.  Sums/counts re-aggregate exactly; the oracle is the "
    "direct daily aggregate over raw events.",
    tags=("window", "grouping"),
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.ops.interval import rollup_from_partials

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents("value")).alias("vc"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "vc")
    )
    daily = rollup_from_partials(
        hourly,
        "hour_start",
        "1 day",
        sum_cols=("vc",),
        count_col="n_events",
        keys=("event_type",),
    )
    return daily.select(
        "window_start",
        "event_type",
        "n_events",
        (F.col("vc") / 100.0).alias("total_value"),
    )


@register(
    "ev_types",  # r12 rename of events_type_profile (byte budget; green r11)
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_value,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(min(value), 4) AS v_min,
           round(max(value), 4) AS v_max
    FROM events
    GROUP BY event_type
    """,
    doc="A2 success/failure-style counters (convert_json_to_text.py:"
    "196-227, distributed form) merged with exact per-type value "
    "percentiles in the same single-shuffle aggregate.  Exact "
    "percentile() (sort-based, linear interpolation — same definition "
    "as DuckDB quantile_cont) is what the oracle checks; the 100 TB "
    "path swaps in percentile_approx (mergeable KLL-style sketch, one "
    "pass, no per-group sort).",
    tags=("agg", "streaming", "sampling"),
)
def events_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    n = F.count(F.lit(1))
    sum_cents = F.sum(cents("value"))
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        (sum_cents / 100.0).alias("total_value"),
        (sum_cents / 100.0 / n).alias("avg_value"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )


@register(
    "replay",
    oracle=None,  # runs the REAL streaming engine (FileStreamSource +
    # state store); result ≡ the oracle-backed evsw (events_session_windows
    # session grain, pinned by tests/test_streaming.py's replay
    # equivalence test — a SQL oracle here would only re-state the
    # batch twin's, while the interesting surface is the machinery
    doc="Streaming micro-bench: the events table replayed through a "
    "bounded file-source stream (readStream + availableNow) into the "
    "session_windows aggregation and drained to a memory sink — "
    "records structured-streaming throughput at bench SF as a "
    "first-class number instead of leaving streaming proofs on tiny "
    "inline frames.  Complete mode is correct because the replay is "
    "bounded (final state ≡ batch answer); the sink holds only the "
    "session grain.  Scale path: same plan over a real file feed with "
    "update mode + watermark (state bounded by the gap + delay).",
    tags=("streaming", "events", "bench"),
    bench=True,
)
def replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.streaming.events import (
        replay_file_stream,
        run_replay_to_table,
    )

    load_tables(spark, sf_dir, ())  # pin runtime confs (nanosAsLong, UTC)
    stream = replay_file_stream(spark, sf_dir, "events")
    sess = session_windows(stream, "30 minutes")
    return run_replay_to_table(sess, "replay")
