"""Sessionization queries (SURVEY §2.5 W1-W3, §2.4 A5) bound to the
``events`` table: each user's event stream becomes an ordered message
array (view→assistant, click→user), then the reference's first-QA walk
runs as pure array expressions.

Scale: one shuffle (groupBy user) for the array build — the minimum any
per-session semantic costs — then narrow.  The A5 last-value-wins query
is a single partial-aggregable max_by-style reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.ops.sessionize import collect_messages, first_qa
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables

_ROLE_SQL = "CASE event_type WHEN 'view' THEN 'assistant' WHEN 'click' THEN 'user' ELSE event_type END"

_QA_CTES = f"""
    WITH typed AS (
      SELECT user_id, ts, event_id,
             {_ROLE_SQL} AS role,
             CAST(event_id AS VARCHAR) AS content
      FROM events
    ), packed AS (
      SELECT user_id,
             list(struct_pack(role := role, content := content) ORDER BY ts, event_id) AS msgs
      FROM typed GROUP BY user_id
    ), dropped AS (
      SELECT user_id,
             CASE WHEN len(msgs) > 0 AND msgs[1].role = 'assistant'
                  THEN msgs[2:] ELSE msgs END AS msgs
      FROM packed
    ), located AS (
      SELECT user_id, msgs,
             coalesce(list_position(list_transform(msgs, m -> m.role), 'user'), 0) AS uidx
      FROM dropped
    ), walked AS (
      SELECT user_id, msgs, uidx,
             msgs[uidx+1:] AS tail
      FROM located
    ), taken AS (
      SELECT user_id, msgs, uidx,
             CASE WHEN coalesce(list_position(list_transform(tail, m -> m.role = 'assistant'), false), 0) = 0
                  THEN tail
                  ELSE tail[1:list_position(list_transform(tail, m -> m.role = 'assistant'), false) - 1]
             END AS replies
      FROM walked
    )
"""

_FIRST_QA_SELECT = """
    SELECT user_id,
           CASE WHEN uidx > 0
                THEN trim(regexp_replace(coalesce(msgs[uidx].content, ''), '[\\t\\r\\n]', ' ', 'g'))
                ELSE '' END AS user_question,
           CASE WHEN uidx > 0
                THEN coalesce(array_to_string(
                       list_filter(
                         list_transform(replies,
                           m -> trim(regexp_replace(coalesce(m.content, ''), '[\\t\\r\\n]', ' ', 'g'))),
                         p -> p <> ''), ' '), '')
                ELSE '' END AS assistant_response
    FROM taken
"""

_FIRST_QA_ORACLE = f"""
    {_QA_CTES},
    qa AS ({_FIRST_QA_SELECT}),
    last AS (
      SELECT user_id,
             last(value ORDER BY ts, event_id) AS last_value,
             last(event_type ORDER BY ts, event_id) AS last_type,
             max(ts) AS last_ts,
             count(*) AS n_events
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, user_question, assistant_response,
           last_value, last_type, last_ts, n_events
    FROM qa JOIN last USING (user_id)
"""


def _first_qa_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    role = (
        F.when(F.col("event_type") == "view", "assistant")
        .when(F.col("event_type") == "click", "user")
        .otherwise(F.col("event_type"))
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    msgs = collect_messages(
        ev,
        "user_id",
        ["ts", "event_id"],
        role,
        F.col("event_id").cast("string"),
        extra_aggs={
            "last_value": F.max_by("value", key),
            "last_type": F.max_by("event_type", key),
            "last_ts": F.max("ts"),
            "n_events": F.count(F.lit(1)),
        },
    )
    qa = msgs.select(
        "user_id",
        first_qa(F.col("messages")).alias("qa"),
        "last_value",
        "last_type",
        "last_ts",
        "n_events",
    )
    return qa.select(
        "user_id",
        "qa.user_question",
        "qa.assistant_response",
        "last_value",
        "last_type",
        "last_ts",
        "n_events",
    )


@register(
    "sessionize_first_qa",
    oracle=_FIRST_QA_ORACLE,
    doc="W1-W3 + A5 on one shuffle: drop leading greeting, first user "
    "message, contiguous assistant-reply concat — the reference's "
    "per-session walk (extract_chat_qa_tsv.py:84-129) as higher-order "
    "array exprs — plus the A5 last-value-wins fold (SSE overwrite "
    "semantics, test_chat_assistant.py:59-69) as max_by keyed by "
    "(ts, event_id), piggybacked on the same groupBy(user) exchange "
    "that the message-array build already pays (previously the "
    "separate session_last_event entry).",
    tags=("sessionize", "agg"),
    bench=True,
)
def sessionize_first_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _first_qa_df(spark, sf_dir)


# (the include-empty=False variant of first_qa is exercised by the
# chat_qa pipeline + tests — a separate registry entry was redundant
# and is retired to keep the driver's correctness window on
# distinct operators; session_last_event's A5 aggregates now ride the
# sessionize_first_qa groupBy for the same reason)
