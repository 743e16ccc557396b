"""Judge-output parsing + rule-cascade queries (SURVEY §2.8 jsonx,
§2.10 U3) — FIXTURES F5/F6 shapes synthesized deterministically from
``events``/``orders`` so the DuckDB oracle can verify the full chain.

Scale: both queries are pure per-row expression pipelines over one scan
— no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.ops.jsonx import with_verdict
from yodel_etl_spark.ops.rules import quality_color, quality_color_sql
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables, spread


def _verdict_json(spark_side: bool):
    """Deterministic verdict JSON builder, char-identical on both engines."""
    if spark_side:
        present = F.when(F.col("event_type") != "error", "true").otherwise("false")
        return F.concat(
            F.lit('{"labels":{"answer_present":'),
            present,
            F.lit(',"answer_direct":true},"scores":{"answer_quality":0.'),
            (F.col("event_id") % 10).cast("string"),
            F.lit('},"notes":"n'),
            F.col("event_id").cast("string"),
            F.lit('"}'),
        )
    return (
        "'{\"labels\":{\"answer_present\":' || "
        "CASE WHEN event_type <> 'error' THEN 'true' ELSE 'false' END || "
        "',\"answer_direct\":true},\"scores\":{\"answer_quality\":0.' || "
        "CAST(event_id % 10 AS VARCHAR) || '},\"notes\":\"n' || CAST(event_id AS VARCHAR) || '\"}'"
    )


def _raw_spark() -> "F.Column":
    v = _verdict_json(True)
    esc = F.replace(v, F.lit('"'), F.lit('\\"'))
    variant = F.col("event_id") % 5
    return (
        F.when(variant == 0, F.concat(F.lit('{"content":[{"type":"text","text":"'), esc, F.lit('"}]}')))
        .when(variant == 1, F.concat(F.lit('{"completion":"'), esc, F.lit('"}')))
        .when(variant == 2, v)
        .when(variant == 3, F.concat(F.lit("The verdict is: "), v, F.lit(" thanks.")))
        .otherwise(F.concat(F.lit("no json here "), F.col("event_id").cast("string")))
    )


_RAW_SQL = f"""
    CASE event_id % 5
      WHEN 0 THEN '{{"content":[{{"type":"text","text":"' || replace({_verdict_json(False)}, '"', '\\"') || '"}}]}}'
      WHEN 1 THEN '{{"completion":"' || replace({_verdict_json(False)}, '"', '\\"') || '"}}'
      WHEN 2 THEN {_verdict_json(False)}
      WHEN 3 THEN 'The verdict is: ' || {_verdict_json(False)} || ' thanks.'
      ELSE 'no json here ' || CAST(event_id AS VARCHAR)
    END
"""


@register(
    "judge_parse_chain",
    oracle=f"""
    WITH raws AS (
      SELECT event_id, event_id % 5 AS variant, {_RAW_SQL} AS raw FROM events
    ), cand AS (
      SELECT event_id, variant, raw,
             CASE WHEN json_valid(raw) THEN coalesce(
               json_extract_string(raw, '$.content[0].text'),
               json_extract_string(raw, '$.completion'),
               json_extract_string(raw, '$.output'),
               json_extract_string(raw, '$.choices[0].text'),
               json_extract_string(raw, '$.choices[0].message')) END AS candidate
      FROM raws
    ), sni AS (
      SELECT *,
             coalesce(candidate, raw) AS body,
             CASE WHEN strpos(coalesce(candidate, raw), '{{') > 0
                       AND len(coalesce(candidate, raw)) - strpos(reverse(coalesce(candidate, raw)), '}}') + 1
                           >= strpos(coalesce(candidate, raw), '{{')
                  THEN substr(coalesce(candidate, raw),
                              strpos(coalesce(candidate, raw), '{{'),
                              len(coalesce(candidate, raw)) - strpos(reverse(coalesce(candidate, raw)), '}}') + 1
                                - strpos(coalesce(candidate, raw), '{{') + 1)
             END AS snippet
      FROM cand
    ), parsed AS (
      SELECT event_id, variant,
             CASE WHEN candidate IS NOT NULL AND json_valid(candidate)
                       AND (json_extract(candidate, '$.labels') IS NOT NULL
                            OR json_extract(candidate, '$.scores') IS NOT NULL
                            OR json_extract(candidate, '$.notes') IS NOT NULL) THEN candidate
                  WHEN json_valid(raw)
                       AND (json_extract(raw, '$.labels') IS NOT NULL
                            OR json_extract(raw, '$.scores') IS NOT NULL
                            OR json_extract(raw, '$.notes') IS NOT NULL) THEN raw
                  WHEN snippet IS NOT NULL AND json_valid(snippet)
                       AND (json_extract(snippet, '$.labels') IS NOT NULL
                            OR json_extract(snippet, '$.scores') IS NOT NULL
                            OR json_extract(snippet, '$.notes') IS NOT NULL) THEN snippet
             END AS v
      FROM sni
    )
    SELECT event_id, variant,
           v IS NOT NULL AS parse_ok,
           CAST(json_extract(v, '$.labels.answer_present') AS BOOLEAN) AS answer_present,
           CAST(json_extract(v, '$.labels.answer_direct') AS BOOLEAN) AS answer_direct,
           CAST(json_extract(v, '$.scores.answer_quality') AS DOUBLE) AS answer_quality,
           json_extract_string(v, '$.notes') AS notes
    FROM parsed
    """,
    doc="F5 robust judge-JSON fallback chain over 5 synthesized response "
    "shapes (Messages wrapper / completion wrapper / direct verdict / "
    "embedded {…} / garbage) — coalesce(from_json…) per row, no UDF "
    "(test_chat_assistant_with_judge.py:292-358).",
    tags=("jsonx",),
    bench=True,
)
def judge_parse_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(load_tables(spark, sf_dir, ("events",))["events"])
    # staged materialization: raw once, then each parse once (the
    # single-expression robust_verdict re-parses per reference — ~50×
    # slower here; see ops.jsonx.with_verdict)
    staged = with_verdict(
        ev.select("event_id", _raw_spark().alias("raw")), raw_col="raw", out_col="v"
    )
    v = F.col("v")
    return staged.select(
        "event_id",
        (F.col("event_id") % 5).alias("variant"),
        v.isNotNull().alias("parse_ok"),
        v["labels"]["answer_present"].alias("answer_present"),
        v["labels"]["answer_direct"].alias("answer_direct"),
        v["scores"]["answer_quality"].alias("answer_quality"),
        v["notes"].alias("notes"),
    )


_LABEL_DEFS = (
    ("answer_present", "o_orderkey % 11 <> 0"),
    ("answer_direct", "o_orderpriority IN ('1-URGENT', '2-HIGH')"),
    ("answer_partial", "o_orderkey % 7 = 0"),
    ("answer_wrong", "o_orderkey % 13 = 0"),
    ("answer_hallucination", "o_orderkey % 17 = 0"),
    ("answer_contradicts_sources", "o_orderkey % 19 = 0"),
    ("retrieval_relevant", "o_orderkey % 5 <> 0"),
    ("retrieval_supports_answer", "o_orderkey % 3 <> 0"),
    ("retrieval_complete", "o_orderkey % 4 <> 0"),
    ("source_divergence", "o_orderkey % 23 = 0"),
    ("answer_requires_followup", "o_orderkey % 29 = 0"),
)

_MAP_SQL = (
    "CASE WHEN o_orderkey % 31 = 0 THEN MAP([]::VARCHAR[], []::BOOLEAN[]) "
    "WHEN o_orderkey % 37 = 0 THEN MAP(['answer_direct'], [true]) "
    "ELSE MAP(["
    + ", ".join(f"'{k}'" for k, _ in _LABEL_DEFS)
    + "], ["
    + ", ".join(cond for _, cond in _LABEL_DEFS)
    + "]) END"
)


def _labels_spark() -> "F.Column":
    import re as _re

    def cond(sql: str) -> F.Column:
        # tiny translation of the SQL conditions above to Column exprs
        return F.expr(sql)

    full = F.create_map(
        *[x for k, c in _LABEL_DEFS for x in (F.lit(k), cond(c))]
    )
    empty = F.create_map().cast("map<string,boolean>")
    only_direct = F.create_map(F.lit("answer_direct"), F.lit(True))
    return (
        F.when(F.col("o_orderkey") % 31 == 0, empty)
        .when(F.col("o_orderkey") % 37 == 0, only_direct)
        .otherwise(full)
    )


@register(
    "rules_quality_color",
    oracle=f"""
    SELECT o_orderkey, {quality_color_sql(_MAP_SQL)} AS color
    FROM orders
    """,
    doc="U3 ordered rule cascade over 13 label flags synthesized from "
    "orders — RED>YELLOW>GREEN precedence and per-rule missing-key "
    "defaults replicated exactly "
    "(test_chat_assistant_with_judge.py:380-422).",
    tags=("rules",),
)
def rules_quality_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select("o_orderkey", quality_color(_labels_spark()).alias("color"))


# (rules_color_distribution — a groupBy of rules_quality_color — was
# retired as redundant: the cascade itself is the checked operator and
# its distribution is one trivial count away)


@register(
    "events_props_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured JSON column in the hot path: from_json with an "
    "explicit schema (typed, prunable) rather than per-row string "
    "get_json_object — one scan, one shuffle, map-side partials "
    "(SURVEY §2.8 JSON family).",
    tags=("jsonx",),
)
def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.from_json("props", "k INT")["k"].cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
