"""Ordered rule-cascade labeling (SURVEY §2.10 U3).

The reference's quality-color roll-up
(test_chat_assistant_with_judge.py:380-422) is a strictly ordered
15-branch cascade over 13 boolean labels.  Branch order AND per-rule
missing-key defaults are semantics — e.g. a row that is both RED-worthy
and GREEN-worthy must be RED, and ``answer_present`` defaults True in
the RED check but False in the final YELLOW check.

Spark-first: one chained ``when`` expression (CASE WHEN) — codegen'd,
order-preserving, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the 13 judge label flags (test_chat_assistant_with_judge.py:224-227)
LABEL_FLAGS = (
    "answer_present",
    "answer_direct",
    "answer_partial",
    "answer_wrong",
    "answer_hallucination",
    "answer_contradicts_sources",
    "retrieval_relevant",
    "retrieval_supports_answer",
    "retrieval_complete",
    "source_divergence",
    "citation_ok",
    "answer_safe",
    "answer_requires_followup",
)

RED, YELLOW, GREEN, GRAY = "RED", "YELLOW", "GREEN", "GRAY"


def _get(labels: Column, key: str, default: bool) -> Column:
    """``labels.get(key, default)`` over a MAP<STRING,BOOLEAN> column."""
    return F.coalesce(labels[key], F.lit(default))


def quality_color(labels: Column) -> Column:
    """The exact cascade (test_chat_assistant_with_judge.py:380-422).

    ``labels`` is MAP<STRING,BOOLEAN>; null/empty map → GRAY (:387-388).
    """
    return (
        # no labels at all
        F.when(labels.isNull() | (F.size(F.map_keys(labels)) == 0), GRAY)
        # RED — any critical issue (:391-400)
        .when(_get(labels, "answer_wrong", False), RED)
        .when(_get(labels, "answer_hallucination", False), RED)
        .when(_get(labels, "answer_contradicts_sources", False), RED)
        .when(~_get(labels, "answer_present", True), RED)
        .when(~_get(labels, "retrieval_supports_answer", True), RED)
        # YELLOW — partial / incomplete (:402-411)
        .when(_get(labels, "answer_partial", False), YELLOW)
        .when(~_get(labels, "retrieval_complete", True), YELLOW)
        .when(~_get(labels, "retrieval_relevant", True), YELLOW)
        .when(_get(labels, "source_divergence", False), YELLOW)
        .when(_get(labels, "answer_requires_followup", False), YELLOW)
        # GREEN — direct + supported (:414-415)
        .when(
            _get(labels, "answer_direct", False) & _get(labels, "retrieval_supports_answer", False),
            GREEN,
        )
        # answer exists but not green-worthy (:419-420)
        .when(_get(labels, "answer_present", False), YELLOW)
        .otherwise(GRAY)
    )


def quality_color_sql(labels_expr: str) -> str:
    """DuckDB twin of :func:`quality_color` for oracle queries;
    ``labels_expr`` must be a MAP(VARCHAR, BOOLEAN) SQL expression."""

    def get(key: str, default: str) -> str:
        # DuckDB map_extract returns a LIST ([] when missing)
        return f"coalesce(list_extract(map_extract({labels_expr}, '{key}'), 1), {default})"

    return f"""CASE
      WHEN {labels_expr} IS NULL OR len(map_keys({labels_expr})) = 0 THEN 'GRAY'
      WHEN {get("answer_wrong", "false")} THEN 'RED'
      WHEN {get("answer_hallucination", "false")} THEN 'RED'
      WHEN {get("answer_contradicts_sources", "false")} THEN 'RED'
      WHEN NOT {get("answer_present", "true")} THEN 'RED'
      WHEN NOT {get("retrieval_supports_answer", "true")} THEN 'RED'
      WHEN {get("answer_partial", "false")} THEN 'YELLOW'
      WHEN NOT {get("retrieval_complete", "true")} THEN 'YELLOW'
      WHEN NOT {get("retrieval_relevant", "true")} THEN 'YELLOW'
      WHEN {get("source_divergence", "false")} THEN 'YELLOW'
      WHEN {get("answer_requires_followup", "false")} THEN 'YELLOW'
      WHEN {get("answer_direct", "false")} AND {get("retrieval_supports_answer", "false")} THEN 'GREEN'
      WHEN {get("answer_present", "false")} THEN 'YELLOW'
      ELSE 'GRAY' END"""
