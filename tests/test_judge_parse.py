"""F5/F6 golden tests — robust judge-JSON parse chain and the quality
color cascade truth table (FIXTURES.md F5/F6)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yodel_etl_spark.ops.jsonx import robust_verdict
from yodel_etl_spark.ops.rules import quality_color

VERDICT = {"labels": {"answer_present": True}, "scores": {"answer_quality": 0.7}, "notes": "ok"}
VJ = json.dumps(VERDICT)

F5_CASES = {
    "messages_wrapper": json.dumps({"content": [{"type": "text", "text": VJ}]}),
    "completion_wrapper": json.dumps({"completion": VJ}),
    "output_wrapper": json.dumps({"output": VJ}),
    "choices_wrapper": json.dumps({"choices": [{"text": VJ}]}),
    "direct_body": VJ,
    "embedded_prose": f"Sure! Here is the verdict: {VJ} — hope that helps.",
    "wrapped_embedded": json.dumps({"content": [{"type": "text", "text": f"verdict: {VJ} ok"}]}),
    "garbage": "no braces at all",
    "empty": "",
    "wrong_shape_json": json.dumps({"foo": 1}),
}

PARSE_OK = {
    "messages_wrapper": True,
    "completion_wrapper": True,
    "output_wrapper": True,
    "choices_wrapper": True,
    "direct_body": True,
    "embedded_prose": True,
    "wrapped_embedded": True,  # {} extraction runs on the unwrapped candidate
    "garbage": False,
    "empty": False,
    "wrong_shape_json": False,
}


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in F5_CASES.items()], ["case_id", "raw"]
    ).select("case_id", robust_verdict(F.col("raw")).alias("v"))
    return {r["case_id"]: r["v"] for r in df.collect()}


@pytest.mark.parametrize("case", sorted(F5_CASES))
def test_parse_chain(parsed, case):
    v = parsed[case]
    if PARSE_OK[case]:
        assert v is not None, case
        assert v["labels"]["answer_present"] is True
        assert v["scores"]["answer_quality"] == 0.7
        assert v["notes"] == "ok"
    else:
        assert v is None, case


# ---- F6: cascade truth table, one row per branch in cascade order ----
F6_CASES = [
    ("red_wrong", {"answer_wrong": True, "answer_direct": True, "retrieval_supports_answer": True}, "RED"),
    ("red_halluc", {"answer_hallucination": True}, "RED"),
    ("red_contradicts", {"answer_contradicts_sources": True}, "RED"),
    ("red_no_answer", {"answer_present": False}, "RED"),
    ("red_unsupported", {"retrieval_supports_answer": False}, "RED"),
    ("yellow_partial", {"answer_partial": True, "answer_present": True}, "YELLOW"),
    ("yellow_incomplete", {"retrieval_complete": False, "answer_present": True}, "YELLOW"),
    ("yellow_irrelevant", {"retrieval_relevant": False, "answer_present": True}, "YELLOW"),
    ("yellow_divergent", {"source_divergence": True, "answer_present": True}, "YELLOW"),
    ("yellow_followup", {"answer_requires_followup": True, "answer_present": True}, "YELLOW"),
    ("green", {"answer_direct": True, "retrieval_supports_answer": True, "answer_present": True}, "GREEN"),
    ("yellow_present_only", {"answer_present": True}, "YELLOW"),
    ("gray_empty", {}, "GRAY"),
    ("gray_no_present", {"answer_direct": False}, "GRAY"),
    # order sensitivity: RED beats GREEN when both fire
    ("red_beats_green", {"answer_wrong": True, "answer_direct": True, "retrieval_supports_answer": True, "answer_present": True}, "RED"),
]


def test_cascade_truth_table(spark):
    schema = T.StructType(
        [
            T.StructField("case_id", T.StringType()),
            T.StructField("labels", T.MapType(T.StringType(), T.BooleanType())),
            T.StructField("expected", T.StringType()),
        ]
    )
    df = spark.createDataFrame(F6_CASES, schema=schema)
    out = df.select("case_id", "expected", quality_color(F.col("labels")).alias("color"))
    for r in out.collect():
        assert r["color"] == r["expected"], r["case_id"]
