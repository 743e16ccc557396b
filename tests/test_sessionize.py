"""F2 golden tests — message-array sessionization edge cases
(FIXTURES.md F2 / extract_chat_qa_tsv.py:84-129)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yodel_etl_spark.ops.sessionize import first_qa, messages_dict_to_list

SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField(
            "messages",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("role", T.StringType()),
                        T.StructField("content", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def m(role, content):
    return {"role": role, "content": content}


CASES = {
    # leading assistant greeting then user then assistant → greeting dropped
    "greeting": [m("assistant", "hi!"), m("user", "q1"), m("assistant", "a1")],
    # user then 2 contiguous assistant, then another user → both concatenated
    "contiguous": [m("user", "q2"), m("assistant", "part1"), m("assistant", "part2"), m("user", "ignored")],
    # no user message → ("", "")
    "no_user": [m("assistant", "hello"), m("assistant", "anyone?")],
    # user is final element → empty response
    "trailing_user": [m("assistant", "greet"), m("user", "q4")],
    # tabs/newlines sanitized to spaces
    "dirty": [m("user", "q\twith\ntabs"), m("assistant", "a\rwith\t stuff")],
    # empty assistant parts are dropped from the join
    "empty_parts": [m("user", "q6"), m("assistant", ""), m("assistant", "real")],
    # empty messages array
    "empty": [],
}

EXPECTED = {
    "greeting": ("q1", "a1"),
    "contiguous": ("q2", "part1 part2"),
    "no_user": ("", ""),
    "trailing_user": ("q4", ""),
    "dirty": ("q with tabs", "a with  stuff"),
    "empty_parts": ("q6", "real"),
    "empty": ("", ""),
}


@pytest.fixture(scope="module")
def qa_rows(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in CASES.items()], schema=SCHEMA
    ).select("session_id", first_qa(F.col("messages")).alias("qa"))
    return {r["session_id"]: (r["qa"]["user_question"], r["qa"]["assistant_response"]) for r in df.collect()}


@pytest.mark.parametrize("case", sorted(CASES))
def test_first_qa_case(qa_rows, case):
    assert qa_rows[case] == EXPECTED[case], case


def test_messages_as_dict(spark):
    # E3: messages arriving as a MAP keyed by id → values taken
    schema = T.StructType(
        [
            T.StructField("session_id", T.StringType()),
            T.StructField(
                "messages",
                T.MapType(
                    T.StringType(),
                    T.StructType(
                        [
                            T.StructField("role", T.StringType()),
                            T.StructField("content", T.StringType()),
                        ]
                    ),
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [("s1", {"m1": m("user", "qq"), "m2": m("assistant", "aa")})], schema=schema
    )
    out = df.select(first_qa(messages_dict_to_list(F.col("messages"))).alias("qa")).collect()[0]["qa"]
    assert out["user_question"] == "qq"
    assert out["assistant_response"] == "aa"
