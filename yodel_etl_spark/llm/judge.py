"""U2 — LLM-as-judge pipeline stage (test_chat_assistant_with_judge.py).

Composes the already-tested pieces into the reference's judge stage:
prompt build (:199-252) → inference call (:255-289, as
``llm.infer.infer_map``) → robust verdict parse (:292-358, as
``ops.jsonx.robust_verdict``) → quality color cascade (:380-422, as
``ops.rules.quality_color``).

Everything around the opaque inference call is a column expression, so
Catalyst prunes/pushes freely on both sides of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.llm.infer import Client, infer_map
from yodel_etl_spark.ops.cleanse import truncate
from yodel_etl_spark.ops.jsonx import with_verdict
from yodel_etl_spark.ops.refs import judge_chunk_projection
from yodel_etl_spark.ops.rules import quality_color

#: the judge prompt (structure of test_chat_assistant_with_judge.py:
#: 199-252: question + answer + chunk JSON + session, then the rubric
#: demanding the {labels, scores, notes} JSON)
JUDGE_TEMPLATE = """You are a strict evaluation judge for a retrieval-augmented assistant.

Question:
{q}

Assistant answer:
{a}

Retrieved chunks (JSON):
{chunks}

Session: {session}

Reply ONLY with JSON: {{"labels": {{...}}, "scores": {{...}}, "notes": "..."}}"""

#: raw judge output cap before parsing (:543)
RAW_CAP = 10_000


def build_judge_prompt(
    df: DataFrame,
    question_col: str = "question",
    answer_col: str = "answer",
    chunks_col: str = "chunks",
    session_col: str = "session_id",
    out_col: str = "judge_prompt",
) -> DataFrame:
    """Fill the judge template; chunks are capped at 12 and projected to
    {id, document_name, similarity, content} JSON (E2, :205-216)."""
    chunk_json = judge_chunk_projection(F.col(chunks_col))
    filled = F.format_string(
        JUDGE_TEMPLATE.replace("{q}", "%s")
        .replace("{a}", "%s")
        .replace("{chunks}", "%s")
        .replace("{session}", "%s")
        .replace("{{", "{")
        .replace("}}", "}"),
        F.coalesce(F.col(question_col), F.lit("")),
        F.coalesce(F.col(answer_col), F.lit("")),
        F.coalesce(chunk_json, F.lit("[]")),
        F.coalesce(F.col(session_col), F.lit("")),
    )
    return df.withColumn(out_col, filled)


def judge_stage(
    df: DataFrame,
    client: Client,
    prompt_col: str = "judge_prompt",
    rate_per_sec: float | None = None,
    max_concurrency: int | None = None,
) -> DataFrame:
    """Inference + parse + color: appends ``judge_raw``, ``verdict``
    (struct), ``quality_color`` and keeps the fail-soft
    ``status``/``error`` columns."""
    out = infer_map(
        df,
        client,
        prompt_col=prompt_col,
        rate_per_sec=rate_per_sec,
        max_concurrency=max_concurrency,
    )
    out = out.withColumn("judge_raw", truncate(F.col("output"), RAW_CAP)).drop("output")
    out = with_verdict(out, raw_col="judge_raw", out_col="verdict")
    return out.withColumn("quality_color", quality_color(F.col("verdict.labels")))
