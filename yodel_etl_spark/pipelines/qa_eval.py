"""EP3 — question → chat → judge evaluation pipeline
(test_chat_assistant_with_judge.py:425-556; metrics-only variant
test_chat_assistant.py:190-255).

Reference flow per question (strictly sequential): create session →
ask (SSE) → extract reference info → judge call → parse → color → CSV
row.  Spark shape (SURVEY §3 EP3)::

    read.text                       S2 questions source
    → mapInPandas(chat client)      S6/U1 opaque call, fail-soft cols
    → select(refs exprs)            E1 chunk collapse (column algebra)
    → build_judge_prompt            P11/E2
    → mapInPandas(judge client)     U2
    → select(parse chain, color)    jsonx + rules (column algebra)
    → write.csv                     K3

Both external calls are injected callables; the deterministic mocks in
``llm.infer`` / tests replay the semantics (fail-soft, sentinel
handling) without a live service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.io.sse import DATA_SCHEMA
from yodel_etl_spark.llm.infer import Client, infer_map
from yodel_etl_spark.llm.judge import build_judge_prompt, judge_stage
from yodel_etl_spark.ops.refs import join_chunk_field, total_references

#: reference results-CSV fieldnames (test_chat_assistant.py:197-208)
METRICS_COLUMNS = [
    "question",
    "session_id",
    "answer",
    "total_references",
    "chunk_ids",
    "chunk_documents",
    "chunk_similarities",
    "status",
    "error",
]


def ask_stage(questions: DataFrame, chat_client: Client, question_col: str = "question") -> DataFrame:
    """S6: per-question chat call.  The client returns the final
    {answer, session_id, reference} JSON (the SSE fold is the client's
    concern in prod — io/sse.py replays transcripts; here the operator
    consumes the folded payload).  Fail-soft: status/error columns."""
    asked = infer_map(questions.withColumnRenamed(question_col, "prompt"), chat_client)
    parsed = asked.withColumn("data", F.from_json("output", DATA_SCHEMA))
    return parsed.select(
        F.col("prompt").alias("question"),
        F.col("data.answer").alias("answer"),
        F.col("data.session_id").alias("session_id"),
        F.col("data.reference").alias("reference"),
        "status",
        "error",
    )


def metrics_stage(df: DataFrame) -> DataFrame:
    """E1/A4: collapse the chunk list into the reference's comma-joined
    metric columns (test_chat_assistant.py:136-177)."""
    chunks = F.col("reference.chunks")
    return df.select(
        "question",
        F.coalesce(F.col("session_id"), F.lit("")).alias("session_id"),
        F.coalesce(F.col("answer"), F.lit("")).alias("answer"),
        total_references(F.col("reference.total"), chunks).alias("total_references"),
        join_chunk_field(chunks, "id").alias("chunk_ids"),
        join_chunk_field(chunks, "document_name").alias("chunk_documents"),
        join_chunk_field(chunks, "similarity").alias("chunk_similarities"),
        "status",
        "error",
        chunks.alias("chunks"),
    )


def evaluate_questions(
    questions: DataFrame,
    chat_client: Client,
    judge_client: Client | None = None,
    question_col: str = "question",
) -> DataFrame:
    """Full EP3: ask → metrics (→ judge → verdict/color when a judge
    client is given)."""
    m = metrics_stage(ask_stage(questions, chat_client, question_col))
    if judge_client is None:
        return m.select(*METRICS_COLUMNS)
    with_prompt = build_judge_prompt(
        m.withColumnRenamed("status", "ask_status").withColumnRenamed("error", "ask_error")
    )
    judged = judge_stage(with_prompt, judge_client)
    return judged.select(
        *[c for c in METRICS_COLUMNS if c not in ("status", "error")],
        F.col("ask_status").alias("status"),
        F.col("ask_error").alias("error"),
        "judge_raw",
        "verdict",
        "quality_color",
    )
