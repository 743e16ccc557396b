"""End-to-end pipeline queries (EP2/EP3) under deterministic mock
services — the full distributed shape (mapInPandas external calls,
fail-soft columns, REST page fan-out) driver-checked against DuckDB.

The chat mock derives everything from ``md5(question)`` (DuckDB has
md5), so the ask→metrics stage is exactly SQL-expressible.  The judged
variant adds two opaque inference hops whose prompt text is
engine-internal → rows-only check + golden tests
(tests/test_llm_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.llm.infer import mock_judge_client
from yodel_etl_spark.pipelines.qa_eval import evaluate_questions
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables, spread


def _mock_chat_client():
    """Self-contained closure (pickled by value) mirroring the test
    mock: answer + 2 chunks, all derived from md5(question)."""

    def chat_client(prompt: str) -> str:
        import hashlib
        import json

        h = hashlib.md5(prompt.encode()).hexdigest()[:6]
        return json.dumps(
            {
                "answer": f"Answer[{h}] to: {prompt}",
                "session_id": f"sess-{h}",
                "reference": {
                    "total": 2,
                    "chunks": [
                        {
                            "id": f"{h}-c1",
                            "document_name": "doc_a.pdf",
                            "content": "alpha",
                            "similarity": 0.91,
                            "vector_similarity": 0.83,
                            "term_similarity": 0.71,
                        },
                        {
                            "id": f"{h}-c2",
                            "document_name": "doc_b.pdf",
                            "content": "beta",
                            "similarity": 0.45,
                            "vector_similarity": 0.52,
                            "term_similarity": 0.27,
                        },
                    ],
                },
            }
        )

    return chat_client


def _questions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return docs.select(
        F.concat(F.lit("Summarize document "), F.col("doc_id").cast("string")).alias("question")
    )


@register(
    "pipeline_qa_metrics",
    oracle="""
    WITH q AS (
      SELECT 'Summarize document ' || CAST(doc_id AS VARCHAR) AS question FROM documents
    ), h AS (
      SELECT question, substr(md5(question), 1, 6) AS hx FROM q
    )
    SELECT question,
           'Answer[' || hx || '] to: ' || question AS answer,
           200 AS status_code,
           'sess-' || hx AS session_id,
           2 AS total_references,
           hx || '-c1, ' || hx || '-c2' AS chunk_ids,
           'doc_a.pdf, doc_b.pdf' AS document_names,
           '0.91, 0.45' AS similarities,
           '0.83, 0.52' AS vector_similarities,
           '0.71, 0.27' AS term_similarities
    FROM h
    """,
    doc="EP3 ask→metrics stage end-to-end: questions → mapInPandas chat "
    "call (deterministic md5 mock) → from_json → E1 chunk collapse "
    "with the reference's full fieldname set incl. the stringly-typed "
    "vector/term similarities (test_chat_assistant.py:196-208).  The "
    "oracle recomputes the mock's md5-derived payload in SQL — the "
    "distributed call plumbing must produce byte-identical columns.",
    tags=("pipeline", "llm"),
)
def pipeline_qa_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = evaluate_questions(_questions(spark, sf_dir), _mock_chat_client())
    # error is NULL on success; drop it so the oracle needn't carry a
    # typed NULL column
    return out.drop("error")


@register(
    "judged",
    oracle=None,  # judge prompt text is engine-internal → rows-only
    doc="Full EP3 with judge: ask → metrics → judge prompt (12-chunk "
    "JSON projection) → mapInPandas judge (deterministic mock) → "
    "robust parse → color cascade.  Golden assertions live in "
    "tests/test_llm_pipeline.py; here the driver checks stable rows.",
    tags=("pipeline", "llm"),
)
def judged(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = evaluate_questions(
        _questions(spark, sf_dir), _mock_chat_client(), mock_judge_client
    )
    return out.select(
        "question",
        "answer",
        F.get_json_object("judge_labels", "$.answer_present").cast("boolean").alias("answer_present"),
        F.get_json_object("judge_labels", "$.answer_direct").cast("boolean").alias("answer_direct"),
        "quality_color",
    )


def _mock_chats_page():
    def chats_page(page: int) -> list[dict]:
        if page > 3:
            return []
        return [{"id": f"chat{page}-{i}", "name": f"Chat {page}.{i}"} for i in range(2)]

    return chats_page


def _mock_sessions_page():
    def sessions_page(chat_id: str, page: int) -> list[dict]:
        if page > 1:
            return []
        return [
            {
                "id": f"{chat_id}-s{page}",
                "name": "sess",
                "messages": [
                    {"role": "assistant", "content": "Hi! How can I help?"},
                    {"role": "user", "content": f"question for {chat_id}\twith tab"},
                    {"role": "assistant", "content": "part one."},
                    {"role": "assistant", "content": "part two."},
                    {"role": "user", "content": "follow-up"},
                ],
            }
        ]

    return sessions_page


@register(
    "pipeline_chat_qa",
    oracle="""
    WITH pages AS (SELECT unnest(range(1, 4)) AS page),
    idx AS (SELECT unnest([0, 1]) AS i),
    chats AS (
      SELECT 'chat' || CAST(page AS VARCHAR) || '-' || CAST(i AS VARCHAR) AS chat_id,
             'Chat ' || CAST(page AS VARCHAR) || '.' || CAST(i AS VARCHAR) AS chat_name
      FROM pages, idx
    )
    SELECT chat_id, chat_name,
           chat_id || '-s1' AS session_id,
           'sess' AS session_name,
           'question for ' || chat_id || ' with tab' AS user_question,
           'part one. part two.' AS assistant_response
    FROM chats
    """,
    doc="EP2 end-to-end under deterministic REST mocks: page-parallel "
    "chats fetch (S3) → per-chat session fan-out (S4) → broadcast join "
    "→ greeting-drop / first-user / contiguous-assistant-concat "
    "(W1-W3) → TSV sanitize (P8).  Oracle reconstructs the mock "
    "universe with generate_series (extract_chat_qa_tsv.py:132-164).",
    tags=("pipeline", "rest"),
)
def pipeline_chat_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.pipelines.chat_qa import extract_chat_qa

    return extract_chat_qa(
        spark,
        _mock_chats_page(),
        _mock_sessions_page(),
        max_pages=5,
        max_session_pages_per_chat=2,
    )
