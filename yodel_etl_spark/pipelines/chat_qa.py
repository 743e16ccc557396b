"""EP2 — chat Q/A extraction pipeline (extract_chat_qa_tsv.py:132-164).

Reference flow: paginated chats fetch → per-chat sessions fetch →
per-session first-Q/A extraction from the messages array → sanitize →
TSV.  Strictly sequential in the reference; here each stage is a
distributed operator:

  S3  fetch_paginated(chats)            page-parallel REST landing
  S4  fetch_fanout(sessions per chat)   (chat × page) grid fan-out
  ⋈   chats ⋈ sessions                  broadcast join on chat_id
  W1-W3 first_qa(messages)              higher-order array expressions
  P8  sanitize + K2 TSV                 delimited sink

Fetchers are injected callables (tests: deterministic fakes; prod:
``requests`` wrappers) — see io/rest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yodel_etl_spark.io.delim import write_tsv
from yodel_etl_spark.io.rest import FanoutFetcher, PageFetcher, fetch_fanout, fetch_paginated, typed
from yodel_etl_spark.ops.sessionize import first_qa

CHAT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
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

#: output columns (extract_chat_qa_tsv.py:148 header)
TSV_COLUMNS = ["chat_id", "chat_name", "session_id", "session_name", "user_question", "assistant_response"]


def extract_chat_qa(
    spark: SparkSession,
    fetch_chats_page: PageFetcher,
    fetch_sessions_page: FanoutFetcher,
    max_pages: int = 10,
    max_session_pages_per_chat: int = 4,
    output_path: str | None = None,
    include_empty: bool = False,
) -> DataFrame:
    """Land chats + sessions, join, extract first Q/A per session."""
    # failed pages land as (record NULL, error set) marker rows — drop
    # them from the data path here; a caller needing retry reads the
    # raw frame's `error` column before typing
    chats_raw = fetch_paginated(spark, fetch_chats_page, max_pages).where(
        F.col("record").isNotNull()
    )
    chats = typed(chats_raw, CHAT_SCHEMA).select(
        F.col("id").alias("chat_id"), F.col("name").alias("chat_name")
    )
    sessions_raw = fetch_fanout(
        chats, "chat_id", fetch_sessions_page, max_session_pages_per_chat
    ).where(F.col("record").isNotNull())
    # NB: E3 (messages dict→list, extract_chat_qa_tsv.py:95-96) applies
    # at ingest when a feed lands MAP-typed messages; SESSION_SCHEMA
    # already types them as the ordered array.
    sessions = typed(sessions_raw, SESSION_SCHEMA).select(
        F.col("parent_id").alias("chat_id"),
        F.col("id").alias("session_id"),
        F.col("name").alias("session_name"),
        F.col("messages"),
    )
    # chats is the small dimension side — broadcast kills the shuffle
    joined = sessions.join(F.broadcast(chats), "chat_id", "inner")
    qa = joined.withColumn("qa", first_qa(F.col("messages")))
    out = qa.select(
        "chat_id",
        "chat_name",
        "session_id",
        "session_name",
        F.col("qa.user_question").alias("user_question"),
        F.col("qa.assistant_response").alias("assistant_response"),
    )
    # reference drops a session only when BOTH question and answer are
    # empty (extract_chat_qa_tsv.py:157), overridable via --include-empty
    if not include_empty:
        out = out.where(
            (F.length("user_question") > 0) | (F.length("assistant_response") > 0)
        )
    if output_path:
        # persist across the sink action so a caller's follow-up tally
        # reads the cached rows instead of re-fetching every REST page
        out = out.persist()
        write_tsv(out, output_path)
    return out


if __name__ == "__main__":  # pragma: no cover - CLI shim
    import sys

    from yodel_etl_spark.cli import chat_qa_main

    sys.exit(chat_qa_main())
