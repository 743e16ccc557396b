"""Retrieval-reference chunk operators (SURVEY §2.6 E1/E2, §2.4 A4,
§2.5 W4).

The reference walks ``references.chunks`` per row and emits
comma-joined per-field strings (test_chat_assistant.py:136-177) and a
12-chunk JSON projection for the judge prompt
(test_chat_assistant_with_judge.py:205-216).

Spark-first: chunks stay an ``ARRAY<STRUCT<…>>`` column; every walk is a
higher-order ``transform``/``slice``/``array_join`` — per-row, no
explode, no shuffle, preserving chunk order by construction (the
exploded alternative needs a window to restore order; SURVEY §2.6 E1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stringify_falsy(col: Column) -> Column:
    """``str(x or "")`` — None, 0, 0.0 and "" all become ''
    (test_chat_assistant.py:162-168 python-falsy semantics)."""
    return (
        F.when(col.isNull(), F.lit(""))
        .when(col.cast("string").isin("0", "0.0", ""), F.lit(""))
        .otherwise(col.cast("string"))
    )


def join_chunk_field(chunks: Column, field: str, sep: str = ", ") -> Column:
    """E1: one chunk field → falsy-safe strings joined in chunk order."""
    return F.array_join(F.transform(chunks, lambda c: stringify_falsy(c[field])), sep)


def total_references(total: Column, chunks: Column) -> Column:
    """A4: declared total, else chunk count, else 0
    (test_chat_assistant.py:153-154)."""
    return F.coalesce(total, F.size(chunks), F.lit(0)).cast("long")


def chunk_cap(chunks: Column, n: int = 12) -> Column:
    """W4: first-N chunk cap (judge prompt limit,
    test_chat_assistant_with_judge.py:207)."""
    return F.slice(chunks, 1, n)


def judge_chunk_projection(chunks: Column, n: int = 12) -> Column:
    """E2: capped chunks projected to {id, document_name, similarity,
    content} and serialized to a JSON array string
    (test_chat_assistant_with_judge.py:205-216,246)."""
    projected = F.transform(
        chunk_cap(chunks, n),
        lambda c: F.struct(
            c["id"].alias("id"),
            c["document_name"].alias("document_name"),
            c["similarity"].alias("similarity"),
            c["content"].alias("content"),
        ),
    )
    return F.to_json(projected)
