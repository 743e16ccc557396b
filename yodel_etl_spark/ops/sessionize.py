"""Message-array sessionization (SURVEY §2.5 W1-W3, §2.6 E3).

The reference walks each session's ordered ``messages`` array imperatively
(extract_chat_qa_tsv.py:84-129): drop a leading assistant greeting, locate
the first user message, concat the contiguous assistant replies after it.

Spark-first: the walk becomes pure higher-order array expressions over
``ARRAY<STRUCT<role, content>>`` — per-row, no explode, no shuffle, no
Python.  For row-shaped event logs, ``collect_messages`` builds the
ordered array with one shuffle (groupBy user) and from there everything
is narrow — at 100 TB the only cost is that single partition-by-session
exchange, which any per-session semantics needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.ops.cleanse import sanitize_delim


def normalize_role(role: Column, type_: Column | None = None) -> Column:
    """``role or type or ""`` (extract_chat_qa_tsv.py:100-102)."""
    cands = [role] + ([type_] if type_ is not None else [])
    return F.coalesce(*cands, F.lit(""))


def messages_dict_to_list(col: Column) -> Column:
    """E3: sessions sometimes carry messages as a dict keyed by id —
    take the values (extract_chat_qa_tsv.py:95-96).  Caveat: map entry
    order follows storage order, as in CPython dicts."""
    return F.map_values(col)


def drop_leading_greeting(msgs: Column, greeting_role: str = "assistant") -> Column:
    """W1: if the first message is an assistant greeting, drop it
    (extract_chat_qa_tsv.py:105-107)."""
    return F.when(
        (F.size(msgs) > 0) & (F.element_at(msgs, 1)["role"] == greeting_role),
        F.slice(msgs, 2, F.greatest(F.size(msgs) - 1, F.lit(0))),
    ).otherwise(msgs)


def first_role_idx(msgs: Column, role: str = "user") -> Column:
    """W2: 1-based index of the first message with ``role``; 0 if none
    (extract_chat_qa_tsv.py:109-117)."""
    # array_position yields BIGINT; element_at/slice want INT
    return F.array_position(F.transform(msgs, lambda m: m["role"]), role).cast("int")


def take_while_role(msgs: Column, start_idx: Column, role: str = "assistant") -> Column:
    """W3 core: the contiguous run of ``role`` messages starting at
    1-based ``start_idx`` — take-while via array_position on the
    negated-flag array (stops at the first non-``role``)."""
    tail = F.slice(msgs, start_idx, F.greatest(F.size(msgs) - start_idx + 1, F.lit(0)))
    # eqNullSafe: a NULL role must be a BREAK (False), not a hole — the
    # reference normalizes role to '' before comparing (:100-102), so
    # None != 'assistant' stops the run; plain == yields NULL and
    # array_position skips it, silently consuming past the break
    # (caught by hypothesis in tests/test_properties.py)
    flags = F.transform(tail, lambda m: m["role"].eqNullSafe(F.lit(role)))
    first_break = F.array_position(flags, False).cast("int")
    n_take = F.when(first_break == 0, F.size(tail)).otherwise(first_break - 1)
    return F.slice(tail, 1, F.greatest(n_take, F.lit(0)))


def first_qa(msgs: Column) -> Column:
    """The full W1→W2→W3 extraction as one expression tree: returns
    ``STRUCT<user_question, assistant_response>`` with ("", "") when no
    user message exists (extract_chat_qa_tsv.py:116-117).  Content is
    TSV-sanitized exactly like the reference's safe_text (:34-40)."""
    body = drop_leading_greeting(msgs)
    uidx = first_role_idx(body, "user")
    q = sanitize_delim(F.element_at(body, uidx)["content"])
    replies = take_while_role(body, uidx + 1, "assistant")
    parts = F.filter(
        F.transform(replies, lambda m: sanitize_delim(m["content"])), lambda p: p != ""
    )
    resp = F.array_join(parts, " ")
    return F.when(uidx > 0, F.struct(q.alias("user_question"), resp.alias("assistant_response"))).otherwise(
        F.struct(F.lit("").alias("user_question"), F.lit("").alias("assistant_response"))
    )


def collect_messages(
    df: DataFrame,
    session_col: str,
    order_cols: list[str],
    role: Column,
    content: Column,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Build ordered ``messages`` arrays from a row-per-event log: ONE
    shuffle (groupBy session), then sort_array gives deterministic
    positional order via the leading order columns.

    ``extra_aggs`` piggybacks additional per-session aggregates (e.g.
    last-value-wins folds, counters) onto the SAME groupBy — any
    per-session semantic pays this one exchange anyway, so co-computing
    avoids a second shuffle plus a self-join."""
    packed = df.withColumn(
        "__m",
        F.struct(
            *[F.col(c) for c in order_cols], role.alias("role"), content.alias("content")
        ),
    )
    extra = extra_aggs or {}
    msgs = (
        packed.groupBy(session_col)
        .agg(
            F.sort_array(F.collect_list("__m")).alias("m"),
            *[c.alias(n) for n, c in extra.items()],
        )
        .select(
            session_col,
            F.transform(
                F.col("m"), lambda x: F.struct(x["role"].alias("role"), x["content"].alias("content"))
            ).alias("messages"),
            *extra,
        )
    )
    return msgs
