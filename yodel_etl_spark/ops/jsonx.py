"""Robust JSON extraction chain (SURVEY §2.8 / FIXTURES F5).

The reference's judge-output parser (test_chat_assistant_with_judge.py:
292-358) tolerates five response shapes, tried in order:

  1. Messages-API wrapper ``{"content":[{"type":"text","text": …}]}``
  2. legacy wrappers ``{"completion": …}`` / ``{"output": …}`` /
     ``{"choices":[{"text"| "message": …}]}``
  3. the body *is* the verdict JSON (has ``labels``/``scores``)
  4. prose with an embedded ``{…}`` block (first ``{`` to last ``}``)
  5. unparseable → null verdict + error note

Spark-first: the whole chain is a ``coalesce`` of ``from_json`` attempts
(PERMISSIVE mode returns null on corrupt input — no exceptions), so it
runs JVM-side per row at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: judge verdict schema (test_chat_assistant_with_judge.py:224-227)
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("labels", T.MapType(T.StringType(), T.BooleanType())),
        T.StructField("scores", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("notes", T.StringType()),
    ]
)

#: response-wrapper shapes the chain can unwrap (steps 1-2)
WRAPPER_SCHEMA = T.StructType(
    [
        T.StructField(
            "content",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("completion", T.StringType()),
        T.StructField("output", T.StringType()),
        T.StructField(
            "choices",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("text", T.StringType()),
                        T.StructField("message", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def embedded_object(raw: Column) -> Column:
    """First-``{``-to-last-``}`` substring, null when absent
    (test_chat_assistant_with_judge.py:345-355)."""
    start = F.locate("{", raw)
    end = F.length(raw) - F.locate("}", F.reverse(raw)) + 1
    return F.when((start > 0) & (end >= start), raw.substr(start, end - start + 1))


def extract_candidate(raw: Column) -> Column:
    """Steps 1-2: the wrapped completion text, if any wrapper shape
    matches (order: content[0].text → completion → output →
    choices[0].text → choices[0].message)."""
    w = F.from_json(raw, WRAPPER_SCHEMA)
    first_content = F.element_at(w["content"], 1)
    first_choice = F.element_at(w["choices"], 1)
    return F.coalesce(
        first_content["text"],
        w["completion"],
        w["output"],
        first_choice["text"],
        first_choice["message"],
    )


def robust_verdict(raw: Column) -> Column:
    """The full fallback chain → ``STRUCT<labels, scores, notes>``
    (null when nothing parses).  Order mirrors the reference: wrapper
    candidate first, then direct body, then embedded ``{…}``."""
    candidate = extract_candidate(raw)
    # reference: once a wrapper candidate exists, the embedded-{} fallback
    # runs on the candidate text, not the original body (:338-346)
    snippet = embedded_object(F.coalesce(candidate, raw))

    def attempt(src: Column) -> Column:
        # from_json(PERMISSIVE) yields an all-null STRUCT (not NULL) on
        # malformed/wrong-shape input, which would short-circuit the
        # coalesce — nullify attempts with no labels/scores/notes so the
        # next fallback gets its turn (:357-358).
        p = F.from_json(src, VERDICT_SCHEMA)
        return F.when(
            p["labels"].isNotNull() | p["scores"].isNotNull() | p["notes"].isNotNull(), p
        )

    return F.coalesce(attempt(candidate), attempt(raw), attempt(snippet))


def with_verdict(df, raw_col: str = "judge_raw", out_col: str = "verdict"):
    """DataFrame-level :func:`robust_verdict` with each stage
    materialized in its own projection.

    The single-expression form re-evaluates every sub-parse wherever it
    is referenced (``attempt`` reads its parse 4×, the caller usually
    reads the verdict 5+×) — from_json is a real JSON parse per
    evaluation, and the blowup measured ~50× on the parse-chain bench
    query.  Staged aliases are each referenced >1 time, so
    CollapseProject leaves them materialized (one parse each per row).
    """
    raw = F.col(raw_col)
    w = F.from_json(raw, WRAPPER_SCHEMA)
    df = df.withColumn("_w", w)
    first_content = F.element_at(F.col("_w")["content"], 1)
    first_choice = F.element_at(F.col("_w")["choices"], 1)
    df = df.withColumn(
        "_cand",
        F.coalesce(
            first_content["text"],
            F.col("_w")["completion"],
            F.col("_w")["output"],
            first_choice["text"],
            first_choice["message"],
        ),
    )
    df = df.withColumn("_snip", embedded_object(F.coalesce(F.col("_cand"), raw)))
    for name, src in (("_p_cand", F.col("_cand")), ("_p_raw", raw), ("_p_snip", F.col("_snip"))):
        df = df.withColumn(name, F.from_json(src, VERDICT_SCHEMA))

    def ok(name: str) -> Column:
        p = F.col(name)
        return F.when(
            p["labels"].isNotNull() | p["scores"].isNotNull() | p["notes"].isNotNull(), p
        )

    df = df.withColumn(out_col, F.coalesce(ok("_p_cand"), ok("_p_raw"), ok("_p_snip")))
    return df.drop("_w", "_cand", "_snip", "_p_cand", "_p_raw", "_p_snip")
