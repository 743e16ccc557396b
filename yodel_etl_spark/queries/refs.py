"""Reference-chunk queries (SURVEY §2.6 E1/E2, §2.4 A4, §2.5 W4) bound to
``lineitem``: each order's lineitems play the role of a retrieval-chunk
list, ordered by l_linenumber.

Scale: one shuffle (groupBy order) builds the chunk arrays; every walk
after that is a narrow higher-order expression — the reference's
per-chunk python loops (test_chat_assistant.py:136-177) become one
codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.ops.refs import (
    chunk_cap,
    join_chunk_field,
    judge_chunk_projection,
    total_references,
)
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables

_CHUNKS_SQL = """
    SELECT l_orderkey,
           list(struct_pack(
                  id := l_partkey,
                  document_name := 'doc_' || CAST(l_suppkey AS VARCHAR),
                  similarity := CAST(round(l_discount * 100) AS INTEGER),
                  content := l_returnflag
                ) ORDER BY l_linenumber, l_partkey,
                           'doc_' || CAST(l_suppkey AS VARCHAR),
                           CAST(round(l_discount * 100) AS INTEGER),
                           l_returnflag) AS chunks
    FROM lineitem GROUP BY l_orderkey
"""

_FALSY = (
    "CASE WHEN {v} IS NULL OR CAST({v} AS VARCHAR) IN ('0', '0.0', '') "
    "THEN '' ELSE CAST({v} AS VARCHAR) END"
)


def _chunks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    packed = li.select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber"),
            F.col("l_partkey").alias("id"),
            F.concat(F.lit("doc_"), F.col("l_suppkey").cast("string")).alias("document_name"),
            F.round(F.col("l_discount") * 100).cast("int").alias("similarity"),
            F.col("l_returnflag").alias("content"),
        ).alias("c"),
    )
    return (
        packed.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("c")).alias("c"))
        .select(
            "l_orderkey",
            F.transform(
                F.col("c"),
                lambda x: F.struct(
                    x["id"].alias("id"),
                    x["document_name"].alias("document_name"),
                    x["similarity"].alias("similarity"),
                    x["content"].alias("content"),
                ),
            ).alias("chunks"),
        )
    )


@register(
    "refs_collapse",
    oracle=f"""
    WITH c AS ({_CHUNKS_SQL})
    SELECT l_orderkey,
           coalesce(CASE WHEN l_orderkey % 3 = 0 THEN NULL ELSE len(chunks) END,
                    len(chunks), 0) AS total_references,
           array_to_string(list_transform(chunks, x -> {_FALSY.format(v="x.id")}), ', ') AS chunk_ids,
           array_to_string(list_transform(chunks, x -> {_FALSY.format(v="x.document_name")}), ', ') AS document_names,
           array_to_string(list_transform(chunks, x -> {_FALSY.format(v="x.similarity")}), ', ') AS similarities,
           len(chunks[1:12]) AS n_in_prompt,
           array_to_string(list_transform(chunks[1:12], x -> CAST(x.id AS VARCHAR)), '|') AS prompt_ids
    FROM c
    """,
    doc="E1 chunk-walk collapse + E2/W4 judge projection in one pass "
    "over the chunk arrays (same l_orderkey grain, so the two "
    "reference surfaces share the single groupBy shuffle): per-field "
    "falsy-safe stringify + ', '-join in chunk order, A4 "
    "declared-total coalesce (test_chat_assistant.py:136-177), and the "
    "first-12 cap + id sequence that enters the judge prompt "
    "(test_chat_assistant_with_judge.py:205-216).",
    tags=("refs",),
    bench=True,
)
def refs_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _chunks_df(spark, sf_dir)
    declared = F.when(F.col("l_orderkey") % 3 == 0, F.lit(None).cast("long")).otherwise(
        F.size("chunks").cast("long")
    )
    capped = chunk_cap(F.col("chunks"), 12)
    return c.select(
        "l_orderkey",
        total_references(declared, F.col("chunks")).alias("total_references"),
        join_chunk_field(F.col("chunks"), "id").alias("chunk_ids"),
        join_chunk_field(F.col("chunks"), "document_name").alias("document_names"),
        join_chunk_field(F.col("chunks"), "similarity").alias("similarities"),
        F.size(capped).alias("n_in_prompt"),
        F.array_join(F.transform(capped, lambda x: x["id"].cast("string")), "|").alias(
            "prompt_ids"
        ),
    )


def judge_projection_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 full serialization (to_json of the capped projection) — kept
    callable for pipelines; JSON byte-formatting differs across engines
    so the oracle query above checks the projected fields instead."""
    c = _chunks_df(spark, sf_dir)
    return c.select("l_orderkey", judge_chunk_projection(F.col("chunks")).alias("chunks_json"))
