"""Data-quality gate over ``documents``: the expectations report a
pipeline checks before shipping the corpus.

Registered at tier 2 (the 50 established oracle-backed queries keep
the driver correctness window; this one is verified by the pytest
parity suite and the driver-sim at sf0.01, the same convention as
``pipeline_curate`` in round 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.dq import Expectation, expect_report
from yodel_etl_spark.session import load_tables, spread


@register(
    "dq_documents_report",
    oracle="""
    WITH base AS (
      -- CAST AS BIGINT: DuckDB SUM over ints is HUGEINT, which pandas
      -- renders as float ('0.0' vs Spark's '0') — same class of oracle
      -- artifact fixed for judge_parse_chain in r2
      SELECT count(*) AS n_rows,
             coalesce(CAST(sum(CASE WHEN doc_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT), 0) AS v0,
             coalesce(CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0 THEN 0 ELSE 1 END) AS BIGINT), 0) AS v1,
             coalesce(CAST(sum(CASE WHEN length(text) <= 100000 THEN 0 ELSE 1 END) AS BIGINT), 0) AS v2,
             coalesce(CAST(sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 0 ELSE 1 END) AS BIGINT), 0) AS v3,
             count(*) - count(DISTINCT doc_id) AS v4
      FROM documents
    )
    SELECT rule, n_violations, n_rows,
           CASE WHEN n_rows = 0 THEN 1.0
                ELSE round(CAST(n_rows - n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
           END AS pass_frac
    FROM (
      SELECT 'doc_id_not_null' AS rule, v0 AS n_violations, n_rows FROM base
      UNION ALL SELECT 'text_not_empty', v1, n_rows FROM base
      UNION ALL SELECT 'text_len_le_100k', v2, n_rows FROM base
      UNION ALL SELECT 'lang_known', v3, n_rows FROM base
      UNION ALL SELECT 'unique:doc_id', v4, n_rows FROM base
    )
    """,
    doc="Declarative data-quality gate: N row-level expectations "
    "(not-null, non-empty, length cap, domain membership) compiled "
    "into ONE aggregation pass over one scan — map-side partials only, "
    "no data-row shuffle — plus a key-uniqueness rule via exact "
    "distinct (salted two-phase or approx_count_distinct are the "
    "100 TB swaps).  NULL conditions count as violations (SQL "
    "three-valued logic would let NULLs slip a range check).",
    tags=("dq", "scale"),
    bench=True,
    tier=2,
)
def dq_documents_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    rules = [
        Expectation("doc_id_not_null", F.col("doc_id").isNotNull()),
        Expectation("text_not_empty", F.col("text").isNotNull() & (F.length("text") > 0)),
        Expectation("text_len_le_100k", F.length("text") <= 100000),
        Expectation("lang_known", F.col("lang").isin("en", "de", "fr", "es", "zh")),
    ]
    return expect_report(docs, rules, unique_key="doc_id")
