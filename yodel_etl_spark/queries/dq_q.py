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
    "dq_report",
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
def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    rules = [
        Expectation("doc_id_not_null", F.col("doc_id").isNotNull()),
        Expectation("text_not_empty", F.col("text").isNotNull() & (F.length("text") > 0)),
        Expectation("text_len_le_100k", F.length("text") <= 100000),
        Expectation("lang_known", F.col("lang").isin("en", "de", "fr", "es", "zh")),
    ]
    return expect_report(docs, rules, unique_key="doc_id")


@register(
    "profile_docs",
    oracle="""
    WITH unp AS (
      SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS val FROM documents
      UNION ALL SELECT 'text', text FROM documents
      UNION ALL SELECT 'lang', lang FROM documents
      UNION ALL SELECT 'source', source FROM documents
      UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
    ),
    vc AS (SELECT col_name, val, count(*) AS cnt FROM unp GROUP BY col_name, val),
    agg AS (
      SELECT col_name,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             coalesce(CAST(sum(CASE WHEN val IS NULL THEN cnt END) AS BIGINT), 0) AS n_null,
             CAST(sum(CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct,
             min(val) AS min_s, max(val) AS max_s,
             round(min(try_cast(val AS DOUBLE)), 6) AS num_min,
             round(max(try_cast(val AS DOUBLE)), 6) AS num_max,
             min(CASE WHEN val IS NOT NULL
                      THEN lpad(CAST(999999999999 - cnt AS VARCHAR), 12, '0') || '|' || val END) AS k
      FROM vc GROUP BY col_name
    )
    SELECT col_name, n_rows, n_null, n_distinct, min_s, max_s, num_min, num_max,
           substr(k, 14) AS top_value,
           999999999999 - CAST(substr(k, 1, 12) AS BIGINT) AS top_count
    FROM agg
    """,
    doc="ANALYZE-style column profiler: per-column row/null/distinct "
    "counts, lexical min/max of the canonical string form, numeric "
    "bounds via try_cast, and the deterministic top value (highest "
    "count, ties to the smallest value) — the statistics pass that "
    "tells you which DQ rules to write and which joins broadcast.  One "
    "unpivot + one map-side-combined (column, value) count + one "
    "rollup of combinable aggregates; the top value rides a fixed-width "
    "inverted-count composite key reduced with plain min(), so no "
    "per-column value funnel or window sort exists anywhere in the "
    "plan.  100 TB swaps documented in scale/profile.py: HLL distincts "
    "and Misra-Gries top-k (both in-repo) when a column's value set "
    "outgrows the count shuffle.  Tier 2: yields its driver-window "
    "slot; parity via pytest oracle suite + driver-sim.",
    tags=("dq", "scale", "grouping"),
    bench=True,
    tier=2,
)
def profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.profile import profile_table

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return profile_table(docs, ("doc_id", "text", "lang", "source", "n_chars"))


@register(
    "drift",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor(n_chars / 100.0) AS BIGINT), 15) AS bin,
             source IN ('src0','src1','src2','src3','src4') AS in_a
      FROM documents
    ), g AS (
      SELECT bin,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      FROM b GROUP BY bin
    ), t AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS na_t, CAST(sum(n_b) AS BIGINT) AS nb_t
      FROM g
    )
    SELECT bin, n_a, n_b,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
             CAST(round(
               (CAST(n_a AS DOUBLE)/CAST(na_t AS DOUBLE)
                  - CAST(n_b AS DOUBLE)/CAST(nb_t AS DOUBLE))
               * CAST(CAST(round(ln((CAST(n_a AS DOUBLE)*CAST(nb_t AS DOUBLE))
                            / (CAST(n_b AS DOUBLE)*CAST(na_t AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS DOUBLE)
             ) AS BIGINT)
           END AS term_micro
    FROM g, t
    """,
    doc="Distribution-drift (PSI) report between corpus slices: the "
    "document-length distribution of sources src0-4 (slice A) vs "
    "src5-9 (slice B), binned by a deterministic integer lattice "
    "(floor(n_chars/100) capped at 15 — data-independent, so the "
    "report is oracle-exact and comparable across runs).  One corpus "
    "scan folds to bin grain map-side (no data-row shuffle); totals "
    "aggregate the BIN TABLE and broadcast back as one row.  Per-bin "
    "PSI terms in exact integer micro-nats (the scale/lm.py ln-"
    "quantization convention; +-*-/ are correctly-rounded IEEE, so "
    "everything else is bit-identical cross-engine); empty-side bins "
    "report NULL terms but keep their counts — a bin one slice "
    "abandons IS the drift signal.  PSI = sum(term_micro)/1e6.  "
    "Tier 2: yields its driver-window slot; parity via pytest oracle "
    "suite.",
    tags=("dq", "drift", "scale"),
    bench=True,
    tier=2,
)
def drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.dq import psi_drift

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bin_col = F.least(
        F.floor(F.col("n_chars") / F.lit(100.0)).cast("long"), F.lit(15).cast("long")
    )
    in_a = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    return psi_drift(docs, bin_col, in_a)
