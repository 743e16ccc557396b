"""Classify-pipeline queries (SURVEY §2.2 P5/P6/P7, §2.4 A1) bound to the
``documents`` table for the DuckDB oracle.

The parks pipeline itself is golden-tested on F1 fixtures
(tests/test_parks_pipeline.py); here the same operators run over
``documents.text`` with an engine-domain keyword map so the driver can
value-hash them against SQL.

Scale: every query is scan → one select of CASE/rlike exprs (+ at most
one shuffle for the value-counts agg).  No Python, no UDFs — the 100 TB
plan is a single codegen stage per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.ops.classify import active_features, apply_flag_map, tristate, value_counts
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables

#: engine-domain keyword map over the documents vocabulary
ENGINE_FLAGS: dict[str, list[str]] = {
    "has_spark": ["spark"],
    "has_window": ["window"],
    "has_vector": ["vector"],
    "uses_join": ["join", "merge"],
    "uses_groupby": ["group", "agg"],
    "is_fast": ["fast"],
    "is_slow": ["slow"],
}

_FLAGS = list(ENGINE_FLAGS)


def _tristate_sql(kws: list[str]) -> str:
    """DuckDB twin of ops.classify.tristate (keywords here are
    alphabetic, so escaping is a no-op on both engines)."""
    alt = "|".join(kws)
    return (
        f"CASE WHEN regexp_matches(lower(coalesce(text, '')), '\\b(?:{alt})\\b') THEN 'Yes' "
        f"WHEN regexp_matches(lower(coalesce(text, '')), '\\bno\\s+(?:{alt})\\b') THEN 'No' "
        f"ELSE 'Don''t Know' END"
    )


_TRISTATE_COLS_SQL = ",\n           ".join(
    f"{_tristate_sql(kws)} AS {flag}" for flag, kws in ENGINE_FLAGS.items()
)


@register(
    "classify_tristate",
    oracle=f"""
    WITH flagged AS (
      SELECT doc_id, text,
             {_TRISTATE_COLS_SQL}
      FROM documents
    )
    SELECT doc_id,
           {", ".join(_FLAGS)},
           CASE WHEN NOT coalesce(
                    regexp_matches(lower(text), '{"|".join(kw for sub in ENGINE_FLAGS.values() for kw in sub)}'),
                    false)
                THEN text END AS other_engine,
           concat_ws(', ',
             {", ".join(f"CASE WHEN {flag} = 'Yes' THEN '{flag.replace('_', ' ')}' END" for flag in _FLAGS)}
           ) AS features
    FROM flagged
    """,
    doc="P5+P6+P7 in one scan, same doc_id grain (the r3 same-grain-merge "
    "convention — refs_collapse/E2 precedent): the 7-flag tristate "
    "classifier (yes-before-no branch order), the residual column (text "
    "kept only when NO keyword of the whole map matched — unescaped, "
    "unbounded regex, reference parity normalize_parks_json.py:173-175), "
    "and the active-feature roll-up (comma-joined names of Yes flags, "
    "underscores→spaces, '' when none).  The flags materialize once in "
    "their own projection (multiply-referenced aliases are not "
    "re-inlined), so the merge adds two cheap derived columns to P5's "
    "regex pass instead of two more table scans — and frees two driver "
    "correctness-window slots (VERDICT r3 item 6).",
    tags=("classify",),
    bench=True,
)
def classify_tristate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    flagged = apply_flag_map(docs, "text", ENGINE_FLAGS, "other_engine")
    return flagged.select(
        "doc_id", *_FLAGS, "other_engine", active_features(_FLAGS).alias("features")
    )


@register(
    "vcounts",  # renamed from classify_value_counts (r13, stdout byte budget)
    oracle=f"""
    WITH flagged AS (
      SELECT {_TRISTATE_COLS_SQL} FROM documents
    )
    {" UNION ALL ".join(f"SELECT '{flag}' AS flag, {flag} AS value, count(*) AS n FROM flagged GROUP BY 2" for flag in _FLAGS)}
    """,
    doc="A1 value-counts summary for every flag in ONE pass "
    "(stack/unpivot → single groupBy) instead of one job per column "
    "(normalize_parks_json.py:219-222).",
    tags=("classify", "agg"),
)
def classify_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    flagged = docs.select(
        *[tristate("text", kws).alias(flag) for flag, kws in ENGINE_FLAGS.items()]
    )
    return value_counts(flagged, _FLAGS)
