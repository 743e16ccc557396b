"""Training-pipeline sampling/statistics queries: deterministic hash
split (portable md5 bucketing, oracle-checked against DuckDB's md5) and
exact per-group percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.sampling import hash_split
from yodel_etl_spark.session import load_tables


@register(
    "split_documents_counts",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
             text
      FROM (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS b,
               text
        FROM documents
      )
    )
    SELECT split, count(*) AS n_docs, sum(length(text)) AS total_chars
    FROM s GROUP BY split
    """,
    doc="Deterministic 80/10/10 train/val/test split via md5 hash "
    "bucketing: membership is a pure function of doc_id — stable under "
    "appends/re-runs (randomSplit is not), shuffle-free, and portable "
    "across engines (md5 is bit-identical in Spark and DuckDB, so the "
    "oracle checks the actual split assignment, not just counts).",
    tags=("sampling", "scale"),
    bench=True,
)
def split_documents_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
        )
    )


@register(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(min(value), 4) AS v_min,
           round(max(value), 4) AS v_max
    FROM events GROUP BY event_type
    """,
    doc="Exact per-type value percentiles (sort-based percentile(), "
    "linear interpolation — same definition as DuckDB quantile_cont). "
    "The 100 TB path swaps in percentile_approx (mergeable KLL-style "
    "sketch, one pass, no per-group sort) — approximate, so the exact "
    "form is what the oracle checks.",
    tags=("agg",),
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )
