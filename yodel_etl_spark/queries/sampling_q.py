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
    SELECT split, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS total_chars
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


# (events_value_percentiles merged into events_type_profile in
# queries/windows.py — same groupBy key, one shuffle instead of two
# registry slots)


@register(
    "events_heavy_hitters",
    oracle=None,  # approximate sketch — exactness asserted in pytest
    # (tests/test_sketch.py: exact-degradation parity vs groupBy +
    # the >n/capacity guarantee under forced decrements); registered
    # without an oracle so it sits in the rows-only tail and never
    # displaces an oracle-backed query from the driver's window
    doc="Mergeable Misra-Gries heavy-hitters: per-partition bounded "
    "sketches (mapInPandas, O(capacity) state) merged by a tiny "
    "groupBy — top user_ids by event count with deterministic "
    "count_lo/count_hi bounds.  The 100 TB answer to top-k over "
    "billion-key columns where exact groupBy state is the bottleneck.",
    tags=("sketch", "agg", "scale"),
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sketch import approx_top_k

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return approx_top_k(ev, "user_id", k=20, capacity=1024)
