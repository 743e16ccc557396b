"""Opt-in scale validation (set SPARK_GRAFT_STRESS=1): replicate the
sf0.1 documents table 20× (100k docs, perturbed text + distinct ids)
and assert the curation pipeline scales sublinearly in wall time per
row — the local evidence for the 100 TB posture claims.

Skipped by default: it's a timing test on ~60 s of extra work and a
shared host; run it on a quiet machine.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS") != "1",
    reason="set SPARK_GRAFT_STRESS=1 to run scale-stress timings",
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def test_curate_scales_sublinearly(spark, tmp_path):
    from yodel_etl_spark.pipelines.curate import curate
    from yodel_etl_spark.session import load_tables, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias(
                "text"
            ),
        )
    )
    src = str(tmp_path / "big_docs")
    big.write.mode("overwrite").parquet(src)

    small = spread(docs.select("doc_id", "text"))
    large = spread(spark.read.parquet(src))

    def timed(frame) -> float:
        c = curate(frame)
        _force(c)  # warm
        t0 = time.perf_counter()
        _force(c)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    # 20x rows must cost far less than 20x wall (narrow signal pass +
    # digest-only shuffles); observed ~2.2x on local[32]
    assert t_large < t_small * 8, (t_small, t_large)


def test_span_scrub_scales_sublinearly(spark, tmp_path):
    """20× rows (with shared spans planted by the replication itself —
    the ' repN' suffix keeps tails distinct while every interior span
    duplicates 20-way) must cost far less than 20× wall: the scrub's
    only data-sized shuffle is the digest count."""
    from yodel_etl_spark.scale.dedup import span_scrub
    from yodel_etl_spark.session import load_tables, release, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
    )
    src = str(tmp_path / "big_docs_span")
    big.write.mode("overwrite").parquet(src)

    small = spread(docs.select("doc_id", "text"))
    large = spread(spark.read.parquet(src))

    def timed(frame) -> float:
        c = span_scrub(frame, "doc_id", "text", w=3)
        _force(c)  # warm
        t0 = time.perf_counter()
        _force(c)
        release(c)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    assert t_large < t_small * 8, (t_small, t_large)
