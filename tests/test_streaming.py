"""Structured Streaming equivalence: the same operator definitions run
as a real stream (file source, watermark) and must produce the batch
result once the stream drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from yodel_etl_spark.queries._util import cents
from yodel_etl_spark.session import load_tables
from yodel_etl_spark.streaming.events import (
    last_value_wins,
    tumbling_counts,
    with_watermark,
)


def test_streaming_tumbling_equals_batch(spark, sf_small, tmp_path):
    ev = load_tables(spark, sf_small, ("events",))["events"]
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(ev, "1 hour", value_cents=cents("value")).collect()
    }

    # replay the same events as a file stream
    src = str(tmp_path / "stream_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = tumbling_counts(
        with_watermark(stream, "ts", "1 minute"), "1 hour", value_cents=cents("value")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
    finally:
        q.stop()
    assert got == batch
    assert len(got) > 0


def test_streaming_last_value_wins(spark, sf_small, tmp_path):
    ev = load_tables(spark, sf_small, ("events",))["events"]
    batch = {
        r["user_id"]: r["last_value"]
        for r in last_value_wins(ev, "user_id", ["ts", "event_id"], ["value"]).collect()
    }
    src = str(tmp_path / "stream_src2")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        last_value_wins(stream, "user_id", ["ts", "event_id"], ["value"])
        .writeStream.format("memory")
        .queryName("lvw_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["user_id"]: r["last_value"] for r in spark.sql("SELECT * FROM lvw_test").collect()}
    finally:
        q.stop()
    assert got == batch
