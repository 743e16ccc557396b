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


def test_stateful_last_event_matches_batch(spark, sf_small, tmp_path):
    """Custom applyInPandasWithState operator == batch max_by fold."""
    from yodel_etl_spark.streaming.events import stateful_last_event

    ev = load_tables(spark, sf_small, ("events",))["events"].select(
        F.col("user_id").cast("string").alias("session_id"),
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("answer"),
    )
    batch = {
        r["session_id"]: r["last_answer"]
        for r in last_value_wins(ev, "session_id", ["seq"], ["answer"]).collect()
    }

    src = str(tmp_path / "stateful_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stateful_last_event(stream, "session_id", "seq", "answer")
        .writeStream.format("memory")
        .queryName("stateful_last")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT session_id, max_by(answer, seq) AS answer FROM stateful_last GROUP BY session_id"
        ).collect()
        got = {r["session_id"]: r["answer"] for r in rows}
    finally:
        q.stop()
    assert got == batch and len(got) > 0


def test_stream_static_enrichment_equals_batch(spark, sf_small, tmp_path):
    """enrich_with_dim over a readStream == the batch join; the static
    dim side is broadcast so the stream never shuffles for the join."""
    from yodel_etl_spark.streaming.events import enrich_with_dim

    t = load_tables(spark, sf_small, ("events", "customer"))
    ev = t["events"]
    dim = t["customer"].select("c_custkey", "c_mktsegment")

    def agg(df):
        joined = enrich_with_dim(df, dim, on=df["user_id"] == dim["c_custkey"], how="inner")
        return joined.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))

    batch = {r["c_mktsegment"]: r["n"] for r in agg(ev).collect()}

    src = str(tmp_path / "enrich_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        agg(stream)
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["c_mktsegment"]: r["n"]
            for r in spark.sql("SELECT * FROM enrich_test").collect()
        }
    finally:
        q.stop()
    assert got == batch and len(got) > 0


def test_streaming_dedup_within_watermark(spark, sf_small, tmp_path):
    """An exactly-redelivered feed (every event twice) deduped on
    event_id yields each event once — bounded-state streaming dedup."""
    from yodel_etl_spark.streaming.events import dedup_events

    ev = load_tables(spark, sf_small, ("events",))["events"].select(
        "event_id", "ts", "user_id", "event_type"
    )
    n_unique = ev.count()
    doubled = ev.union(ev)

    src = str(tmp_path / "dedup_src")
    doubled.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(doubled.schema).parquet(src)
    deduped = dedup_events(stream, ["event_id"], ts_col="ts", within="1 minute")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_test").first()
    finally:
        q.stop()
    assert got["n"] == got["d"] == n_unique


def test_sse_parse_streams(spark, tmp_path):
    """io.sse.parse_events is stream-transparent: same expressions over
    readStream produce the batch result."""
    from tests.test_io import SSE_TRANSCRIPT
    from yodel_etl_spark.io.sse import final_answers, parse_events

    lines = spark.createDataFrame(SSE_TRANSCRIPT, "stream_id string, seq int, raw string")
    batch = {
        r["stream_id"]: r["answer"]
        for r in final_answers(parse_events(lines), ["stream_id"], "seq").collect()
    }
    src = str(tmp_path / "sse_src")
    lines.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(lines.schema).parquet(src)
    q = (
        final_answers(parse_events(stream), ["stream_id"], "seq")
        .writeStream.format("memory")
        .queryName("sse_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["stream_id"]: r["answer"] for r in spark.sql("SELECT * FROM sse_stream").collect()}
    finally:
        q.stop()
    assert got == batch == {"s1": "final answer", "s2": "s2 answer"}


def test_incremental_csv_sink(spark, sf_small, tmp_path):
    """K3: micro-batches append with checkpoint; rows survive in files."""
    import os

    from yodel_etl_spark.io.delim import incremental_csv_sink

    ev = load_tables(spark, sf_small, ("events",))["events"].select("event_id", "event_type")
    src = str(tmp_path / "k3_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out, ckpt = str(tmp_path / "k3_out"), str(tmp_path / "k3_ckpt")
    q = incremental_csv_sink(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.option("header", True).csv(out)
    assert back.count() == ev.count()
    assert os.path.isdir(ckpt)  # restartable progress


def test_checkpoint_restart_exactly_once(spark, sf_small, tmp_path):
    """Kill a streaming query mid-corpus, append new input, restart with
    the SAME checkpoint: output must contain every input row exactly
    once (checkpoint replay, no duplication of the pre-restart batch).
    The stream applies a curation op (PII redaction) in flight —
    stateless column expressions run unchanged in streams."""
    from yodel_etl_spark.scale.redact import redact_pii

    ev = load_tables(spark, sf_small, ("events",))["events"].select(
        "event_id", "event_type"
    )
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "restart_src")
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")
    first.write.mode("overwrite").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(first.schema)
            .parquet(src)
            .withColumn("event_type", redact_pii(F.col("event_type")))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # drains the first half, then terminates
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    second.write.mode("append").parquet(src)
    run_once()  # restart from checkpoint: must pick up ONLY the delta

    got = [r["event_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == sorted(r["event_id"] for r in ev.collect())
    assert len(got) == len(set(got)), "restart duplicated rows"


def test_streaming_curate_signals_equal_batch(spark, tmp_path):
    """The curation signal+filter stage is stateless (pure narrow
    projections), so it runs unchanged over a readStream — the
    incremental-corpus form of pipelines/curate.py (dedup/decontam then
    run as the established bounded-state / stream-static stages)."""
    from yodel_etl_spark.pipelines.curate import CurateConfig, audit, with_signals

    good = "the quick brown fox and a lazy dog walk over the green hill today"
    docs = spark.createDataFrame(
        [(1, good), (2, "!!! ???"), (3, "the spam and ham " * 20)],
        "doc_id long, text string",
    )
    batch = {r["doc_id"]: r["drop_reason"] for r in audit(docs).collect()}

    src = str(tmp_path / "curate_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        audit(stream)
        .writeStream.format("memory")
        .queryName("curate_signals_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["drop_reason"]
            for r in spark.sql("SELECT * FROM curate_signals_test").collect()
        }
    finally:
        q.stop()
    assert got == batch
    assert got[1] is None and got[2] == "low_quality" and got[3] == "repetitive_2gram"


def test_stream_stream_interval_join_equals_batch(spark, sf_small, tmp_path):
    from yodel_etl_spark.streaming.events import correlate_streams

    ev = load_tables(spark, sf_small, ("events",))["events"]
    batch = {
        (r["user_id"], r["l_id"], r["r_id"])
        for r in correlate_streams(ev, ev).collect()
    }
    assert len(batch) > 0

    src = str(tmp_path / "ss_join_src")
    ev.write.mode("overwrite").parquet(src)
    left = spark.readStream.schema(ev.schema).parquet(src)
    right = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        correlate_streams(left, right)
        .writeStream.format("memory")
        .queryName("ss_join_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["l_id"], r["r_id"])
            for r in spark.sql("SELECT * FROM ss_join_test").collect()
        }
    finally:
        q.stop()
    # a single micro-batch sees all data before any watermark advances,
    # so append mode emits every joined pair: exact equality
    assert got == batch


def test_stateful_scd2_multibatch_equals_batch(spark, sf_small, tmp_path):
    """Closed intervals emitted across a two-batch time-ordered drain
    equal the batch SCD2 history's non-current rows."""
    from yodel_etl_spark.ops.scd import scd2_history
    from yodel_etl_spark.streaming.events import stateful_scd2

    ev = load_tables(spark, sf_small, ("events",))["events"]
    batch_closed = {
        (str(r["user_id"]), r["event_type"], r["valid_from"], r["valid_to"])
        for r in scd2_history(ev, "user_id", "ts", "event_type", tiebreak_col="event_id")
        .where(~F.col("is_current"))
        .collect()
    }
    assert len(batch_closed) > 0

    # feed in two event-time-ordered chunks (the CDC shape)
    cut = ev.selectExpr("percentile(cast(ts as double), 0.5) p").first()["p"]
    src = str(tmp_path / "scd2_src")
    first = ev.where(F.col("ts").cast("double") <= cut)
    second = ev.where(F.col("ts").cast("double") > cut)
    first.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stateful_scd2(stream)
        .writeStream.format("memory")
        .queryName("scd2_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        second.write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
            for r in spark.sql("SELECT * FROM scd2_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch_closed


def test_live_sse_stream_source_with_checkpoint_restart(spark, tmp_path):
    """VERDICT r3 item 5: the LIVE SSE adapter — a real HTTP endpoint
    polled by the sse_stream Python Data Source with Last-Event-ID
    resume — must (a) match the batch transcript result, and (b) resume
    exactly from a checkpoint after the query is killed and the server
    has streamed further events (no replayed or lost lines)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from yodel_etl_spark.io.sse import SseStreamDataSource, final_answers, parse_events
    from yodel_etl_spark.streaming.events import sse_answer_stream

    if SseStreamDataSource is None:
        pytest.skip("Python Data Source API not available")

    phase1 = [
        "event: ping",
        'data: {"code": 0, "message": "", "data": {"answer": "partial", "session_id": "sid1"}}',
        "data: not json {{{",
        'data: {"code": 1, "message": "err", "data": {"answer": "SKIP ME"}}',
        'data: {"code": 0, "message": "", "data": {"answer": "live final", "session_id": "sid1"}}',
    ]
    phase2 = [
        "data: true",
        'data: {"code": 0, "message": "", "data": {"answer": "post restart", "session_id": "sid1"}}',
        "data: [DONE]",
    ]

    class Replay(BaseHTTPRequestHandler):
        lines = list(phase1)

        def do_GET(self):  # noqa: N802 - stdlib handler contract
            start = int(self.headers.get("Last-Event-ID", 0))
            body = "".join(ln + "\n\n" for ln in type(self).lines[start:]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Replay)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}/stream"
    ckpt = str(tmp_path / "sse_ckpt")

    def run_query(name):
        return (
            sse_answer_stream(spark, url, stream_id="live1")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    try:
        q = run_query("sse_live1")
        try:
            q.processAllAvailable()
            got = {
                r["stream_id"]: r["answer"]
                for r in spark.sql("SELECT * FROM sse_live1").collect()
            }
        finally:
            q.stop()
        assert got == {"live1": "live final"}

        # batch equivalence on the same transcript
        rows = [("live1", i, ln) for i, ln in enumerate(phase1)]
        lines = spark.createDataFrame(rows, "stream_id string, seq long, raw string")
        batch = {
            r["stream_id"]: r["answer"]
            for r in final_answers(parse_events(lines), ["stream_id"], "seq").collect()
        }
        assert batch == got

        # server streams on while the query is down; restart resumes
        # from the checkpointed offset via Last-Event-ID
        Replay.lines = phase1 + phase2
        q = run_query("sse_live2")
        try:
            q.processAllAvailable()
            got2 = {
                r["stream_id"]: r["answer"]
                for r in spark.sql("SELECT * FROM sse_live2").collect()
            }
            progress = q.recentProgress
        finally:
            q.stop()
        assert got2 == {"live1": "post restart"}
        # the restarted query must NOT have re-read phase1 rows
        n_in = sum(p["numInputRows"] for p in progress)
        assert n_in <= len(phase2)
    finally:
        srv.shutdown()


def test_foreachbatch_incremental_dedup_ingest(spark, tmp_path):
    """The daily-ingest loop end to end: a document stream lands in an
    accumulating corpus through foreachBatch, each micro-batch exact-
    deduped against everything already landed (dedup_against) — so a
    text seen in any earlier batch never lands twice, while within-
    stream order and novel docs survive.  This is the streaming twin of
    the dedup_bloom/dedup_against batch pair."""
    import os

    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.dedup import dedup_against
    from yodel_etl_spark.session import release

    src = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)

    def land(batch, _bid):
        batch = batch.dropDuplicates(["text"])  # in-batch exact dedup
        spark_ = batch.sparkSession
        try:
            seen = spark_.read.parquet(corpus)
            novel = dedup_against(seen, batch, "doc_id", "text")
        except Exception:  # first batch: corpus dir does not exist yet
            novel = batch
        novel.write.mode("append").parquet(corpus)

    def drain():
        q = (
            spark.readStream.schema(b1.schema)
            .parquet(src)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(corpus)
    assert first.count() == 2  # in-batch dup of "alpha beta" collapsed

    # second ingest: one replay of an already-landed text + one novel
    b2 = spark.createDataFrame(
        [(10, "gamma delta"), (11, "epsilon zeta")],
        "doc_id long, text string",
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    drain()

    final = spark.read.parquet(corpus)
    texts = sorted(r["text"] for r in final.collect())
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]
    # exactly-once landing: no text duplicated across batches
    assert final.select("text").distinct().count() == final.count()


def test_events_stream_replay_equals_batch(spark, sf_small):
    """The registered streaming micro-bench (file-source replay →
    session_windows → memory sink) must produce EXACTLY the batch
    twin's session grain — the bounded-replay ≡ batch contract that
    makes the recorded throughput number meaningful."""
    from yodel_etl_spark.registry import load_all
    from yodel_etl_spark.session import load_tables
    from yodel_etl_spark.streaming.events import session_windows

    got = load_all()["replay"].build(spark, sf_small)
    ev = load_tables(spark, sf_small, ("events",))["events"]
    want = session_windows(ev, "30 minutes")
    assert got.schema == want.schema
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_stream_stream_left_outer_join_emits_null_padded(spark, tmp_path):
    """The left-outer stream-stream variant: matched pairs emit like the
    inner form; an unmatched left row emits NULL-padded only after a
    later batch pushes the watermark past its eviction horizon — proof
    that outer results are watermark-gated, not dropped."""
    from pyspark.sql import Row

    from yodel_etl_spark.streaming.events import correlate_streams

    def ev(eid, uid, minute):
        return Row(event_id=eid, user_id=uid, ts=f"2024-01-01 10:{minute:02d}:00")

    schema = "event_id long, user_id long, ts string"
    main = spark.createDataFrame(
        [
            ev(1, 7, 0),   # right-side trigger for user 7
            ev(2, 7, 5),   # left action: matches event 1 (5 min lookback-able)
            ev(3, 9, 5),   # left action with NO prior trigger → null-padded
        ],
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # second batch: far-future rows on BOTH sides push the watermark
    # (30 min delay) past the first batch's event times
    advance = spark.createDataFrame(
        [ev(100, 1, 0)], schema
    ).withColumn(
        "ts", (F.col("ts").cast("timestamp") + F.expr("INTERVAL 5 HOURS"))
    )

    src_l = str(tmp_path / "lo_left")
    src_r = str(tmp_path / "lo_right")
    main.write.mode("overwrite").parquet(src_l)
    main.write.mode("overwrite").parquet(src_r)
    left = spark.readStream.schema(main.schema).parquet(src_l)
    right = spark.readStream.schema(main.schema).parquet(src_r)
    q = (
        correlate_streams(left, right, lookback="15 minutes", how="left_outer")
        .writeStream.format("memory")
        .queryName("ss_left_outer")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        advance.write.mode("append").parquet(src_l)
        advance.write.mode("append").parquet(src_r)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["l_id"], r["r_id"])
            for r in spark.sql("SELECT * FROM ss_left_outer").collect()
        }
    finally:
        q.stop()
    # matched pair present; unmatched left row null-padded; the
    # advancer rows themselves are NOT yet evictable (nothing has
    # pushed the watermark past THEM), so they must not appear
    assert (7, 2, 1) in got
    assert (9, 3, None) in got
    assert not any(uid == 1 for uid, _, _ in got)
    # and the batch twin (same predicate, left_outer) agrees on the
    # first batch's rows
    batch = {
        (r["user_id"], r["l_id"], r["r_id"])
        for r in correlate_streams(main, main, lookback="15 minutes", how="left_outer").collect()
    }
    assert {(u, l, rr) for (u, l, rr) in got} == {
        (u, l, rr) for (u, l, rr) in batch if u != 1
    }


def test_correlate_streams_rejects_bad_how(spark, sf_small):
    import pytest

    from yodel_etl_spark.streaming.events import correlate_streams

    ev = load_tables(spark, sf_small, ("events",))["events"]
    with pytest.raises(ValueError):
        correlate_streams(ev, ev, how="full_outer")


def test_foreachbatch_quantile_sketch_accumulates(spark, tmp_path):
    """The quantile summary's merge-is-row-union claim, in streaming
    form: each micro-batch lands its bounded partials in a sketch dir
    (foreachBatch append), and a quantile read over the ACCUMULATED
    sketch answers for the union of all batches within the deterministic
    ε bound — no re-scan of landed data, the incremental-profiling
    loop."""
    import os

    from yodel_etl_spark.scale.sketch import quantile_partials, quantile_query

    src = str(tmp_path / "in")
    sk_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    vals1 = [float(v) for v in range(0, 4000)]
    vals2 = [float(v) for v in range(4000, 10000)]
    schema = "x double"
    spark.createDataFrame([(v,) for v in vals1], schema).coalesce(2).write.mode(
        "append"
    ).parquet(src)

    def land(batch, _bid):
        quantile_partials(batch, "x", capacity=64).write.mode("append").parquet(sk_dir)

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    spark.createDataFrame([(v,) for v in vals2], schema).coalesce(3).write.mode(
        "append"
    ).parquet(src)
    drain()

    merged = spark.read.parquet(sk_dir)
    n = len(vals1) + len(vals2)
    assert abs(merged.agg(F.sum("weight")).collect()[0][0] - n) < 1e-6
    got = {r["p"]: r["value"] for r in quantile_query(merged, [0.25, 0.5, 0.9]).collect()}
    # data is 0..9999 so true quantile value ≈ p·n; ε = n/64 per level,
    # ×2 slack for the stratum midpoint (same bound the batch tests pin)
    for p, v in got.items():
        assert abs(v - p * n) <= 2 * n / 64, (p, v)


def test_foreachbatch_cdc_snapshot_maintenance(spark, tmp_path):
    """Streaming MERGE: a CDC change stream maintains a keyed snapshot
    through foreachBatch + ops/cdc.apply_changes — upserts replace,
    deletes drop, and the final snapshot equals applying the whole log
    in one batch (exactly-once per micro-batch via the checkpoint).
    This is the streaming twin of the registered cdc query."""
    import os

    from yodel_etl_spark.ops.cdc import apply_changes

    src = str(tmp_path / "cdc_in")
    snap = str(tmp_path / "cdc_snap")
    ckpt = str(tmp_path / "cdc_ckpt")
    os.makedirs(src)

    schema = "k long, val double, seq long, op string"
    b1 = spark.createDataFrame(
        [(1, 1.0, 1, "U"), (2, 2.0, 1, "U"), (3, 3.0, 1, "U")], schema
    )
    b1.coalesce(1).write.mode("append").parquet(src)

    def land(batch, _bid):
        spark_ = batch.sparkSession
        try:
            base = spark_.read.parquet(snap)
        except Exception:  # first batch: empty snapshot
            base = spark_.createDataFrame([], "k long, val double")
        merged = apply_changes(
            base,
            batch,
            keys=("k",),
            order_by=("seq",),
            op_col="op",
            broadcast_changes=True,
        )
        # overwrite via staging dir (parquet can't overwrite its own input)
        stage = snap + "_stage"
        merged.write.mode("overwrite").parquet(stage)
        spark_.read.parquet(stage).write.mode("overwrite").parquet(snap)

    def drain():
        q = (
            spark.readStream.schema(b1.schema)
            .parquet(src)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert {
        (r["k"], r["val"]) for r in spark.read.parquet(snap).collect()
    } == {(1, 1.0), (2, 2.0), (3, 3.0)}

    # batch 2: update k=1, delete k=2, insert k=4 (with a superseded
    # intermediate for k=4)
    b2 = spark.createDataFrame(
        [(1, 10.0, 2, "U"), (2, 0.0, 2, "D"), (4, 4.0, 2, "U"), (4, 44.0, 3, "U")],
        schema,
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    drain()
    got = {(r["k"], r["val"]) for r in spark.read.parquet(snap).collect()}
    assert got == {(1, 10.0), (3, 3.0), (4, 44.0)}

    # the incremental snapshot equals the one-shot apply of the full log
    full = apply_changes(
        spark.createDataFrame([], "k long, val double"),
        b1.unionByName(b2),
        keys=("k",),
        order_by=("seq",),
        op_col="op",
    )
    assert {(r["k"], r["val"]) for r in full.collect()} == got


def test_foreachbatch_near_dedup_ingest(spark, tmp_path):
    """The NEAR-dup twin of the exact ingest loop: a document stream
    lands through near_dedup_ingest — in-batch near-dup pairs collapse
    to the min id, and a later batch's jittered copy of an already-
    landed doc never lands (probe against the persisted MinHash index),
    while novel docs survive.  The index accumulates with the corpus."""
    import os

    from yodel_etl_spark.scale.dedup import near_dedup_ingest

    words = "red green blue cyan teal pink gold gray onyx jade".split()

    def body(seed):
        return " ".join(words[(seed * 3 + j * 7) % 10] + str((seed + j) % 11) for j in range(20))

    src = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "mh_index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    b1 = spark.createDataFrame(
        [(1, body(1)), (2, body(1) + " extra2"), (3, body(3)), (4, body(4))],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)

    land = near_dedup_ingest(index, corpus, threshold=0.8)

    def drain():
        q = (
            spark.readStream.schema(b1.schema)
            .parquet(src)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    first = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert first == {1, 3, 4}  # doc 2 is an in-batch jitter of doc 1

    b2 = spark.createDataFrame(
        [(10, body(3) + " extra10"), (11, body(30))],
        "doc_id long, text string",
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    drain()

    final = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert final == {1, 3, 4, 11}  # 10 is a cross-batch jitter of landed 3
    # the index admitted exactly the landed docs
    idx_docs = {r["doc"] for r in spark.read.parquet(f"{index}/sets").collect()}
    assert idx_docs == final


def test_foreachbatch_sketch_dedup_ingest(spark, tmp_path):
    """The Hamming twin of the near-dup ingest loop, over a 64-bit
    sketch stream (the image/audio shape): in-batch near-dups collapse,
    a later batch's 2-bit-flipped copy of a landed sketch never lands,
    novel sketches survive, the index accumulates."""
    import os

    from yodel_etl_spark.scale.dedup import sketch_dedup_ingest

    def sk(seed):
        return (seed * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF

    src = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "hm_index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    b1 = spark.createDataFrame(
        [(1, sk(1)), (2, sk(1) ^ 0b11), (3, sk(3)), (4, sk(4))],
        "doc long, sim long",
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    land = sketch_dedup_ingest(index, corpus, max_distance=3)

    def drain():
        q = (
            spark.readStream.schema(b1.schema)
            .parquet(src)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    first = {r["doc"] for r in spark.read.parquet(corpus).collect()}
    assert first == {1, 3, 4}  # doc 2 is a 2-bit flip of doc 1

    b2 = spark.createDataFrame(
        [(10, sk(3) ^ 0b101), (11, sk(777))], "doc long, sim long"
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    drain()
    final = {r["doc"] for r in spark.read.parquet(corpus).collect()}
    assert final == {1, 3, 4, 11}  # 10 is near landed 3; 11 novel
    idx_docs = {r["doc"] for r in spark.read.parquet(f"{index}/banded").collect()}
    assert idx_docs == final


def test_near_dedup_ingest_crash_between_corpus_and_extend(spark, tmp_path, monkeypatch):
    """The ingest gate's load-bearing write order: the corpus append
    lands BEFORE the index extend, so a crash in between replays into a
    duplicate corpus append (the documented at-least-once case), never
    a silent loss.  Index-first would make the replay self-hit against
    rows whose corpus append never happened and drop the batch forever.
    Also pins full-success replay idempotency: the self-hit gate makes
    a re-delivered fully-landed batch a no-op."""
    import pytest

    from yodel_etl_spark.scale import dedup as D

    words = "red green blue cyan teal pink gold gray onyx jade".split()

    def body(seed):
        return " ".join(
            words[(seed * 3 + j * 7) % 10] + str((seed + j) % 11) for j in range(20)
        )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "mh_index")
    land = D.near_dedup_ingest(index, corpus, threshold=0.8)

    b1 = spark.createDataFrame(
        [(1, body(1)), (3, body(3)), (4, body(4))], "doc_id long, text string"
    )
    land(b1, 0)  # full success: index + corpus hold {1, 3, 4}

    b2 = spark.createDataFrame(
        [(10, body(3) + " extra10"), (11, body(30))], "doc_id long, text string"
    )
    real_extend = D._extend_index_tables

    def boom(*a, **k):
        raise RuntimeError("crash between corpus append and index extend")

    monkeypatch.setattr(D, "_extend_index_tables", boom)
    with pytest.raises(RuntimeError, match="crash between"):
        land(b2, 1)
    # crash-window state: survivor 11 is in the corpus but NOT the index
    assert spark.read.parquet(corpus).where("doc_id = 11").count() == 1
    idx = {r["doc"] for r in spark.read.parquet(f"{index}/sets").collect()}
    assert 11 not in idx

    monkeypatch.setattr(D, "_extend_index_tables", real_extend)
    land(b2, 1)  # at-least-once replay
    got = spark.read.parquet(corpus)
    ids = {r["doc_id"] for r in got.select("doc_id").distinct().collect()}
    assert ids == {1, 3, 4, 11}  # no loss; 10 gated as a jitter of landed 3
    # the duplicate append IS the documented posture (dedupe by id downstream)
    assert got.where("doc_id = 11").count() == 2
    idx = {r["doc"] for r in spark.read.parquet(f"{index}/sets").collect()}
    assert idx == {1, 3, 4, 11}

    land(b2, 1)  # full-success replay: self-hit gate makes it a no-op
    assert spark.read.parquet(corpus).where("doc_id = 11").count() == 2


def test_sketch_dedup_ingest_crash_windows_no_loss(spark, tmp_path, monkeypatch):
    """Hamming-twin crash windows, both branches: (a) first batch dies
    between the corpus append and the index WRITE, (b) a later batch
    dies between the corpus append and the index EXTEND.  Replays must
    recover every survivor (dedupe-by-id grain) — never drop one to a
    self-hit."""
    import pytest

    from yodel_etl_spark.scale import dedup as D

    def sk(seed):
        return (seed * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "hm_index")
    land = D.sketch_dedup_ingest(index, corpus, max_distance=3)

    b1 = spark.createDataFrame([(1, sk(1)), (3, sk(3))], "doc long, sim long")

    def boom(*a, **k):
        raise RuntimeError("crash before index write")

    real_write = D.write_hamming_index
    monkeypatch.setattr(D, "write_hamming_index", boom)
    with pytest.raises(RuntimeError):
        land(b1, 0)
    monkeypatch.setattr(D, "write_hamming_index", real_write)
    land(b1, 0)  # replay rebuilds: no index existed, so branch re-runs whole
    got = spark.read.parquet(corpus)
    assert {r["doc"] for r in got.select("doc").distinct().collect()} == {1, 3}

    b2 = spark.createDataFrame(
        [(10, sk(3) ^ 0b101), (11, sk(777))], "doc long, sim long"
    )
    real_extend = D.extend_hamming_index
    monkeypatch.setattr(D, "extend_hamming_index", boom)
    with pytest.raises(RuntimeError):
        land(b2, 1)
    monkeypatch.setattr(D, "extend_hamming_index", real_extend)
    land(b2, 1)
    got = spark.read.parquet(corpus)
    ids = {r["doc"] for r in got.select("doc").distinct().collect()}
    assert ids == {1, 3, 11}  # 10 gated (2 bits off landed 3); 11 recovered
    idx = {r["doc"] for r in spark.read.parquet(f"{index}/banded").collect()}
    assert idx == {1, 3, 11}


def test_ingest_gates_release_cache_on_failed_batch(spark, tmp_path, monkeypatch):
    """A crashed land() attempt must leave the CacheManager exactly as
    it found it: foreachBatch RETRIES failed batches, so one stranded
    (banded, sets) pair per attempt is the long-running-stream leak
    register_persisted exists to close — the release now runs in a
    finally, not only on the success path.  localCheckpoint RDDs are
    RDD-grain persists, not CacheManager entries, so the emptiness
    probe is exact even mid-suite."""
    import pytest

    from yodel_etl_spark.scale import dedup as D

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()

    words = "red green blue cyan teal pink gold gray onyx jade".split()

    def body(seed):
        return " ".join(
            words[(seed * 3 + j * 7) % 10] + str((seed + j) % 11) for j in range(20)
        )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "mh_index")
    land = D.near_dedup_ingest(index, corpus, threshold=0.8)
    land(spark.createDataFrame([(1, body(1))], "doc_id long, text string"), 0)
    assert cm.isEmpty(), "successful near_dedup_ingest batch left cached frames"

    def boom(*a, **k):
        raise RuntimeError("crash in extend")

    monkeypatch.setattr(D, "_extend_index_tables", boom)
    with pytest.raises(RuntimeError, match="crash in extend"):
        land(
            spark.createDataFrame([(2, body(30))], "doc_id long, text string"), 1
        )
    assert cm.isEmpty(), "failed near_dedup_ingest batch leaked cached frames"

    corpus2 = str(tmp_path / "corpus2")
    index2 = str(tmp_path / "hm_index")
    land2 = D.sketch_dedup_ingest(index2, corpus2, max_distance=3)
    land2(spark.createDataFrame([(1, 12345)], "doc long, sim long"), 0)
    assert cm.isEmpty(), "successful sketch_dedup_ingest batch left cached frames"

    monkeypatch.setattr(D, "extend_hamming_index", boom)
    with pytest.raises(RuntimeError, match="crash in extend"):
        land2(spark.createDataFrame([(2, 999999)], "doc long, sim long"), 1)
    assert cm.isEmpty(), "failed sketch_dedup_ingest batch leaked cached frames"

    # embedding twin: pairs registers the persisted LSH sketch
    from yodel_etl_spark.scale import similarity as S

    corpus3 = str(tmp_path / "corpus3")
    index3 = str(tmp_path / "ivf_index")
    land3 = D.embedding_dedup_ingest(index3, corpus3, centroid_every=1)
    land3(
        spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
        ),
        0,
    )
    assert cm.isEmpty(), "successful embedding_dedup_ingest batch left cached frames"
    monkeypatch.setattr(S, "extend_ivf_index", boom)
    with pytest.raises(RuntimeError, match="crash in extend"):
        land3(
            spark.createDataFrame(
                [(2, [0.0, 1.0, 0.0])], "vec_id long, embedding array<double>"
            ),
            1,
        )
    assert cm.isEmpty(), "failed embedding_dedup_ingest batch leaked cached frames"


def test_near_dedup_ingest_component_map_replay_parity(spark, tmp_path, monkeypatch):
    """The opt-in components_path closes the incremental loop's cluster
    leg: across a multi-batch replay the persisted (node, component)
    map must equal connected_components over EVERY pair the gate ever
    emitted (in-batch pairs + cross-batch probe hits, gated docs
    included), survive a crash inside the map fold (versioned
    snapshots: stale-but-complete map until the replay re-folds), and
    ignore incomplete snapshot directories."""
    import pytest

    from yodel_etl_spark.scale import cluster as C
    from yodel_etl_spark.scale import dedup as D

    words = "red green blue cyan teal pink gold gray onyx jade".split()

    def body(seed):
        return " ".join(
            words[(seed * 3 + j * 7) % 10] + str((seed + j) % 11) for j in range(20)
        )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "mh_index")
    comps = str(tmp_path / "comps")
    land = D.near_dedup_ingest(
        index, corpus, threshold=0.8, components_path=comps
    )

    seen: list[tuple[int, int]] = []
    real_update = C.update_component_map

    def spy(spark_, path, pairs, **kw):
        seen.extend((r["doc_a"], r["doc_b"]) for r in pairs.collect())
        return real_update(spark_, path, pairs, **kw)

    monkeypatch.setattr(C, "update_component_map", spy)

    def map_dict():
        return {
            r["node"]: r["component"]
            for r in C.read_component_map(spark, comps).collect()
        }

    # batch 1: docs 1-4 distinct, 5 = in-batch jitter of 1
    land(
        spark.createDataFrame(
            [(i, body(i)) for i in (1, 2, 3, 4)] + [(5, body(1) + " j5")],
            "doc_id long, text string",
        ),
        0,
    )
    assert map_dict() == {1: 1, 5: 1}

    # batch 2: 10 = jitter of landed 3 (probe pair), 12 = jitter of 10
    # (in-batch pair; 12 never probes — it loses in-batch), 11 fresh
    b2 = spark.createDataFrame(
        [(10, body(3) + " j10"), (11, body(50)), (12, body(3) + " j10 j12")],
        "doc_id long, text string",
    )
    land(b2, 1)
    assert map_dict() == {1: 1, 5: 1, 3: 3, 10: 3, 12: 3}

    # full-success replay: every doc self-hit-gated, self-pairs dropped,
    # the same real pairs re-fold — map content must not change
    land(b2, 1)
    assert map_dict() == {1: 1, 5: 1, 3: 3, 10: 3, 12: 3}

    # batch 3: 20 = jitter of landed 2 (gated, pair still folds),
    # 21 fresh (lands) — and the map fold CRASHES after the corpus and
    # index writes; replay must heal the map without duplicating 21
    b3 = spark.createDataFrame(
        [(20, body(2) + " j20"), (21, body(60))], "doc_id long, text string"
    )

    def boom(*a, **k):
        raise RuntimeError("crash in component-map fold")

    monkeypatch.setattr(C, "update_component_map", boom)
    with pytest.raises(RuntimeError, match="component-map fold"):
        land(b3, 2)
    # crash-window state: 21 landed, map is the stale-but-complete v2
    ids = {r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").distinct().collect()}
    assert 21 in ids
    assert map_dict() == {1: 1, 5: 1, 3: 3, 10: 3, 12: 3}

    monkeypatch.setattr(C, "update_component_map", spy)
    land(b3, 2)  # replay: 21 self-hit-gated, (20, 2) re-derived and folded
    assert map_dict() == {1: 1, 5: 1, 3: 3, 10: 3, 12: 3, 2: 2, 20: 2}
    assert spark.read.parquet(corpus).where("doc_id = 21").count() == 1

    # THE parity pin: map == connected_components over every pair ever
    # emitted by the gate (replays included — closure is idempotent)
    all_pairs = spark.createDataFrame(seen, "doc_a long, doc_b long")
    want = {
        r["node"]: r["component"]
        for r in C.connected_components(all_pairs).collect()
    }
    assert map_dict() == want

    # incomplete snapshot dirs (no _SUCCESS) are invisible to readers
    v = C.latest_component_version(spark, comps)
    junk = tmp_path / "comps" / "map_v99"
    junk.mkdir()
    (junk / "part-junk.parquet").write_bytes(b"not parquet")
    assert C.latest_component_version(spark, comps) == v
    assert map_dict() == want


def test_sketch_dedup_ingest_component_map(spark, tmp_path, monkeypatch):
    """Hamming-twin component map: same contract as the MinHash gate —
    in-batch and probe pairs (gated sketches included) fold into the
    versioned map, replays leave the content fixed, and the map equals
    connected_components over every pair the gate emitted."""
    from yodel_etl_spark.scale import cluster as C
    from yodel_etl_spark.scale import dedup as D

    def sk(seed):
        return (seed * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "hm_index")
    comps = str(tmp_path / "comps")
    land = D.sketch_dedup_ingest(
        index, corpus, max_distance=3, components_path=comps
    )

    seen: list[tuple[int, int]] = []
    real_update = C.update_component_map

    def spy(spark_, path, pairs, **kw):
        seen.extend((r["doc_a"], r["doc_b"]) for r in pairs.collect())
        return real_update(spark_, path, pairs, **kw)

    monkeypatch.setattr(C, "update_component_map", spy)

    def map_dict():
        return {
            r["node"]: r["component"]
            for r in C.read_component_map(spark, comps).collect()
        }

    b1 = spark.createDataFrame(
        [(1, sk(1)), (2, sk(2)), (5, sk(1) ^ 0b11)], "doc long, sim long"
    )
    land(b1, 0)
    assert map_dict() == {1: 1, 5: 1}

    b2 = spark.createDataFrame(
        [(10, sk(2) ^ 0b101), (11, sk(77))], "doc long, sim long"
    )
    land(b2, 1)  # 10 gated by landed 2 (2 bits off) — pair still folds
    assert map_dict() == {1: 1, 5: 1, 2: 2, 10: 2}
    ids = {r["doc"] for r in spark.read.parquet(corpus).select("doc").distinct().collect()}
    assert ids == {1, 2, 11}

    land(b2, 1)  # full-success replay: self-hits drop, content fixed
    assert map_dict() == {1: 1, 5: 1, 2: 2, 10: 2}

    all_pairs = spark.createDataFrame(seen, "doc_a long, doc_b long")
    want = {
        r["node"]: r["component"]
        for r in C.connected_components(all_pairs).collect()
    }
    assert map_dict() == want


def test_foreachbatch_embedding_dedup_ingest(spark, tmp_path, monkeypatch):
    """The ANN member of the ingest-gate family: in-batch LSH+verify
    collapse, approximate IVF probe of the accumulated corpus, corpus-
    before-index crash windows on BOTH branches, component-map leg,
    and full-success replay idempotency — the near/sketch gate
    contract, embedding-typed."""
    import pytest

    from yodel_etl_spark.scale import cluster as C
    from yodel_etl_spark.scale import dedup as D
    from yodel_etl_spark.scale import similarity as S

    def onehot(dim, eps_at=None):
        v = [0.0] * 8
        v[dim] = 1.0
        if eps_at is not None:
            v[eps_at] = 0.01
        return v

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "ivf_index")
    comps = str(tmp_path / "comps")
    land = D.embedding_dedup_ingest(
        index,
        corpus,
        threshold=0.9,
        nprobe=3,
        centroid_every=2,
        components_path=comps,
    )

    def map_dict():
        return {
            r["node"]: r["component"]
            for r in C.read_component_map(spark, comps).collect()
        }

    schema = "vec_id long, embedding array<double>"
    # batch 1: one-hots 0..3 under ids 0..3; id 4 = twin of id 0
    b1 = spark.createDataFrame(
        [(i, onehot(i)) for i in range(4)] + [(4, onehot(0, eps_at=7))], schema
    )

    def boom(*a, **k):
        raise RuntimeError("crash before index build")

    real_write = S.ivf_index_write
    monkeypatch.setattr(S, "ivf_index_write", boom)
    with pytest.raises(RuntimeError, match="crash before index build"):
        land(b1, 0)
    # corpus landed, no index yet (centroids is the commit marker)
    assert not D._index_exists(spark, index, marker="centroids")
    monkeypatch.setattr(S, "ivf_index_write", real_write)
    land(b1, 0)  # replay rebuilds; duplicate corpus rows are the contract
    got = spark.read.parquet(corpus)
    assert {r["vec_id"] for r in got.select("vec_id").distinct().collect()} == {
        0, 1, 2, 3,
    }  # 4 collapsed onto 0 in-batch
    assert map_dict() == {0: 0, 4: 0}

    # batch 2: 10 = twin of landed 2 (gated via IVF probe), 11 fresh —
    # and the extend crashes AFTER the corpus append (the family's
    # crash window: replay = duplicate append, never loss)
    b2 = spark.createDataFrame(
        [(10, onehot(2, eps_at=6)), (11, onehot(5))], schema
    )
    real_extend = S.extend_ivf_index

    def boom2(*a, **k):
        raise RuntimeError("crash between corpus append and extend")

    monkeypatch.setattr(S, "extend_ivf_index", boom2)
    with pytest.raises(RuntimeError, match="crash between"):
        land(b2, 1)
    got = spark.read.parquet(corpus)
    assert got.where("vec_id = 11").count() == 1  # landed before the crash
    assign = spark.read.parquet(f"{index}/assignments")
    assert assign.where("id = 11").count() == 0  # not yet admitted

    monkeypatch.setattr(S, "extend_ivf_index", real_extend)
    land(b2, 1)  # at-least-once replay
    got = spark.read.parquet(corpus)
    ids = {r["vec_id"] for r in got.select("vec_id").distinct().collect()}
    assert ids == {0, 1, 2, 3, 11}  # 10 gated; 11 recovered, duplicated
    assert got.where("vec_id = 11").count() == 2
    assign = spark.read.parquet(f"{index}/assignments")
    assert assign.where("id = 11").count() == 1
    assert map_dict() == {0: 0, 4: 0, 2: 2, 10: 2}

    land(b2, 1)  # full-success replay: self-hit gate makes it a no-op
    assert spark.read.parquet(corpus).where("vec_id = 11").count() == 2
    assert map_dict() == {0: 0, 4: 0, 2: 2, 10: 2}


def test_embedding_ingest_refuses_uncentroidable_first_batch_before_append(
    spark, tmp_path
):
    """The no-centroid refusal is DETERMINISTIC, so it must fire BEFORE
    the corpus append: raising after a side-effecting write would turn
    every foreachBatch retry into another duplicate append, forever."""
    import os

    import pytest

    from yodel_etl_spark.scale import dedup as D

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "ivf")
    land = D.embedding_dedup_ingest(index, corpus, centroid_every=50)
    b = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in (1, 2, 3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="no centroid selectable"):
        land(b, 0)
    # nothing landed anywhere: the batch is rejectable forever, so the
    # corpus must be untouched on every attempt
    assert not os.path.exists(corpus)
    assert not os.path.exists(index)


def test_embedding_ingest_empty_first_batch_is_noop(spark, tmp_path):
    """An empty trigger before any index exists must be a benign no-op
    (the near/sketch gate behavior), not a deterministic 'no centroid'
    refusal that kills the stream forever."""
    import os

    from yodel_etl_spark.scale import dedup as D

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "ivf")
    land = D.embedding_dedup_ingest(index, corpus, centroid_every=2)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    land(empty, 0)  # must not raise
    assert not os.path.exists(corpus) and not os.path.exists(index)
    land(
        spark.createDataFrame(
            [(2, [1.0, 0.0])], "vec_id long, embedding array<double>"
        ),
        1,
    )
    assert spark.read.parquet(corpus).count() == 1


def test_embedding_ingest_max_fatness_refuses_before_corpus_append(
    spark, tmp_path
):
    """The r12 staleness guard in the gate: a batch whose admission
    would cross max_fatness raises StaleIVFIndexError BEFORE the corpus
    append (corpus/index byte-identical after the refusal — a post-
    append refusal would replay into a duplicate loop); after the
    operator runs rebuild_ivf_index from the corpus, the SAME batch
    lands on retry."""
    import pytest

    from yodel_etl_spark.scale import dedup as D
    from yodel_etl_spark.scale.similarity import (
        StaleIVFIndexError,
        ivf_index_stats,
        rebuild_ivf_index,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "ivf")
    land = D.embedding_dedup_ingest(
        index, corpus, centroid_every=1, max_fatness=2.5
    )

    def onehot(dim, n=16):
        v = [0.0] * n
        v[dim] = 1.0
        return v

    schema = "vec_id long, embedding array<double>"
    b1 = spark.createDataFrame([(i, onehot(i)) for i in range(4)], schema)
    land(b1, 0)  # first batch builds: fatness 1.0
    b2 = spark.createDataFrame([(i, onehot(i)) for i in range(4, 8)], schema)
    land(b2, 1)  # projected 2.0 <= 2.5: admitted
    n_corpus = spark.read.parquet(corpus).count()
    n_index = spark.read.parquet(f"{index}/assignments").count()
    assert n_corpus == n_index == 8

    b3 = spark.createDataFrame([(i, onehot(i)) for i in range(8, 12)], schema)
    with pytest.raises(StaleIVFIndexError, match="rebuild_ivf_index"):
        land(b3, 2)  # projected 3.0 > 2.5
    assert spark.read.parquet(corpus).count() == n_corpus  # pre-append
    assert spark.read.parquet(f"{index}/assignments").count() == n_index

    rebuild_ivf_index(
        spark, index, spark.read.parquet(corpus), "vec_id", "embedding"
    )
    assert ivf_index_stats(spark, index)["fatness"] == pytest.approx(1.0)
    land(b3, 2)  # retry of the refused batch now admits
    assert spark.read.parquet(corpus).count() == n_corpus + 4
    assert spark.read.parquet(f"{index}/assignments").count() == n_index + 4


def test_embedding_ingest_guard_rereads_after_live_operator_rebuild(
    spark, tmp_path
):
    """r14 fat_cache staleness bound (ADVICE r13): rebuild_ivf_index is
    a public API an operator can run while the guarded stream is LIVE
    — not only after the guard's own refusal.  The rebuild republishes
    params.json, so its mtime is the change signal: the next guarded
    batch must re-read stats instead of projecting against the
    pre-rebuild denominators.  Without the probe the guard here would
    keep refusing forever (stale projection 3.0 > 2.5) after the
    rebuild already fixed the index (true projection 1.5)."""
    from yodel_etl_spark.scale import dedup as D
    from yodel_etl_spark.scale.similarity import (
        ivf_index_stats,
        rebuild_ivf_index,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "ivf")
    land = D.embedding_dedup_ingest(
        index, corpus, centroid_every=1, max_fatness=2.5
    )

    def onehot(dim, n=16):
        v = [0.0] * n
        v[dim] = 1.0
        return v

    schema = "vec_id long, embedding array<double>"
    land(spark.createDataFrame([(i, onehot(i)) for i in range(4)], schema), 0)
    land(
        spark.createDataFrame([(i, onehot(i)) for i in range(4, 8)], schema), 1
    )  # guard caches: n_vectors=8, n_cells=4, built_mean=1.0

    # operator rebuild while the stream is live (no refusal happened,
    # so the guard's own cache-drop never fired)
    rebuild_ivf_index(
        spark, index, spark.read.parquet(corpus), "vec_id", "embedding"
    )
    assert ivf_index_stats(spark, index)["n_cells"] == 8

    # stale denominators would project (8+4)/4 = 3.0 > 2.5 and refuse;
    # the mtime probe re-reads -> (8+4)/8 = 1.5, the batch admits
    land(
        spark.createDataFrame([(i, onehot(i)) for i in range(8, 12)], schema),
        2,
    )
    assert spark.read.parquet(corpus).count() == 12
    assert spark.read.parquet(f"{index}/assignments").count() == 12
