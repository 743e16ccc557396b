"""Event-time windowed analytics over the ``events`` feed.

Batch/streaming-unified: each function takes any DataFrame (static or
``readStream``) with an event-time column and returns the transformed
frame.  In streaming mode add ``with_watermark`` first; state cleanup
then follows the watermark.  In batch mode the exact same plan runs —
``window``/``session_window`` are ordinary Catalyst expressions.

Scale notes:
  * tumbling/sliding aggs are partial-aggregable → map-side combine,
    one shuffle on (window, keys);
  * session windows shuffle on the user key once; Spark merges
    overlapping sessions in state (streaming) or via sort within
    partition (batch);
  * last-value-wins is ``max_by`` — no window function, no second
    shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound for streaming state cleanup (no-op semantics in
    batch; the reference has no late-data policy — SURVEY §2.9)."""
    return df.withWatermark(ts_col, delay)


def tumbling_counts(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    extra_keys: tuple[str, ...] = ("event_type",),
    value_cents: Column | None = None,
) -> DataFrame:
    """Tumbling event-time window → count + exact-cents value sum."""
    w = F.window(ts_col, duration)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_cents is not None:
        aggs.append((F.sum(value_cents) / 100.0).alias("total_value"))
    return (
        df.groupBy(w.alias("w"), *extra_keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *extra_keys,
            *[F.col(a) for a in (["n_events", "total_value"] if value_cents is not None else ["n_events"])],
        )
    )


def sliding_counts(
    df: DataFrame, duration: str = "1 hour", slide: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Sliding window counts (each event lands in duration/slide windows)."""
    w = F.window(ts_col, duration, slide)
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows(
    df: DataFrame, gap: str = "30 minutes", user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-user session windows with inactivity ``gap``
    (the sessionization analogue of the reference's per-question session
    isolation, test_chat_assistant.py:4-5).  Emits one row per session:
    first/last event time + count."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(sw.alias("sw"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(user_col, "first_ts", "last_ts", "n_events")
    )


def enrich_with_dim(
    df: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream–static enrichment join: attach dimension attributes to an
    event feed.  The dim side is broadcast (static snapshot shipped to
    every task) so the stream never shuffles — the only viable shape for
    a 100 TB/day feed joining a bounded dimension; Spark re-plans the
    static side per micro-batch, picking up dim updates.

    Works identically in batch (the oracle-checked form) and on a
    ``readStream`` frame (asserted in tests/test_streaming.py)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return df.join(d, on, how)


def dedup_events(
    df: DataFrame, keys: list[str], ts_col: str = "ts", within: str | None = None
) -> DataFrame:
    """Exactly-once-per-key event dedup (at-least-once feeds re-deliver).

    Streaming (``within`` set): watermark + ``dropDuplicatesWithinWatermark``
    — state holds one entry per key only until the watermark passes, so
    state size is bounded by keys-per-window, not keys-ever (the
    unbounded-state trap of plain ``dropDuplicates`` on a stream).
    Batch (``within`` None): plain ``dropDuplicates`` over the keys."""
    if within is not None:
        return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def last_value_wins(df: DataFrame, key_col: str, order_cols: list[str], value_cols: list[str]) -> DataFrame:
    """A5: final observed value per key (SSE overwrite semantics,
    test_chat_assistant.py:59-69) — ``max_by`` over the order key;
    in streaming use output mode ``update``/``complete``."""
    key = F.struct(*[F.col(c) for c in order_cols])
    return df.groupBy(key_col).agg(
        *[F.max_by(v, key).alias(f"last_{v}") for v in value_cols]
    )


def stateful_last_event(
    df: DataFrame,
    key_col: str = "session_id",
    seq_col: str = "seq",
    value_col: str = "answer",
) -> DataFrame:
    """A5 as a *custom stateful* streaming operator
    (``applyInPandasWithState``): per key, keep the highest-seq non-null
    value across micro-batches and emit the running winner in update
    mode.

    ``last_value_wins`` (max_by agg) covers the same semantics for
    windowed/complete output; this operator is the
    ``flatMapGroupsWithState`` shape SURVEY §2.1-S5 reserves for
    update-mode semantics the built-in aggregate cannot express (e.g.
    emitting only keys that changed this batch, custom timeouts).
    State is (seq, value) per key — constant size, so 100 TB of events
    needs state ∝ distinct keys only."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(value_col, T.StringType()),
            T.StructField(seq_col, T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("seq", T.LongType()), T.StructField("value", T.StringType())]
    )

    def update(key, pdfs, state):
        import pandas as pd

        best_seq, best_val = state.get if state.exists else (-1, None)
        for pdf in pdfs:
            for s, v in zip(pdf[seq_col], pdf[value_col]):
                if v is not None and int(s) >= best_seq:
                    best_seq, best_val = int(s), str(v)
        state.update((best_seq, best_val))
        yield pd.DataFrame({key_col: [key[0]], value_col: [best_val], seq_col: [best_seq]})

    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(seq_col).cast("long").alias(seq_col),
            F.col(value_col).cast("string").alias(value_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(update, out_schema, state_schema, "update", "NoTimeout")
    )


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream–stream inner join with a time-interval condition: each
    left event pairs with the same key's right events in
    ``(left.ts - lookback, left.ts]`` — the click-to-impression /
    action-to-trigger correlation shape.

    Both sides carry a watermark and the join condition bounds
    ``right.ts`` relative to ``left.ts`` from BOTH directions, which is
    exactly what Structured Streaming needs to compute how long each
    side's state must be retained (watermark + interval ⇒ eviction
    horizon; an unbounded condition would grow state forever).  At
    100 TB/day the state store holds only ``lookback + watermark`` of
    per-key events — independent of stream length.

    Works identically in batch (the oracle-checkable form: a plain
    self-join with the same predicate — asserted streaming ≡ batch in
    tests/test_streaming.py).  Output: left (event_id, ts) + right
    (event_id, ts) pairs per key, strictly-earlier right events only,
    self-pairs excluded.

    ``how="left_outer"`` is the audit variant — "which actions had NO
    prior trigger": matched rows stream out immediately, and an
    UNMATCHED left row emits null-padded once the watermark passes its
    eviction horizon (the engine can only then prove no match can
    still arrive — so outer results trail the watermark by
    construction, and a final batch's unmatched rows need a later
    batch to push the watermark past them).  Same bounded state as the
    inner form.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    l = left.select(
        F.col(key_col).alias("k"),
        F.col("event_id").alias("l_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.select(
        F.col(key_col).alias("rk"),
        F.col("event_id").alias("r_id"),
        F.col(ts_col).alias("r_ts"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (l["k"] == r["rk"])
        & (r["r_ts"] >= l["l_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (r["r_ts"] < l["l_ts"])
    )
    return (
        l.join(r, cond, how)
        .select("k", "l_id", "l_ts", "r_id", "r_ts")
        .withColumnRenamed("k", key_col)
    )


def stateful_scd2(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Incremental SCD2: maintain each key's type-2 history over a
    stream, emitting an interval the moment it CLOSES (append mode);
    the open run lives in the state store, one constant-size row per
    key — 100 TB of history costs state ∝ distinct keys.

    The streaming twin of ``ops/scd.scd2_history``: on a time-ordered
    feed the emitted closed intervals equal the batch history's
    non-current rows exactly (asserted across a multi-batch drain in
    tests/test_streaming.py).  Precondition: per key, batches arrive in
    event-time order (the change-log/CDC shape); an out-of-order feed
    needs watermark buffering in front (``with_watermark`` +
    sort-within-batch covers intra-batch disorder, which this operator
    handles by sorting each batch on (ts, tiebreak)).
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(attr_col, T.StringType()),
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("attr", T.StringType()),
            T.StructField("valid_from", T.TimestampType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        cur_attr, cur_from = state.get if state.exists else (None, None)
        have_run = state.exists
        closed_attr, closed_from, closed_to = [], [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, tiebreak_col], kind="mergesort")
        for ts, attr in zip(batch[ts_col], batch[attr_col]):
            a = None if attr is None or (isinstance(attr, float) and pd.isna(attr)) else str(attr)
            if not have_run:
                cur_attr, cur_from, have_run = a, ts, True
            elif a != cur_attr:
                closed_attr.append(cur_attr)
                closed_from.append(cur_from)
                closed_to.append(ts)
                cur_attr, cur_from = a, ts
        state.update((cur_attr, cur_from))
        if closed_attr:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed_attr),
                    attr_col: closed_attr,
                    "valid_from": closed_from,
                    "valid_to": closed_to,
                }
            )

    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ts_col),
            F.col(attr_col).cast("string").alias(attr_col),
            F.col(tiebreak_col).cast("long").alias(tiebreak_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(update, out_schema, state_schema, "append", "NoTimeout")
    )


def sse_answer_stream(spark, url: str, stream_id: str | None = None) -> DataFrame:
    """Live SSE endpoint → streaming last-value-wins answers: the
    ``sse_stream`` source (io/sse.py — driver-side micro-batch polls
    with ``Last-Event-ID`` resume) feeding ``parse_events`` →
    ``final_answers`` unchanged — the same column expressions the batch
    transcript path runs (SURVEY §2 S5/A5), now over a socket.  Use
    ``outputMode('complete'|'update')``: last-wins is a streaming agg."""
    from yodel_etl_spark.io.sse import (
        final_answers,
        parse_events,
        register_sse_stream_source,
    )

    register_sse_stream_source(spark)
    reader = spark.readStream.format("sse_stream").option("url", url)
    if stream_id is not None:
        reader = reader.option("streamid", stream_id)
    lines = reader.load()
    return final_answers(parse_events(lines), ["stream_id"], "seq")


def replay_file_stream(
    spark,
    sf_dir: str,
    table: str = "events",
    ts_col: str = "ts",
) -> DataFrame:
    """The canonical parquet table as a bounded FILE-SOURCE STREAM — the
    backfill/replay pattern: ``readStream`` over the scale-factor
    directory (pathGlobFilter pins the one table; the file source
    requires a directory) with the same ts normalization
    ``session.load_tables`` applies to the batch read (TIMESTAMP(NANOS)
    → long → timestamp_micros, or NTZ → instant).  Run with
    ``trigger(availableNow=True)`` to drain it as a finite stream
    through the real streaming machinery (FileStreamSource, offset log,
    state store)."""
    schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{table}.parquet")
        .parquet(sf_dir)
    )
    for field in stream.schema.fields:
        if field.name == ts_col and field.dataType.typeName() in ("long", "bigint"):
            stream = stream.withColumn(
                ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
            )
        elif field.name == ts_col and field.dataType.typeName() == "timestamp_ntz":
            stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def run_replay_to_table(result: DataFrame, name: str, timeout_sec: int = 600) -> DataFrame:
    """Drain a bounded streaming frame into a memory-sink table and
    return the result as a batch DataFrame.

    ``complete`` output mode is correct BECAUSE the replay is bounded —
    the final microbatch state equals the batch answer, which is what
    the equivalence tests pin.  An unbounded production stream would use
    update/append + watermark instead (state cleanup; see the suite's
    watermark/append coverage).  The memory sink keeps only the result
    grain (sessions), never the input, so driver memory scales with the
    aggregate, not the corpus."""
    import tempfile
    import shutil
    import uuid

    spark = result.sparkSession
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    # checkpoint is transient by construction (availableNow drain into a
    # memory sink) — remove it after termination or every bench build
    # leaks an offsets/state directory in /tmp (6+ per full bench run)
    ckpt = tempfile.mkdtemp(prefix=f"{name}_ckpt_")
    try:
        q = (
            result.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(f"replay {qname} did not drain in {timeout_sec}s")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    out = spark.table(qname)
    # the plan captured the memory sink's rows at analysis; dropping the
    # temp view just keeps the catalog from accumulating replay tables
    spark.catalog.dropTempView(qname)
    return out
