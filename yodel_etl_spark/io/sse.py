"""S5 — SSE event-stream consumption (test_chat_assistant.py:23-78;
hardened variant test_chat_assistant_with_judge.py:36-103).

The reference iterates ``data:`` lines of a streaming HTTP response:
  * non-``data:`` lines ignored
  * ``[DONE]`` / ``null`` sentinels skipped (judge variant :59-61)
  * JSON-decode failures logged and skipped (:71-73)
  * envelopes with ``code != 0`` skipped
  * ``data`` may be a bool completion marker (skipped) or a struct
    whose LAST occurrence of answer/session_id/reference wins (:59-69)

Spark-first: the transcript is a DataFrame of raw lines with a
``(stream_id, seq)`` key; every rule above is a column expression, and
"last wins" is ``ops.streaming.last_value_wins`` (batch window) or a
``groupBy(...).agg(max_by(...))`` in update-mode streaming.  The same
expressions run over a Structured Streaming source unchanged — tests
replay transcripts through the batch path (SURVEY §5.3: mocked-service
transcripts, no live endpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: SSE envelope: {code, message, data}; data is polymorphic (bool |
#: struct) so it lands as a raw JSON string and is re-parsed a stage
#: later — mirrors the reference's two-phase isinstance() checks.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("code", T.IntegerType()),
        T.StructField("message", T.StringType()),
        T.StructField("data", T.StringType()),
    ]
)

#: the payload struct carried by non-marker events
DATA_SCHEMA = T.StructType(
    [
        T.StructField("answer", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField(
            "reference",
            T.StructType(
                [
                    T.StructField("total", T.IntegerType()),
                    T.StructField(
                        "chunks",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("document_name", T.StringType()),
                                    T.StructField("content", T.StringType()),
                                    T.StructField("similarity", T.DoubleType()),
                                    T.StructField("vector_similarity", T.DoubleType()),
                                    T.StructField("term_similarity", T.DoubleType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)

_SENTINELS = ("[DONE]", "null", "true", "false")


def parse_events(lines: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Raw transcript lines → valid event payload rows.

    Keeps the original columns (stream keys, seq) and adds the parsed
    ``answer`` / ``session_id`` / ``reference``.  Implements every skip
    rule; a JSON-decode failure is a NULL ``env`` (PERMISSIVE
    ``from_json``), filtered exactly like the reference's except-pass.
    """
    trimmed = F.trim(F.col(raw_col))
    payload = F.when(trimmed.startswith("data:"), F.trim(F.substring(trimmed, 6, 1 << 30)))
    df = (
        lines.withColumn("_payload", payload)
        .where(F.col("_payload").isNotNull())
        .where(~F.col("_payload").isin(*_SENTINELS))
        .withColumn("env", F.from_json("_payload", ENVELOPE_SCHEMA))
        .where(F.col("env").isNotNull() & (F.coalesce(F.col("env.code"), F.lit(0)) == 0))
        .withColumn("data", F.from_json("env.data", DATA_SCHEMA))
        # bool markers parse to NULL under the struct schema → skipped
        .where(F.col("data").isNotNull())
    )
    return df.select(
        *[c for c in lines.columns if c != raw_col],
        F.col("data.answer").alias("answer"),
        F.col("data.session_id").alias("session_id"),
        F.col("data.reference").alias("reference"),
    )


def final_answers(
    events: DataFrame, key_cols: list[str], seq_col: str
) -> DataFrame:
    """Last-value-wins per stream (A5): the final non-null answer,
    session_id and reference seen in transcript order — ``max_by`` keyed
    on the sequence of the last non-null occurrence per field, so a
    trailing marker row can't null out an earlier answer."""
    aggs = [
        F.max_by(c, F.when(F.col(c).isNotNull(), F.col(seq_col))).alias(c)
        for c in ("answer", "session_id", "reference")
    ]
    return events.groupBy(*key_cols).agg(*aggs)


# --------------------------------------------------------------------------
# Live SSE Structured Streaming source (Spark 4 Python Data Source)
# --------------------------------------------------------------------------
try:  # pragma: no cover - import guard mirrors io/rest.py
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class SseSimpleStreamReader(SimpleDataSourceStreamReader):
        """Micro-batch poller over a live SSE HTTP endpoint.

        Offset = count of non-blank lines consumed; every poll issues a
        fresh GET with ``Last-Event-ID: <offset>`` — SSE's own resume
        protocol (WHATWG EventSource §9.2.6) — and reads to EOF, so both
        steady-state reads and checkpoint-restart replays
        (``readBetweenOffsets``) re-fetch deterministically from the
        server's replay buffer.  The reference's chat-completion streams
        are finite per session, which is exactly this shape; an endless
        firehose endpoint would instead need a budgeted read + a
        server-side id scheme (same contract, different pacing).

        Runs on the driver by design (``SimpleDataSourceStreamReader``):
        one control-plane HTTP connection per poll, rows then distribute
        to executors — appropriate for chat-rate streams, and the
        documented Spark-4 pattern for low-throughput sources."""

        def __init__(self, options):
            self.url = options["url"]
            self.stream_id = options.get("streamid", options["url"])
            self.timeout = float(options.get("timeoutsec", 10))

        def initialOffset(self):
            return {"seq": 0}

        def _fetch(self, start_seq: int) -> list[str]:
            import urllib.request

            req = urllib.request.Request(
                self.url,
                headers={
                    "Accept": "text/event-stream",
                    "Last-Event-ID": str(start_seq),
                },
            )
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                text = resp.read().decode("utf-8", errors="replace")
            return [ln for ln in text.splitlines() if ln.strip()]

        def read(self, start):
            seq0 = int(start["seq"])
            lines = self._fetch(seq0)
            rows = [
                (self.stream_id, seq0 + i, ln) for i, ln in enumerate(lines)
            ]
            return (iter(rows), {"seq": seq0 + len(lines)})

        def readBetweenOffsets(self, start, end):
            seq0, seq1 = int(start["seq"]), int(end["seq"])
            lines = self._fetch(seq0)[: seq1 - seq0]
            return iter([(self.stream_id, seq0 + i, ln) for i, ln in enumerate(lines)])

    class SseStreamDataSource(DataSource):
        """``spark.readStream.format("sse_stream").option("url", ...)
        .load()`` → ``(stream_id, seq, raw)`` lines, the exact input
        shape of :func:`parse_events`."""

        @classmethod
        def name(cls):
            return "sse_stream"

        def schema(self):
            return "stream_id string, seq long, raw string"

        def simpleStreamReader(self, schema):
            return SseSimpleStreamReader(self.options)

    def register_sse_stream_source(spark) -> None:
        """Idempotently register the ``sse_stream`` format."""
        try:
            spark.dataSource.register(SseStreamDataSource)
        except Exception as exc:  # noqa: BLE001 - already-registered race
            if "already" not in str(exc).lower():
                raise

except ImportError:  # pragma: no cover
    SseStreamDataSource = None  # type: ignore[assignment]

    def register_sse_stream_source(spark) -> None:
        raise NotImplementedError("Python Data Source API requires Spark 4+")
