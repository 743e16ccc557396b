"""U1/U2 — row-wise external LLM inference as a distributed operator.

Reference shape (convert_json_to_text.py:120-147 Gemini;
test_chat_assistant_with_judge.py:255-289 judge): per record render a
prompt, call the API, rate-limit with a fixed sleep, and NEVER throw —
errors become empty output + a logged message, the pipeline continues.

Spark-first contract:
  * ``mapInPandas`` (Arrow batches) with one client per partition —
    no per-row Python dispatch beyond the batch loop, no driver loop.
  * Every call returns ``(output, status, error)`` columns — the
    fail-soft convention (SURVEY §4): exceptions never cross the UDF
    boundary, retryable rows are selectable with ``status != 200``.
  * Rate limiting is a per-partition token bucket; cluster-wide pacing
    = ``partitions × rate_per_sec``, and the partition count is capped
    by ``spark.yodel.llm.maxConcurrency`` — the declarative analogue of
    the reference's global ``time.sleep`` (which cannot exist on a
    cluster).
  * Catalyst cannot push projections/filters through an opaque Python
    map, so ``infer_map`` is applied AFTER all prunable column work —
    the builder orders it explicitly (SURVEY §4 custom work #2).

Clients are plain picklable callables ``(prompt:str) -> str`` raising
on failure; tests inject :func:`mock_client`, production wraps the real
HTTP SDK with timeouts.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Client = Callable[[str], str]

#: appended result struct
RESULT_FIELDS = [
    T.StructField("output", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("error", T.StringType()),
]


def infer_map(
    df: DataFrame,
    client: Client,
    prompt_col: str = "prompt",
    rate_per_sec: float | None = None,
    max_concurrency: int | None = None,
) -> DataFrame:
    """Map ``client`` over ``prompt_col`` with fail-soft result columns.

    ``max_concurrency`` caps the number of concurrently-calling
    partitions (default: ``spark.yodel.llm.maxConcurrency`` conf, else
    current partitioning)."""
    from yodel_etl_spark.session import ship_package

    spark = df.sparkSession
    ship_package(spark)  # clients may be package functions (by-ref pickle)
    if max_concurrency is None:
        conf = spark.conf.get("spark.yodel.llm.maxConcurrency", None)
        max_concurrency = int(conf) if conf else None
    if max_concurrency:
        df = df.repartition(max_concurrency)

    out_schema = T.StructType(list(df.schema.fields) + RESULT_FIELDS)
    min_interval = 1.0 / rate_per_sec if rate_per_sec else 0.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last = 0.0
        for pdf in batches:
            outputs: list[str | None] = []
            statuses: list[int] = []
            errors: list[str | None] = []
            for prompt in pdf[prompt_col]:
                if min_interval:
                    now = time.monotonic()
                    if now - last < min_interval:
                        time.sleep(min_interval - (now - last))
                    last = time.monotonic()
                try:
                    outputs.append(client(str(prompt)))
                    statuses.append(200)
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001 - fail-soft by contract
                    outputs.append(None)
                    st = getattr(exc, "status", 500)
                    if not isinstance(st, int) or 200 <= st < 300:
                        # a failed row must never carry a success code
                        # (the `status != 200` retry filter would skip
                        # it), and a non-int status must not TypeError
                        # across the UDF boundary
                        st = 500
                    statuses.append(st)
                    errors.append(f"{type(exc).__name__}: {exc}")
            pdf = pdf.copy()
            pdf["output"], pdf["status"], pdf["error"] = outputs, statuses, errors
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def prompt_template(template: str, *cols: str) -> F.Column:
    """P11 — fill ``{}`` slots with columns (format_string stays
    JVM-side; the reference's ``str.format`` analogue)."""
    return F.format_string(template.replace("{}", "%s"), *[F.col(c) for c in cols])


# ----------------------------------------------------------------- mocks
def mock_client(prompt: str) -> str:
    """Deterministic stand-in for a text-generation API: echoes a
    digest-stamped summary (tests pin exact outputs)."""
    digest = hashlib.md5(prompt.encode()).hexdigest()[:8]
    return f"SUMMARY[{digest}]: {prompt[:40]}"


class FlakyClient:
    """Mock that fails every ``n``-th call — exercises the fail-soft
    columns.  Per-partition instance state is intentional: failures are
    deterministic within a partition, like a rate-limited endpoint."""

    def __init__(self, every: int = 3):
        self.every = every
        self.n = 0

    def __call__(self, prompt: str) -> str:
        self.n += 1
        if self.n % self.every == 0:
            raise RuntimeError("simulated upstream 429")
        return mock_client(prompt)


def mock_chat_client(prompt: str) -> str:
    """Deterministic chat-completion mock: the folded SSE payload
    (io.sse.DATA_SCHEMA shape) the production ChatAskClient returns —
    answer, session_id and a two-chunk retrieval reference keyed off a
    stable prompt digest."""
    import json as _json

    h = hashlib.md5(prompt.encode()).hexdigest()
    return _json.dumps(
        {
            "answer": f"Answer[{h[:8]}] to: {prompt[:40]}",
            "session_id": f"sess-{h[:6]}",
            "reference": {
                "total": 2,
                "chunks": [
                    {
                        "id": f"c{h[:4]}",
                        "document_name": "doc_a.md",
                        "content": "chunk one",
                        "similarity": round((int(h[:4], 16) % 100) / 100.0, 2),
                        "vector_similarity": 0.8,
                        "term_similarity": 0.7,
                    },
                    {
                        "id": f"c{h[4:8]}",
                        "document_name": "doc_b.md",
                        "content": "chunk two",
                        "similarity": round((int(h[4:8], 16) % 100) / 100.0, 2),
                        "vector_similarity": 0.5,
                        "term_similarity": 0.4,
                    },
                ],
            },
        }
    )


def mock_judge_client(prompt: str) -> str:
    """Deterministic judge mock emitting the reference's verdict JSON
    (test_chat_assistant_with_judge.py:224-227 schema), with the answer
    quality keyed off a stable prompt digest so color distribution is
    reproducible."""
    h = int(hashlib.md5(prompt.encode()).hexdigest(), 16)
    direct = bool(h & 1)
    supported = bool(h & 2)
    wrong = not direct and bool(h & 4)
    partial = not direct and not wrong
    return (
        '{"labels": {"answer_present": true, "answer_direct": %s, '
        '"retrieval_supports_answer": %s, "answer_wrong": %s, "answer_partial": %s}, '
        '"scores": {"correctness": %.2f, "groundedness": %.2f, "completeness": %.2f}, '
        '"notes": "mock"}'
        % (
            str(direct).lower(),
            str(supported).lower(),
            str(wrong).lower(),
            str(partial).lower(),
            (h % 101) / 100.0,
            ((h >> 8) % 101) / 100.0,
            ((h >> 16) % 101) / 100.0,
        )
    )
