"""Production HTTP client tests (llm/clients.py) against a local
httpserver — timeout, retry-on-429, non-2xx fail-soft, env-key config,
and the infer_map / fetch_paginated integration points."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row

from yodel_etl_spark.io.rest import fetch_paginated
from yodel_etl_spark.llm.clients import (
    AnthropicJudgeClient,
    BearerFanoutClient,
    BearerPageClient,
    GeminiGenerateClient,
    HttpStatusError,
    RetryPolicy,
    SseChatClient,
)
from yodel_etl_spark.llm.infer import infer_map

FAST_RETRY = RetryPolicy(max_attempts=3, backoff_base=0.01, backoff_cap=0.02)

ANTHROPIC_BODY = json.dumps(
    {
        "content": [{"type": "text", "text": '{"labels": {"answer_present": true}}'}],
        "model": "claude-sonnet-4-5",
    }
)

SSE_BODY = (
    b": keepalive\n"
    b"data: {\"code\": 0, \"data\": {\"answer\": \"partial\", \"session_id\": \"s9\"}}\n"
    b"data: not-json at all\n"
    b"data: {\"code\": 1, \"data\": {\"answer\": \"SKIP-nonzero-code\"}}\n"
    b"data: {\"code\": 0, \"data\": {\"answer\": \"final answer\", \"session_id\": \"s9\", "
    b"\"reference\": {\"total\": 1, \"chunks\": [{\"id\": \"c1\"}]}}}\n"
    b"data: {\"code\": 0, \"data\": true}\n"
    b"data: [DONE]\n"
)


class _Handler(BaseHTTPRequestHandler):
    server_version = "test"
    flaky_counts: dict[str, int] = {}

    def log_message(self, *a):  # noqa: D102 - silence
        pass

    def _send(self, status: int, body: bytes, headers: dict | None = None):
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802
        if self.path == "/v1/messages":
            self._send(200, ANTHROPIC_BODY.encode())
        elif self.path == "/flaky/v1/messages":
            n = self.flaky_counts["flaky"] = self.flaky_counts.get("flaky", 0) + 1
            if n % 2 == 1:
                self._send(429, b"rate limited", {"Retry-After": "0.01"})
            else:
                self._send(200, ANTHROPIC_BODY.encode())
        elif self.path == "/broken/v1/messages":
            self._send(503, b"upstream down")
        elif self.path.endswith("/completions"):
            self._send(200, SSE_BODY, {"Content-Type": "text/event-stream"})
        elif self.path == "/gemini":
            body = json.dumps(
                {"candidates": [{"content": {"parts": [{"text": "gen-"}, {"text": "ok"}]}}]}
            )
            self._send(200, body.encode())
        elif self.path == "/gemini-blocked":
            # 200 with empty candidates = safety block shape
            body = json.dumps({"promptFeedback": {"blockReason": "SAFETY"}})
            self._send(200, body.encode())
        elif self.path == "/embed":
            # OpenAI-compatible envelope, served out of order to prove
            # the index re-sort; vector = [len(text), position]
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            data = [
                {"index": i, "embedding": [float(len(t)), float(i)]}
                for i, t in enumerate(req["input"])
            ]
            body = json.dumps({"data": list(reversed(data)), "model": req.get("model")})
            self._send(200, body.encode())
        elif self.path == "/embed-bare":
            # bare {"embeddings": [[...]]} envelope (TEI-style)
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            body = json.dumps(
                {"embeddings": [[float(len(t)), 1.0] for t in req["input"]]}
            )
            self._send(200, body.encode())
        elif self.path == "/embed-short":
            # 200 with a MISSING vector — must fail, never misalign
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            body = json.dumps(
                {"embeddings": [[1.0, 1.0] for _ in req["input"][1:]]}
            )
            self._send(200, body.encode())
        elif self.path == "/embed-broken":
            self._send(503, b"model loading")
        else:
            self._send(404, b"nope")

    def do_GET(self):  # noqa: N802
        if self.headers.get("Authorization") != "Bearer tok":
            self._send(401, b"bad token")
            return
        path, _, query = self.path.partition("?")
        params = dict(kv.split("=") for kv in query.split("&") if "=" in kv)
        page = int(params.get("page", "1"))
        if path == "/api/v1/chats":
            data = [] if page > 2 else [{"id": f"chat{page}", "name": f"Chat {page}"}]
            self._send(200, json.dumps({"code": 0, "data": data}).encode())
        elif path.startswith("/api/v1/chats/") and path.endswith("/sessions"):
            parent = path.split("/")[4]
            data = [] if page > 1 else [{"id": f"{parent}-s1", "name": "sess"}]
            self._send(200, json.dumps({"code": 0, "data": data}).encode())
        else:
            self._send(404, b"nope")


@pytest.fixture(scope="module")
def server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_anthropic_client_returns_raw_body(server):
    client = AnthropicJudgeClient(
        api_key="k", endpoint=f"{server}/v1/messages", retry=FAST_RETRY
    )
    raw = client("judge this")
    # reference parity: raw body text, parse chain handles extraction
    assert json.loads(raw)["content"][0]["text"].startswith('{"labels"')


def test_retry_on_429_then_success(server):
    _Handler.flaky_counts.clear()
    client = AnthropicJudgeClient(
        api_key="k", endpoint=f"{server}/flaky/v1/messages", retry=FAST_RETRY
    )
    assert "content" in client("p")  # first 429 absorbed by retry
    assert _Handler.flaky_counts["flaky"] == 2


def test_persistent_5xx_raises_with_status(server):
    client = AnthropicJudgeClient(
        api_key="k", endpoint=f"{server}/broken/v1/messages", retry=FAST_RETRY
    )
    with pytest.raises(HttpStatusError) as ei:
        client("p")
    assert ei.value.status == 503


def test_missing_env_key_raises(monkeypatch):
    monkeypatch.delenv("ANTHROPIC_API_KEY", raising=False)
    client = AnthropicJudgeClient(endpoint="http://127.0.0.1:1/v1/messages")
    with pytest.raises(ValueError, match="ANTHROPIC_API_KEY"):
        client("p")


def test_gemini_client_joins_parts(server):
    client = GeminiGenerateClient(
        api_key="k", endpoint=f"{server}/gemini", retry=FAST_RETRY
    )
    assert client("hello") == "gen-ok"


def test_gemini_empty_candidates_is_failure(server):
    """A 200 with no candidates/parts (safety block) must raise so it
    lands in the fail-soft error column, never an empty output file."""
    client = GeminiGenerateClient(
        api_key="k", endpoint=f"{server}/gemini-blocked", retry=FAST_RETRY
    )
    with pytest.raises(HttpStatusError, match="SAFETY"):
        client("hello")


def test_infer_map_with_http_client_failsoft(spark, server):
    """U2 through the real mapInPandas path: per-partition HTTP client,
    one endpoint healthy, one row pointed at a broken endpoint via a
    per-row wrapper — statuses land as columns, no task failure."""
    good = AnthropicJudgeClient(
        api_key="k", endpoint=f"{server}/v1/messages", retry=FAST_RETRY
    )
    bad = AnthropicJudgeClient(
        api_key="k", endpoint=f"{server}/broken/v1/messages", retry=FAST_RETRY
    )

    def routed(prompt: str) -> str:
        return (bad if prompt.startswith("BAD") else good)(prompt)

    df = spark.createDataFrame(
        [Row(prompt="judge A"), Row(prompt="BAD judge B"), Row(prompt="judge C")]
    )
    rows = {r["prompt"]: r for r in infer_map(df, routed).collect()}
    assert rows["judge A"]["status"] == 200
    assert json.loads(rows["judge A"]["output"])["content"]
    assert rows["BAD judge B"]["status"] == 503
    assert rows["BAD judge B"]["output"] is None
    assert "503" in rows["BAD judge B"]["error"]
    assert rows["judge C"]["status"] == 200


def test_bearer_page_client_with_fetch_paginated(spark, server):
    fetcher = BearerPageClient(server, token="tok", retry=FAST_RETRY)
    df = fetch_paginated(spark, fetcher, max_pages=4)
    rows = df.where("record IS NOT NULL").collect()
    assert {json.loads(r["record"])["id"] for r in rows} == {"chat1", "chat2"}
    assert df.where("error IS NOT NULL").count() == 0


def test_bearer_client_bad_token_error_row(spark, server):
    fetcher = BearerPageClient(server, token="WRONG", retry=FAST_RETRY)
    df = fetch_paginated(spark, fetcher, max_pages=2)
    rows = df.collect()
    # 401 is not retryable: one error marker row per page, no records
    assert all(r["record"] is None and "401" in r["error"] for r in rows)
    assert len(rows) == 2


def test_bearer_fanout_client(server):
    fetcher = BearerFanoutClient(server, token="tok", retry=FAST_RETRY)
    recs = fetcher("chat1", 1)
    assert recs == [{"id": "chat1-s1", "name": "sess"}]
    assert fetcher("chat1", 2) == []


def test_sse_chat_client_last_value_wins(server):
    client = SseChatClient(server, "chatX", token="tok", retry=FAST_RETRY)
    res = client.ask("what?", None)
    assert res.status == 200
    assert res.answer == "final answer"  # overwrite semantics (A5)
    assert res.session_id == "s9"
    assert json.loads(res.reference_json)["chunks"][0]["id"] == "c1"
    created = client.create_session()
    assert created.session_id == "s9" and created.status == 200


def test_sse_chat_client_connection_error_status_zero():
    client = SseChatClient(
        "http://127.0.0.1:1", "chatX", token="tok", retry=FAST_RETRY
    )
    res = client.ask("q", None)
    assert res.status == 0 and res.answer is None  # reference :102-103


def test_clients_are_picklable():
    import pickle

    c = AnthropicJudgeClient(api_key="k")
    c._sess()  # materialize the live session, must not ride the pickle
    c2 = pickle.loads(pickle.dumps(c))
    assert c2._session is None and c2.api_key == "k"


def test_embedding_client_reorders_openai_envelope(server):
    from yodel_etl_spark.llm.clients import EmbeddingEndpointClient

    client = EmbeddingEndpointClient(f"{server}/embed", model="m", retry=FAST_RETRY)
    vecs = client(["a", "bbb", "cc"])
    # served reversed; index re-sort restores text order ([len, pos])
    assert vecs == [[1.0, 0.0], [3.0, 1.0], [2.0, 2.0]]


def test_embedding_client_bare_envelope_and_count_guard(server):
    from yodel_etl_spark.llm.clients import EmbeddingEndpointClient

    client = EmbeddingEndpointClient(f"{server}/embed-bare", retry=FAST_RETRY)
    assert client(["xy", "z"]) == [[2.0, 1.0], [1.0, 1.0]]
    short = EmbeddingEndpointClient(f"{server}/embed-short", retry=FAST_RETRY)
    with pytest.raises(HttpStatusError, match="count mismatch"):
        short(["a", "b", "c"])  # misaligned vectors must never pass


def test_encode_via_endpoint_schema_and_failsoft(spark, server):
    """The production encoder twin: vector column matches encode_text's
    (array<float> named `embedding`), a dead endpoint becomes NULL
    vectors + status/error columns for exactly its rows — the pipeline
    continues, retryable via status != 200."""
    from yodel_etl_spark.llm.clients import EmbeddingEndpointClient
    from yodel_etl_spark.scale.encode import encode_via_endpoint

    df = spark.createDataFrame(
        [(i, "tok " * (i + 1)) for i in range(6)], "doc_id long, text string"
    )
    ok = encode_via_endpoint(
        df,
        EmbeddingEndpointClient(f"{server}/embed", retry=FAST_RETRY),
        batch_size=4,
        max_concurrency=2,
    )
    assert [f.name for f in ok.schema.fields] == [
        "doc_id", "text", "embedding", "encode_status", "encode_error",
    ]
    assert dict(ok.dtypes)["embedding"] == "array<float>"
    rows = {r["doc_id"]: r for r in ok.collect()}
    assert all(r["encode_status"] == 200 for r in rows.values())
    # vector[0] = len(text) — alignment survived batching + repartition
    for i, r in rows.items():
        assert r["embedding"][0] == float(len("tok " * (i + 1)))
        assert r["encode_error"] is None

    bad = encode_via_endpoint(
        df,
        EmbeddingEndpointClient(f"{server}/embed-broken", retry=FAST_RETRY),
        batch_size=4,
    ).collect()
    assert all(r["encode_status"] == 503 for r in bad)
    assert all(r["embedding"] is None for r in bad)
    assert all("503" in r["encode_error"] for r in bad)


def test_embedding_failures_never_carry_success_status(spark, server):
    """A 200-with-bad-body (count mismatch / unknown envelope) must
    surface as a NON-2xx encode_status, or the documented
    `status != 200` retry filter would skip exactly the rows that got
    NULL vectors."""
    from yodel_etl_spark.llm.clients import EmbeddingEndpointClient
    from yodel_etl_spark.scale.encode import encode_via_endpoint

    client = EmbeddingEndpointClient(f"{server}/embed-short", retry=FAST_RETRY)
    with pytest.raises(HttpStatusError) as ei:
        client(["a", "b", "c"])
    assert ei.value.status == 502  # not the transport's 200

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, text string")
    rows = encode_via_endpoint(df, client, batch_size=8).collect()
    assert all(r["encode_status"] == 502 for r in rows)
    assert all(r["embedding"] is None for r in rows)
