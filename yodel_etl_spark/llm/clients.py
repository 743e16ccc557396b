"""Production HTTP clients for the external-call operators (U1/U2,
S3/S4, S6).

The reference ships four concrete client surfaces; each gets a
picklable, executor-side wrapper here that plugs into the engine's
existing injection points (``infer_map``'s ``Client``, ``rest.py``'s
``PageFetcher``/``FanoutFetcher``, ``qa_eval``'s chat callable):

* Gemini text generation — ``convert_json_to_text.py:67-94`` (env-key
  lookup ``GEMINI_API_KEY``/``GOOGLE_API_KEY``, model init, per-call
  error handling) → :class:`GeminiGenerateClient` (plain REST
  ``generateContent``; no vendor SDK needed).
* Anthropic Messages judge — ``test_chat_assistant_with_judge.py:
  255-289`` (``x-api-key`` header, ``max_tokens=800``,
  ``temperature=0.0``, 60 s timeout, non-2xx kept as status) →
  :class:`AnthropicJudgeClient`.  Like the reference, the RAW response
  body text is returned — the robust verdict-extraction chain
  (``ops.jsonx``) handles whole-body / ``content[0].text`` / embedded
  ``{...}`` downstream.
* RAGFlow paginated REST — ``extract_chat_qa_tsv.py:43-81`` (bearer
  token, ``page``/``page_size`` params, ``data`` envelope,
  raise_for_status) → :class:`BearerPageClient` /
  :class:`BearerFanoutClient` for ``fetch_paginated``/``fetch_fanout``.
* SSE chat completion — ``test_chat_assistant.py:81-133`` (POST
  ``stream=True``, 30/60 s timeouts, per-line ``data:`` parse,
  last-value-wins, status kept as a column) → :class:`SseChatClient`.

Design rules (all enforced here, not left to callers):

* **Picklable**: clients hold only plain config; the
  ``requests.Session`` is created lazily per worker process and
  excluded from pickling, so one connection pool serves a whole
  executor partition.
* **Env at call time**: when no explicit key is passed, API keys
  resolve from the executor's environment on first use (names per
  ``.env.example``), so env-resolved secrets don't ride the driver
  pickle.  A key passed to a constructor IS instance state and does
  serialize to executors — pass keys explicitly only when the env
  route is unavailable.
* **Retry-on-429/5xx**: bounded exponential backoff honoring
  ``Retry-After``; the reference's fixed ``time.sleep`` pacing stays
  with the per-partition token bucket in ``infer_map``/``rest.py``.
* **Fail-soft boundary**: exhausted retries raise
  :class:`HttpStatusError` carrying ``.status`` — ``infer_map`` turns
  that into ``(output NULL, status, error)`` columns; fetchers turn it
  into an error marker row.  Nothing here ever kills a Spark task.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

__all__ = [
    "AnthropicJudgeClient",
    "BearerFanoutClient",
    "BearerPageClient",
    "EmbeddingEndpointClient",
    "GeminiGenerateClient",
    "HttpStatusError",
    "RetryPolicy",
    "SseChatClient",
]


class HttpStatusError(RuntimeError):
    """Non-2xx after retries; ``.status`` feeds infer_map's status col."""

    def __init__(self, status: int, body: str):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status
        self.body = body


@dataclass(frozen=True)
class RetryPolicy:
    """Bounded exponential backoff for 429/5xx (the reference has no
    retries — it either aborts or records the failure; at cluster scale
    transient 429s are the norm, so the wrapper absorbs them)."""

    max_attempts: int = 4
    backoff_base: float = 0.5
    backoff_cap: float = 8.0
    retry_statuses: tuple[int, ...] = (429, 500, 502, 503, 504)

    def sleep_for(self, attempt: int, retry_after: str | None) -> float:
        if retry_after:
            try:
                return min(float(retry_after), self.backoff_cap)
            except ValueError:
                pass
        return min(self.backoff_base * (2**attempt), self.backoff_cap)


class _HttpClientBase:
    """Lazy per-process requests.Session + retrying request core."""

    def __init__(self, retry: RetryPolicy | None = None):
        self.retry = retry or RetryPolicy()
        self._session = None

    # --- pickling: drop the live session, keep config -----------------
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_session"] = None
        return state

    def _sess(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def _request(
        self,
        method: str,
        url: str,
        *,
        headers: dict | None = None,
        params: dict | None = None,
        json_body: dict | None = None,
        timeout: float = 30.0,
        stream: bool = False,
    ):
        import requests

        last_exc: Exception | None = None
        for attempt in range(self.retry.max_attempts):
            try:
                resp = self._sess().request(
                    method,
                    url,
                    headers=headers,
                    params=params,
                    json=json_body,
                    timeout=timeout,
                    stream=stream,
                )
            except requests.RequestException as exc:
                # connection/timeout errors are retryable
                last_exc = exc
                time.sleep(self.retry.sleep_for(attempt, None))
                continue
            if resp.status_code in self.retry.retry_statuses:
                last_exc = HttpStatusError(resp.status_code, resp.text)
                time.sleep(
                    self.retry.sleep_for(attempt, resp.headers.get("Retry-After"))
                )
                continue
            if not (200 <= resp.status_code < 300):
                raise HttpStatusError(resp.status_code, resp.text)
            return resp
        if isinstance(last_exc, HttpStatusError):
            raise last_exc
        raise HttpStatusError(0, f"request-exception: {last_exc}")


def _env_key(*names: str) -> str:
    for name in names:
        val = os.getenv(name)
        if val:
            return val
    raise ValueError(
        "API key not provided. Set one of: " + ", ".join(names)
    )


class AnthropicJudgeClient(_HttpClientBase):
    """U2 judge client (test_chat_assistant_with_judge.py:255-289).

    ``(prompt) -> raw response body text`` — request shape, model/key
    resolution, caps and timeout all mirror the reference; plug into
    ``infer_map(df, AnthropicJudgeClient(), ...)``.
    """

    ENDPOINT = "https://api.anthropic.com/v1/messages"
    ANTHROPIC_VERSION = "2023-06-01"

    def __init__(
        self,
        model: str | None = None,
        api_key: str | None = None,
        endpoint: str | None = None,
        max_tokens: int = 800,
        temperature: float = 0.0,
        timeout: float = 60.0,
        retry: RetryPolicy | None = None,
    ):
        super().__init__(retry)
        self.model = model
        self.api_key = api_key
        self.endpoint = endpoint or self.ENDPOINT
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.timeout = timeout

    def __call__(self, prompt: str) -> str:
        key = self.api_key or _env_key("ANTHROPIC_API_KEY")
        model = self.model or os.getenv("ANTHROPIC_MODEL", "claude-sonnet-4-5")
        resp = self._request(
            "POST",
            self.endpoint,
            headers={
                "x-api-key": key,
                "anthropic-version": self.ANTHROPIC_VERSION,
                "Content-Type": "application/json",
            },
            json_body={
                "model": model,
                "max_tokens": self.max_tokens,
                "temperature": self.temperature,
                "messages": [{"role": "user", "content": prompt}],
            },
            timeout=self.timeout,
        )
        return resp.text


class GeminiGenerateClient(_HttpClientBase):
    """U1 text-generation client (convert_json_to_text.py:67-94,
    120-147) over the public ``generateContent`` REST surface — no
    vendor SDK required on executors.

    ``(prompt) -> generated text``; key from ``GEMINI_API_KEY`` or
    ``GOOGLE_API_KEY`` exactly like the reference's initialize_gemini.
    """

    ENDPOINT_TMPL = (
        "https://generativelanguage.googleapis.com/v1beta/{model}:generateContent"
    )

    def __init__(
        self,
        model: str = "models/gemini-2.5-pro",
        api_key: str | None = None,
        endpoint: str | None = None,
        timeout: float = 60.0,
        retry: RetryPolicy | None = None,
    ):
        super().__init__(retry)
        self.model = model
        self.api_key = api_key
        self.endpoint = endpoint
        self.timeout = timeout

    def __call__(self, prompt: str) -> str:
        key = self.api_key or _env_key("GEMINI_API_KEY", "GOOGLE_API_KEY")
        url = self.endpoint or self.ENDPOINT_TMPL.format(model=self.model)
        resp = self._request(
            "POST",
            url,
            headers={"x-goog-api-key": key, "Content-Type": "application/json"},
            json_body={"contents": [{"parts": [{"text": prompt}]}]},
            timeout=self.timeout,
        )
        payload = resp.json()
        parts = (
            (payload.get("candidates") or [{}])[0]
            .get("content", {})
            .get("parts", [])
        )
        text = "".join(p.get("text", "") for p in parts)
        if not parts:
            # empty candidates/parts = blocked or empty generation (e.g.
            # safety filter): a 200 with no text is a FAILURE — raising
            # routes it to infer_map's fail-soft error column instead of
            # counting as success and writing an empty output file.
            # Report 502, never the transport's 200: a failed row with
            # status=200 would be invisible to the documented
            # `status != 200` retry filter (the embedding-client rule)
            reason = (payload.get("candidates") or [{}])[0].get(
                "finishReason"
            ) or payload.get("promptFeedback", {}).get("blockReason", "EMPTY")
            raise HttpStatusError(
                502, f"empty candidates: {reason} (HTTP {resp.status_code})"
            )
        return text


class EmbeddingEndpointClient(_HttpClientBase):
    """Batched text→vector client for a model-serving embedding
    endpoint — the production swap for the deterministic hashed encoder
    (``scale/encode.py``'s documented stand-in): same per-partition
    session, retry, env-key and fail-soft conventions as the U1/U2
    clients, but ``(texts: list[str]) -> list[list[float]]`` because
    embedding servers batch natively.

    Request body is the ubiquitous open-server shape
    ``{"input": [...], "model": ...}`` (vLLM / TEI / any
    OpenAI-compatible `/v1/embeddings` surface speak it); the response
    parse accepts both common envelopes — ``{"data": [{"embedding":
    [...]}, ...]}`` (index-ordered) and the bare ``{"embeddings":
    [[...], ...]}`` — so one client covers the open-source servers
    without vendor SDKs.  A 200 whose vector count disagrees with the
    input count is a FAILURE (raising routes the whole sub-batch to
    the fail-soft columns; silently misaligning vectors to texts is
    the corrupt-every-downstream-cosine bug).  Plug into
    :func:`yodel_etl_spark.scale.encode.encode_via_endpoint`."""

    def __init__(
        self,
        endpoint: str,
        model: str | None = None,
        api_key: str | None = None,
        api_key_env: tuple[str, ...] = ("EMBEDDING_API_KEY",),
        timeout: float = 60.0,
        retry: RetryPolicy | None = None,
    ):
        super().__init__(retry)
        self.endpoint = endpoint
        self.model = model
        self.api_key = api_key
        self.api_key_env = api_key_env
        self.timeout = timeout

    def __call__(self, texts: list[str]) -> list[list[float]]:
        headers = {"Content-Type": "application/json"}
        key = self.api_key or next(
            (os.getenv(n) for n in self.api_key_env if os.getenv(n)), None
        )
        if key:  # many local servers are unauthenticated — key optional
            headers["Authorization"] = f"Bearer {key}"
        body: dict = {"input": list(texts)}
        if self.model:
            body["model"] = self.model
        resp = self._request(
            "POST",
            self.endpoint,
            headers=headers,
            json_body=body,
            timeout=self.timeout,
        )
        payload = resp.json()
        if "data" in payload:
            rows = sorted(payload["data"], key=lambda r: r.get("index", 0))
            vecs = [r["embedding"] for r in rows]
        else:
            vecs = payload.get("embeddings", [])
        if len(vecs) != len(texts):
            # a 2xx with a bad body is an UPSTREAM protocol failure —
            # report 502, never the transport's 200: encode_via_endpoint
            # records getattr(exc, "status") in encode_status, and a 200
            # there would make NULL-vector rows unselectable by the
            # documented `status != 200` retry filter
            raise HttpStatusError(
                502,
                f"embedding count mismatch: sent {len(texts)} texts, "
                f"got {len(vecs)} vectors (HTTP {resp.status_code})",
            )
        return [[float(x) for x in v] for v in vecs]


class BearerPageClient(_HttpClientBase):
    """S3 page fetcher (extract_chat_qa_tsv.py:52-65): ``(page) ->
    list[dict]`` for ``fetch_paginated``.  Bearer token from arg or
    ``RAGFLOW_TOKEN``; non-2xx raises (→ error marker row upstream)."""

    def __init__(
        self,
        base_url: str,
        token: str | None = None,
        page_size: int = 100,
        path: str = "/api/v1/chats",
        timeout: float = 30.0,
        retry: RetryPolicy | None = None,
    ):
        super().__init__(retry)
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.page_size = page_size
        self.path = path
        self.timeout = timeout

    def _get_records(self, url: str, page: int) -> list[dict]:
        token = self.token or _env_key("RAGFLOW_TOKEN")
        resp = self._request(
            "GET",
            url,
            headers={"Authorization": f"Bearer {token}"},
            params={"page": page, "page_size": self.page_size},
            timeout=self.timeout,
        )
        return resp.json().get("data") or []

    def __call__(self, page: int) -> list[dict]:
        return self._get_records(f"{self.base_url}{self.path}", page)


class BearerFanoutClient(BearerPageClient):
    """S4 fan-out fetcher (extract_chat_qa_tsv.py:67-81):
    ``(parent_id, page) -> list[dict]`` for ``fetch_fanout`` —
    sessions-per-chat under ``/api/v1/chats/{chat_id}/sessions``."""

    def __init__(
        self,
        base_url: str,
        token: str | None = None,
        page_size: int = 100,
        path_tmpl: str = "/api/v1/chats/{parent_id}/sessions",
        timeout: float = 30.0,
        retry: RetryPolicy | None = None,
    ):
        super().__init__(base_url, token, page_size, "", timeout, retry)
        self.path_tmpl = path_tmpl

    def __call__(self, parent_id: str, page: int) -> list[dict]:  # type: ignore[override]
        url = self.base_url + self.path_tmpl.format(parent_id=parent_id)
        return self._get_records(url, page)


@dataclass
class SseChatResult:
    """Fail-soft result of one chat completion (S6 + S5)."""

    answer: str | None
    reference_json: str | None
    session_id: str | None
    status: int


class SseChatClient(_HttpClientBase):
    """S6 per-row chat completion over a streamed SSE body
    (test_chat_assistant.py:81-133; hardened parse :36-103).

    ``ask(question, session_id)`` POSTs ``{question, stream: true}``
    and folds the ``data:`` lines with last-value-wins, skipping
    ``[DONE]``/``null``/bool markers, non-zero ``code`` envelopes and
    malformed JSON — the same rules ``io.sse.parse_events`` applies as
    column expressions when transcripts are landed as frames.  Errors
    yield ``status=0`` rather than raising (reference :102-103)."""

    def __init__(
        self,
        base_url: str,
        chat_id: str,
        token: str | None = None,
        create_timeout: float = 30.0,
        ask_timeout: float = 60.0,
        retry: RetryPolicy | None = None,
    ):
        super().__init__(retry)
        self.base_url = base_url.rstrip("/")
        self.chat_id = chat_id
        self.token = token
        self.create_timeout = create_timeout
        self.ask_timeout = ask_timeout

    _SENTINELS = ("[DONE]", "null", "true", "false")

    def _fold_sse(self, resp) -> SseChatResult:
        answer = refs = session_id = None
        for raw in resp.iter_lines(decode_unicode=True):
            line = (raw or "").strip()
            if not line.startswith("data:"):
                continue
            payload = line[5:].strip()
            if payload in self._SENTINELS:
                continue
            try:
                env = json.loads(payload)
            except (ValueError, TypeError):
                continue
            if not isinstance(env, dict) or env.get("code", 0) != 0:
                continue
            data = env.get("data")
            if not isinstance(data, dict):
                continue  # bool completion marker
            answer = data.get("answer", answer)
            session_id = data.get("session_id", session_id)
            if data.get("reference") is not None:
                refs = json.dumps(data["reference"], sort_keys=True)
        return SseChatResult(answer, refs, session_id, resp.status_code)

    def _post(self, payload: dict, timeout: float) -> SseChatResult:
        try:
            resp = self._request(
                "POST",
                f"{self.base_url}/api/v1/chats/{self.chat_id}/completions",
                headers={
                    "Authorization": f"Bearer {self.token or _env_key('RAGFLOW_TOKEN')}",
                    "Content-Type": "application/json",
                },
                json_body=payload,
                timeout=timeout,
                stream=True,
            )
        except HttpStatusError as exc:
            return SseChatResult(None, None, None, exc.status)
        return self._fold_sse(resp)

    def create_session(self) -> SseChatResult:
        """Empty question opens a fresh session (:81-105) — one per
        input row kills history bias (reference :4-5)."""
        return self._post({"question": "", "stream": True}, self.create_timeout)

    def ask(self, question: str, session_id: str | None) -> SseChatResult:
        payload: dict = {"question": question, "stream": True}
        if session_id:
            payload["session_id"] = session_id
        return self._post(payload, self.ask_timeout)


class ChatAskClient(SseChatClient):
    """S6 as an ``infer_map`` Client: ``(question) -> folded payload
    JSON`` (io.sse.DATA_SCHEMA shape) — what ``qa_eval.ask_stage``
    consumes.  A fresh session per question (test_chat_assistant.py:
    216-217, history-bias kill); non-2xx raises :class:`HttpStatusError`
    so the status lands in the fail-soft column."""

    def __call__(self, question: str) -> str:
        created = self.create_session()
        res = self.ask(question, created.session_id)
        if not (200 <= res.status < 300):
            raise HttpStatusError(res.status, res.answer or "")
        return json.dumps(
            {
                "answer": res.answer,
                "session_id": res.session_id,
                "reference": json.loads(res.reference_json)
                if res.reference_json
                else None,
            },
            sort_keys=True,
        )
