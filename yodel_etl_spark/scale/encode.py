"""Text → embedding encoder stage, so similarity / SemDeDup / semantic
decontamination pipelines run END-TO-END from raw text instead of
assuming an ``embedding`` column fell from the sky.

The encoder here is a deterministic hashed bag-of-words projection
(feature hashing à la Weinberger et al. 2009 — the mock-model
convention of ``llm/infer.py``: real deployments swap in a model
server behind the same ``mapInPandas`` signature, batch shape, and
schema; the Spark-side plumbing is what this module makes real and
benchable).  Properties that make the mock useful rather than noise:

  * deterministic: same (text, dim, seed) → bit-identical vector on
    any executor, any round — keyed BLAKE2b per token, no RNG state;
  * similarity-faithful for near-dups: documents sharing most tokens
    share most hashed contributions, so cosine is high for planted
    near-duplicates and low for unrelated docs (pinned in pytest) —
    exactly the property LSH/SemDeDup consumers need end-to-end
    pipelines to exercise;
  * cheap and Arrow-batched: one pass per batch with a per-batch
    token→contribution memo, unit-normalized float32 output.

Scale shape: pure map — no shuffle, no state; the encode stage cost
scales linearly with corpus tokens and parallelizes at row grain.  At
100 TB the same plan holds with a GPU/model-server kernel inside the
batch function (the only part that changes) —
:func:`encode_via_endpoint` IS that production shape: the U1/U2
per-partition-client pattern pointed at an embedding endpoint
(``llm.clients.EmbeddingEndpointClient``), fail-soft status columns
and token-bucket pacing included, emitting the same vector column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _token_contrib(token: str, dim: int, seed: int, k: int = 4):
    """``k`` signed one-hot contributions for one token: BLAKE2b keyed
    by the seed, 3 bytes per slot (2 index + 1 sign) — deterministic
    across processes (no PYTHONHASHSEED dependence)."""
    h = hashlib.blake2b(
        token.encode("utf-8"), digest_size=3 * k, key=seed.to_bytes(8, "little")
    ).digest()
    out = []
    for j in range(k):
        idx = int.from_bytes(h[3 * j : 3 * j + 2], "little") % dim
        sign = 1.0 if h[3 * j + 2] & 1 else -1.0
        out.append((idx, sign))
    return out


def encode_batch(texts, dim: int = 64, seed: int = 7, k: int = 4):
    """numpy twin of the executor kernel (importable for tests): list of
    strings → (len(texts), dim) float32 unit vectors (zero vector for
    empty/whitespace-only text).

    Vectorized on purpose: hashing happens once per UNIQUE token, and
    the per-token accumulation is one ``bincount`` over linearized
    ``(doc, dim)`` keys — C speed for the ~tokens×k adds that dominated
    the pure-Python loop.  Contributions are ±1, so float64 sums are
    exact integers and the result is bit-identical regardless of
    accumulation order (the determinism contract)."""
    import numpy as np

    n_docs = len(texts)
    out = np.zeros((n_docs, dim), dtype=np.float64)
    toks_per_doc = [(t or "").lower().split() for t in texts]
    counts = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n_docs)
    n_flat = int(counts.sum())
    if n_flat:
        flat = np.empty(n_flat, dtype=object)
        pos = 0
        for toks in toks_per_doc:
            flat[pos : pos + len(toks)] = toks
            pos += len(toks)
        uniq, inv = np.unique(flat, return_inverse=True)
        # per-unique-token sparse contributions: k (index, sign) pairs
        tok_idx = np.empty((len(uniq), k), dtype=np.int64)
        tok_sgn = np.empty((len(uniq), k), dtype=np.float64)
        for u, tok in enumerate(uniq):
            for j, (idx, sign) in enumerate(_token_contrib(tok, dim, seed, k)):
                tok_idx[u, j] = idx
                tok_sgn[u, j] = sign
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        keys = (np.repeat(doc_idx, k) * dim + tok_idx[inv].ravel())
        out = np.bincount(
            keys, weights=tok_sgn[inv].ravel(), minlength=n_docs * dim
        ).reshape(n_docs, dim)
    norms = np.sqrt((out * out).sum(axis=1))
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return out.astype(np.float32)


def encode_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Append ``out_col`` (``array<float>``, unit-normalized, ``dim``
    wide) computed from ``text_col`` via the deterministic hashed
    encoder — one Arrow ``mapInPandas`` pass, schema = input + vector."""
    from yodel_etl_spark.session import ship_package

    ship_package(df.sparkSession)  # kernel closes over package fns
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = encode_batch(list(pdf[text_col]), dim=dim, seed=seed)
            res = pdf.copy()
            res[out_col] = [v.tolist() for v in vecs]
            yield res

    return df.mapInPandas(batches, schema=out_schema)


def encode_via_endpoint(
    df: DataFrame,
    client,
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 64,
    rate_per_sec: float | None = None,
    max_concurrency: int | None = None,
) -> DataFrame:
    """The PRODUCTION encoder shape — ``infer_map``'s per-partition
    external-call pattern pointed at an embedding endpoint: one
    picklable batched ``client`` (``(texts: list[str]) ->
    list[list[float]]``, e.g.
    :class:`~yodel_etl_spark.llm.clients.EmbeddingEndpointClient`) per
    partition, Arrow batches sliced into ``batch_size`` server calls, a
    per-partition token bucket (``rate_per_sec`` paces CALLS, the unit
    an embedding server rate-limits), and the fail-soft contract:
    exceptions never cross the UDF boundary — a failed call yields
    ``(NULL vector, status, error)`` for exactly its rows, retryable
    later with ``status != 200``.

    Schema = input + ``out_col array<float>`` + ``encode_status int`` +
    ``encode_error string`` — the vector column matches
    :func:`encode_text`'s, so every downstream consumer (LSH, IVF,
    SemDeDup, the embedding ingest gate) takes either encoder
    unchanged.  ``max_concurrency`` caps concurrently-calling
    partitions exactly like ``infer_map`` (default: the
    ``spark.yodel.llm.maxConcurrency`` conf) — cluster-wide pacing is
    ``partitions × rate_per_sec``, the declarative form of the
    reference's global sleep.  Catalyst cannot push work through the
    opaque map: apply AFTER all prunable projections/filters."""
    from yodel_etl_spark.session import ship_package

    spark = df.sparkSession
    ship_package(spark)
    if max_concurrency is None:
        conf = spark.conf.get("spark.yodel.llm.maxConcurrency", None)
        max_concurrency = int(conf) if conf else None
    if max_concurrency:
        df = df.repartition(max_concurrency)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.ArrayType(T.FloatType())),
            T.StructField("encode_status", T.IntegerType()),
            T.StructField("encode_error", T.StringType()),
        ]
    )
    min_interval = 1.0 / rate_per_sec if rate_per_sec else 0.0

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        last = 0.0
        for pdf in it:
            texts = [("" if t is None else str(t)) for t in pdf[text_col]]
            vecs: list[list[float] | None] = []
            statuses: list[int] = []
            errors: list[str | None] = []
            for lo in range(0, len(texts), batch_size):
                chunk = texts[lo : lo + batch_size]
                if min_interval:
                    now = time.monotonic()
                    if now - last < min_interval:
                        time.sleep(min_interval - (now - last))
                    last = time.monotonic()
                try:
                    got = client(chunk)
                    if len(got) != len(chunk):
                        raise RuntimeError(
                            f"client returned {len(got)} vectors for "
                            f"{len(chunk)} texts"
                        )
                    vecs.extend(got)
                    statuses.extend([200] * len(chunk))
                    errors.extend([None] * len(chunk))
                except Exception as exc:  # noqa: BLE001 - fail-soft by contract
                    vecs.extend([None] * len(chunk))
                    st = getattr(exc, "status", 500)
                    if not isinstance(st, int) or 200 <= st < 300:
                        # a failed row must never carry a success code —
                        # `status != 200` is the documented retry filter —
                        # and a non-int status (a custom client's
                        # status=None/str) must not TypeError across the
                        # UDF boundary
                        st = 500
                    statuses.extend([st] * len(chunk))
                    errors.extend([f"{type(exc).__name__}: {exc}"] * len(chunk))
            res = pdf.copy()
            res[out_col] = vecs
            res["encode_status"] = statuses
            res["encode_error"] = errors
            yield res

    return df.mapInPandas(run, schema=out_schema)
