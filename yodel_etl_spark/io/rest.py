"""S3/S4 — paginated REST sources (extract_chat_qa_tsv.py:51-81).

The reference loops ``GET /api/v1/chats?page=N&page_size=100`` until an
empty page, then fans out ``GET /chats/{chat_id}/sessions`` per chat —
strictly sequential, paced by ``time.sleep``.

Spark-first: pages are the unit of parallelism.  ``fetch_paginated``
distributes page-id ranges over the cluster with ``mapInPandas`` — one
HTTP client per partition, a per-partition token bucket replacing the
global sleep (cluster-wide pacing = partitions × per-partition rate,
capped by ``max_partitions``).  The fan-out (S4) is the same operator
mapped over a parent-id frame, which subsumes the reference's nested
loop; landing chats and sessions as two frames turns the correlation
into an ordinary broadcast join (SURVEY §2.3).

The page fetcher is a plain picklable callable ``(page:int) ->
list[dict]`` (or ``(parent_id, page)`` for the fan-out form), so tests
inject a deterministic fake and production wraps ``requests`` — the
distributed shape is identical.  A Spark 4 Python Data Source wrapper
(``PaginatedRestDataSource``) exposes the same reader through
``spark.read.format(...)`` for SQL users.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PageFetcher = Callable[[int], list[dict]]
FanoutFetcher = Callable[[str, int], list[dict]]

#: raw landing schema: one JSON string per record, typed later with
#: from_json — keeps the source schema-agnostic like the reference's
#: ``data.get("data", [])`` dict rows
RAW_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("record", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

FANOUT_RAW_SCHEMA = T.StructType(
    [
        T.StructField("parent_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("record", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


class _TokenBucket:
    """Per-partition rate limiter standing in for the reference's
    inter-page ``time.sleep`` (extract_chat_qa_tsv.py:65,81)."""

    def __init__(self, per_sec: float | None):
        self.min_interval = 1.0 / per_sec if per_sec else 0.0
        self.last = 0.0

    def wait(self) -> None:
        if not self.min_interval:
            return
        now = time.monotonic()
        delta = now - self.last
        if delta < self.min_interval:
            time.sleep(self.min_interval - delta)
        self.last = time.monotonic()


def fetch_paginated(
    spark: SparkSession,
    fetch_page: PageFetcher,
    max_pages: int,
    max_partitions: int = 8,
    rate_per_sec: float | None = None,
    first_page: int = 1,
) -> DataFrame:
    """Fetch up to ``max_pages`` pages in parallel; empty pages vanish.

    The reference stops at the first empty page; a distributed fetch
    can't serialize that signal, so the contract becomes an explicit
    page budget (``max_pages``) with empty pages yielding no rows —
    same result set whenever the true page count ≤ budget.  Fail-soft:
    a page whose fetch raises becomes exactly one row with ``record =
    NULL`` and the exception text under ``error`` — never an exception
    (SURVEY §4 fail-soft convention), and never silent loss: callers
    detect incomplete landings via ``error IS NOT NULL`` and can retry
    those pages (the reference instead aborts on raise_for_status,
    extract_chat_qa_tsv.py:57)."""
    from yodel_etl_spark.session import ship_package

    ship_package(spark)  # fetchers may be package functions (by-ref pickle)
    pages = spark.range(first_page, first_page + max_pages).repartition(
        min(max_partitions, max_pages)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = _TokenBucket(rate_per_sec)
        for pdf in batches:
            out_pages, out_records, out_errors = [], [], []
            for page in pdf["id"].tolist():
                bucket.wait()
                try:
                    records = fetch_page(int(page))
                except Exception as exc:  # noqa: BLE001 - fail-soft by contract
                    out_pages.append(int(page))
                    out_records.append(None)
                    out_errors.append(f"{type(exc).__name__}: {exc}")
                    continue
                for rec in records:
                    out_pages.append(int(page))
                    out_records.append(json.dumps(rec, sort_keys=True))
                    out_errors.append(None)
            yield pd.DataFrame(
                {
                    "page": pd.array(out_pages, dtype="int32"),
                    "record": out_records,
                    "error": out_errors,
                }
            )

    return pages.mapInPandas(run, schema=RAW_SCHEMA)


def fetch_paginated_all(
    spark: SparkSession,
    fetch_page: PageFetcher,
    round_size: int = 64,
    max_rounds: int = 64,
    max_partitions: int = 8,
    rate_per_sec: float | None = None,
) -> DataFrame:
    """S3 with the reference's EXACT termination contract: fetch until
    the first empty page (extract_chat_qa_tsv.py:58-62), no page-count
    guess required.

    Shape: distributed ROUNDS of ``round_size`` page fetches; after each
    round the driver inspects only the round's distinct page ids (≤
    round_size values — a bounded control-plane collect, the standard
    iterative-driver pattern, not a data collect).  The first page that
    returned neither records nor an error marker is the stop page;
    results are trimmed to pages before it, which is byte-for-byte the
    reference's sequential early-stop semantics — pages past a hole are
    fetched speculatively but never emitted.  Worst case does
    ``round_size - 1`` wasted fetches versus the reference's zero;
    in exchange every round is ``max_partitions``-parallel."""
    from functools import reduce

    frames: list[DataFrame] = []
    start = 1
    stop_page: int | None = None
    for _ in range(max_rounds):
        batch = fetch_paginated(
            spark,
            fetch_page,
            max_pages=round_size,
            max_partitions=max_partitions,
            rate_per_sec=rate_per_sec,
            first_page=start,
        ).persist()
        present = {r["page"] for r in batch.select("page").distinct().collect()}
        frames.append(batch)
        stop_page = next(
            (p for p in range(start, start + round_size) if p not in present), None
        )
        if stop_page is not None:
            break
        start += round_size
    out = reduce(lambda a, b: a.unionByName(b), frames)
    if stop_page is not None:
        out = out.where(F.col("page") < stop_page)
    # cache lifetime is the caller's: session.release(out) frees the
    # round batches (persisted so the control-plane page probe doesn't
    # re-fetch every page when the caller's action runs)
    from yodel_etl_spark.session import register_persisted

    return register_persisted(out, *frames)


def fetch_fanout(
    parents: DataFrame,
    parent_col: str,
    fetch_page: FanoutFetcher,
    max_pages_per_parent: int,
    max_partitions: int = 8,
    rate_per_sec: float | None = None,
) -> DataFrame:
    """S4: per-parent paginated fetch (sessions per chat) — the
    reference's nested loop as one distributed operator over the
    (parent × page) grid."""
    from yodel_etl_spark.session import ship_package

    ship_package(parents.sparkSession)
    grid = (
        parents.select(F.col(parent_col).cast("string").alias("parent_id"))
        .crossJoin(
            parents.sparkSession.range(1, max_pages_per_parent + 1).select(
                F.col("id").cast("int").alias("page")
            )
        )
        .repartition(max_partitions)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = _TokenBucket(rate_per_sec)
        for pdf in batches:
            rows: list[tuple[str, int, str | None, str | None]] = []
            for parent_id, page in zip(pdf["parent_id"], pdf["page"]):
                bucket.wait()
                try:
                    records = fetch_page(str(parent_id), int(page))
                except Exception as exc:  # noqa: BLE001 - fail-soft by contract
                    rows.append(
                        (str(parent_id), int(page), None, f"{type(exc).__name__}: {exc}")
                    )
                    continue
                rows.extend(
                    (str(parent_id), int(page), json.dumps(r, sort_keys=True), None)
                    for r in records
                )
            yield pd.DataFrame(rows, columns=["parent_id", "page", "record", "error"])

    return grid.mapInPandas(run, schema=FANOUT_RAW_SCHEMA)


def typed(df: DataFrame, schema: T.StructType, record_col: str = "record") -> DataFrame:
    """Apply a record schema to the raw JSON landing frame."""
    return df.withColumn("rec", F.from_json(record_col, schema)).select(
        *[c for c in df.columns if c != record_col], "rec.*"
    )


def demo_fetch_page(page: int) -> list[dict]:
    """Deterministic demo fetcher for the Python Data Source (resolved
    by import path on executors — see ``PaginatedRestReader.read``);
    doubles as the test fixture."""
    if page > 4:
        return []
    return [{"id": f"rec{page}-{i}", "page": page} for i in range(3)]


def demo_fetch_sessions(parent_id: str, page: int) -> list[dict]:
    """Deterministic demo fan-out fetcher (sessions-per-chat shape) for
    the ``fanout_rest`` Data Source; doubles as the test fixture."""
    if page > 2:
        return []
    return [{"session": f"{parent_id}-s{page}-{i}"} for i in range(2)]


# --------------------------------------------------------------------------
# Spark 4 Python Data Source wrapper (spark.read.format interface)
# --------------------------------------------------------------------------
try:  # pragma: no cover - exercised only where the API exists
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _PagePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    def _resolve_fetcher(spec: str):
        """Import-path resolution (``pkg.mod:fn``) — executors re-import
        instead of unpickling, so the source works from pure SQL too."""
        import importlib

        mod, _, fn = spec.rpartition(":")
        return getattr(importlib.import_module(mod), fn)

    class PaginatedRestReader(DataSourceReader):
        def __init__(self, options):
            self.options = options
            self.max_pages = int(options.get("maxpages", 100))
            self.n_parts = int(options.get("numpartitions", 8))

        def partitions(self):
            per = max(1, self.max_pages // self.n_parts)
            return [
                _PagePartition(lo, min(lo + per, self.max_pages + 1))
                for lo in range(1, self.max_pages + 1, per)
            ]

        def read(self, partition):
            fetch = _resolve_fetcher(self.options["fetcher"])
            bucket = _TokenBucket(float(self.options.get("ratepersec", 0)) or None)
            for page in range(partition.start, partition.end):
                bucket.wait()
                try:
                    records = fetch(page)
                except Exception as exc:  # noqa: BLE001 - fail-soft error row
                    yield (page, None, f"{type(exc).__name__}: {exc}")
                    continue
                for rec in records:
                    yield (page, json.dumps(rec, sort_keys=True), None)

    class PaginatedRestDataSource(DataSource):
        """``spark.read.format("paginated_rest").option("fetcher",
        "pkg.mod:fn").option("maxPages", "40").load()`` — the fetcher is
        named by import path so executors resolve it without pickling."""

        @classmethod
        def name(cls):
            return "paginated_rest"

        def schema(self):
            return "page int, record string, error string"

        def reader(self, schema):
            return PaginatedRestReader(self.options)

    class _GridPartition(InputPartition):
        def __init__(self, items: list[tuple[str, int]]):
            self.items = items

    class FanoutRestReader(DataSourceReader):
        """(parent × page) grid chunks — the distributed form of the
        reference's nested sessions-per-chat loop
        (extract_chat_qa_tsv.py:69-81)."""

        def __init__(self, options):
            self.options = options
            self.parents = [p for p in options.get("parents", "").split(",") if p]
            self.max_pages = int(options.get("maxpagesperparent", 10))
            self.n_parts = int(options.get("numpartitions", 8))

        def partitions(self):
            grid = [
                (p, pg) for p in self.parents for pg in range(1, self.max_pages + 1)
            ]
            if not grid:
                return [_GridPartition([])]
            per = max(1, -(-len(grid) // self.n_parts))  # ceil division
            return [
                _GridPartition(grid[i : i + per]) for i in range(0, len(grid), per)
            ]

        def read(self, partition):
            fetch = _resolve_fetcher(self.options["fetcher"])
            bucket = _TokenBucket(float(self.options.get("ratepersec", 0)) or None)
            for parent_id, page in partition.items:
                bucket.wait()
                try:
                    records = fetch(parent_id, page)
                except Exception as exc:  # noqa: BLE001 - fail-soft error row
                    yield (parent_id, page, None, f"{type(exc).__name__}: {exc}")
                    continue
                for rec in records:
                    yield (parent_id, page, json.dumps(rec, sort_keys=True), None)

    class FanoutRestDataSource(DataSource):
        """``spark.read.format("fanout_rest").option("fetcher",
        "pkg.mod:fn").option("parents", "c1,c2")
        .option("maxPagesPerParent", "5").load()`` — S4 as a first-class
        readable format (parent ids are a control-plane-sized option;
        frame-shaped parent lists use :func:`fetch_fanout` directly)."""

        @classmethod
        def name(cls):
            return "fanout_rest"

        def schema(self):
            return "parent_id string, page int, record string, error string"

        def reader(self, schema):
            return FanoutRestReader(self.options)

    def register_rest_datasources(spark: SparkSession) -> None:
        """Idempotently register both REST formats on this session."""
        from yodel_etl_spark.session import ship_package

        ship_package(spark)  # executors import the fetcher's module
        for src in (PaginatedRestDataSource, FanoutRestDataSource):
            try:
                spark.dataSource.register(src)
            except Exception as exc:  # noqa: BLE001 - already-registered race
                if "already" not in str(exc).lower():
                    raise

except ImportError:  # pragma: no cover
    PaginatedRestDataSource = None  # type: ignore[assignment]
    FanoutRestDataSource = None  # type: ignore[assignment]

    def register_rest_datasources(spark: SparkSession) -> None:
        raise NotImplementedError("Python Data Source API requires Spark 4+")
