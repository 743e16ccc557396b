"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (plus the scale extensions)
registers here as a named query: a builder ``(spark, sf_dir) -> DataFrame``
and, when SQL-expressible, a DuckDB oracle SQL string computing the same
result on the same parquet tables.

Determinism rules every registered query follows (so the driver's
row-count + schema + order-insensitive value-hash comparison passes
exactly, no tolerance needed):
  * Monetary/double aggregates go through exact integer cents:
    ``sum(cast(round(x*100) as bigint)) / 100.0`` — associative, so
    shuffle order can't perturb the result; final division is a single
    deterministic IEEE op on both engines.  Always ``round()`` *before*
    casting (DuckDB casts round, Spark casts truncate).
  * Every computed column is aliased identically in Spark and SQL.
  * Ordered string concatenations carry an explicit sort key.
  * Floating scores emitted row-wise use only per-row arithmetic
    (deterministic bit-for-bit) or are rounded after an
    order-insensitive exact reduction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    build: Builder
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # marks the query as a perf-representative
    # headline: listed as such in QUERIES.md, and selected by
    # `bench.py --headline` (or SPARK_GRAFT_BENCH_HEADLINE=1) for a
    # quick perf smoke between full runs.  The default bench.py run
    # still times EVERY registered query — the per-round BENCH records
    # compare across rounds only if the set composition stays the full
    # registry (filter ad hoc with SPARK_GRAFT_BENCH_QUERIES).
    tier: int = 0  # driver-window priority: 0 = established (ordered
    # first so a bounded correctness window keeps verifying them), 1+ =
    # newer additions that yield their window slot (still oracle-backed;
    # parity pinned by pytest at sf0.001/sf0.01)


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
    tier: int = 0,
) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(
            name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench, tier
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return
    the full registry."""
    import yodel_etl_spark.queries  # noqa: F401  (registers on import)

    return QUERIES
