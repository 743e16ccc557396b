"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``yodel_etl_spark.registry``: every operator from
SURVEY.md §2 (and the scale extensions) registers a named query builder
plus, when SQL-expressible, a DuckDB oracle.  See
``yodel_etl_spark/queries/`` for the implementations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from yodel_etl_spark.registry import load_all

    return load_all()["flagship_revenue_by_nation"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Oracle-backed queries are listed first (registration order), the
    rows-only-by-design ones last, so a bounded driver correctness
    window always covers every query that has the strong
    rows+schema+hash check."""
    from yodel_etl_spark.registry import load_all

    qs = load_all()
    ordered = [n for n, q in qs.items() if q.oracle is not None]
    ordered += [n for n, q in qs.items() if q.oracle is None]
    return {name: qs[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from yodel_etl_spark.registry import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
