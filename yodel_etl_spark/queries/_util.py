"""Shared helpers for deterministic, oracle-exact query results."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Per-row exact integer cents: ``cast(round(x*100) as long)``.

    The per-row double multiply+round is bit-deterministic on both
    engines; summing longs is associative, so aggregation order
    (shuffle/AQE) cannot perturb results.  DuckDB twin:
    ``CAST(round(x*100) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def money(sum_cents: Column) -> Column:
    """Exact cents total back to a readable double (single IEEE div)."""
    return sum_cents / F.lit(100.0)
