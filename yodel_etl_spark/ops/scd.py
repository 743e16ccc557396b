"""Slowly-changing-dimension type-2 history from a change log.

The shape every warehouse ingest needs: a stream of per-key attribute
observations (CDC feed, event log, daily snapshots) folded into validity
intervals — one row per *run* of consecutive equal values, with
``valid_from`` / ``valid_to`` / ``is_current``.  The reference's
pipelines stop at last-value-wins (SURVEY §2.4 A5,
test_chat_assistant.py:59-69); SCD2 is the engine extension that keeps
the full history instead of only the final value.

Scale shape: ONE shuffle on the key.  Both window passes (change
detection and interval closing) share the same (partition, order) spec,
so Catalyst plans a single Exchange + single Sort; no groupBy is needed
because each run is represented by its first row (the change row) —
``valid_to`` is simply the next change's ``valid_from`` via ``lead``.
At 100 TB the change log shuffles once, narrow columns only, and skewed
keys fall to AQE's skew-split because the windows are per-key
independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str | None = None,
    high_date: str = "2200-01-01 00:00:00",
) -> DataFrame:
    """Type-2 history: ``(key, attr, valid_from, valid_to, is_current)``.

    Consecutive observations with the same ``attr_col`` value collapse
    into one validity interval (null-safe comparison, so NULL runs
    collapse too).  ``valid_from`` is the first observation of the run;
    ``valid_to`` is the next run's ``valid_from`` (half-open interval,
    the SCD2 convention) and the open-ended ``high_date`` sentinel on
    the current row — the warehouse convention, and it keeps the column
    NULL-free, which range predicates and engine-exact comparisons both
    prefer.  (The textbook high date 9999-12-31 exceeds pandas/Arrow
    ``datetime64[ns]`` range, so the default sentinel is 2200-01-01;
    pass the value your warehouse standardizes on.)

    ``tiebreak_col`` makes the total order deterministic when ``ts_col``
    has duplicates within a key (e.g. an event id); required for
    engine-exact output whenever ties are possible.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(attr_col)).over(w)
    # run starts on the key's first row or where the attribute differs
    # from its predecessor.  The explicit first-row marker matters when
    # attr itself is NULL: lag() returns NULL both for "no previous
    # row" and "previous attr was NULL", so eqNullSafe alone would
    # swallow a leading NULL run.
    first = F.row_number().over(w) == 1
    starts = (
        df.select(key_col, ts_col, attr_col, *( [tiebreak_col] if tiebreak_col else [] ))
        .withColumn("__chg", first | ~prev.eqNullSafe(F.col(attr_col)))
        .where(F.col("__chg"))
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w2)
    sentinel = F.to_timestamp(F.lit(high_date))
    return starts.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.coalesce(nxt, sentinel).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
