"""Funnel / ordered-sequence match over an event log: per key, the
earliest strictly-ordered completion of a step sequence (view → click →
purchase), with the timestamp of each reached step.

Why an engine op: conversion/path analysis is the first analytical
question every event pipeline answers, and the naive SQL formulation is
a k-step chain of self-joins — k passes over the log.  This form does
it in ONE pass and ONE shuffle: group the log by key, sort each key's
bounded event array, and walk it once with a codegen ``aggregate``
lambda whose state is the (t₁…t_k) vector.  Semantics match the
textbook join-chain exactly (each t_i is the MINIMUM ts of step i
strictly after t_{i-1} — walking the array in ascending (ts, tiebreak)
order makes "first qualifying" that minimum), which is what the DuckDB
join-chain parity test pins.

Scale shape: the one shuffle carries ``(key, ts, type)`` rows; per-key
state is the sorted event array (bounded by events-per-key — the same
contract as sessionize/collect_list ops; for keys too hot for that
bound, pre-filter to the step types, which is usually a large cut).
The walk itself is a whole-stage-codegen higher-order function — no
Python, no window, no per-step join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``(key, t1..tk, stage)``: per key, ``t_i`` is the earliest
    ``ts`` of ``steps[i]`` strictly after ``t_{i-1}`` (t₁ is the plain
    minimum of step 1); NULL once the chain breaks.  ``stage`` counts
    reached steps, so ``groupBy(stage).count()`` is the funnel report.
    Keys with no step-1 event are absent (the join-chain convention).

    ``tiebreak_col`` orders same-timestamp events deterministically
    within the walk; it does not affect the t_i VALUES (those are
    timestamp minima), only which physical event realizes them.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    order_struct = (
        F.struct(F.col(ts_col).alias("ts"), F.col(tiebreak_col).alias("tb"),
                 F.col(type_col).alias("tp"))
        if tiebreak_col
        else F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp"))
    )
    # pre-filter to the step types: everything else can neither set nor
    # block a stage, and it is the hot-key bound in practice
    ev = df.where(F.col(type_col).isin(*steps))
    grouped = ev.groupBy(F.col(key_col).alias("key")).agg(
        F.array_sort(F.collect_list(order_struct)).alias("evs")
    )
    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i + 1}") for i in range(k)]
    )

    def step_merge(acc, e):
        # first unreached stage whose type matches and whose ts is
        # strictly after the previous stage's time claims this event
        fields = []
        for i in range(k):
            prev_ok = F.lit(True) if i == 0 else acc[f"t{i}"].isNotNull()
            prev_lt = F.lit(True) if i == 0 else (acc[f"t{i}"] < e["ts"])
            take = (
                acc[f"t{i + 1}"].isNull()
                & (e["tp"] == F.lit(steps[i]))
                & prev_ok
                & prev_lt
            )
            fields.append(
                F.when(take, e["ts"]).otherwise(acc[f"t{i + 1}"]).alias(f"t{i + 1}")
            )
        return F.struct(*fields)

    walked = grouped.select(
        "key", F.aggregate("evs", init, step_merge).alias("f")
    )
    ts_cols = [F.col(f"f.t{i + 1}").alias(f"t{i + 1}") for i in range(k)]
    stage = sum(
        (F.when(F.col(f"f.t{i + 1}").isNotNull(), 1).otherwise(0) for i in range(k)),
        start=F.lit(0),
    )
    return walked.select(
        "key", *ts_cols, stage.cast("int").alias("stage")
    ).where(F.col("t1").isNotNull())


def funnel_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> str:
    """The textbook k-pass join-chain as DuckDB SQL — the independent
    formulation :func:`funnel_steps` is pinned against (each stage a
    ``min(ts)`` strictly after the previous stage's time)."""
    steps = list(steps)
    ctes = [
        f"s1 AS (SELECT {key_col} AS key, min({ts_col}) AS t1"
        f" FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY {key_col})"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i + 1} AS (SELECT e.{key_col} AS key, min(e.{ts_col}) AS t{i + 1}"
            f" FROM {table} e JOIN s{i} ON e.{key_col} = s{i}.key"
            f" WHERE e.{type_col} = '{steps[i]}' AND e.{ts_col} > s{i}.t{i}"
            f" GROUP BY e.{key_col})"
        )
    k = len(steps)
    sel_ts = ", ".join(f"s{i + 1}.t{i + 1}" for i in range(k))
    stage = " + ".join(
        f"(CASE WHEN s{i + 1}.t{i + 1} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(k)
    )
    joins = "".join(
        f" LEFT JOIN s{i + 1} ON s1.key = s{i + 1}.key" for i in range(1, k)
    )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT s1.key, {sel_ts}, CAST({stage} AS INTEGER) AS stage"
        + f" FROM s1{joins}"
    )
