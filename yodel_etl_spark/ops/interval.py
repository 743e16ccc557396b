"""Range (interval-containment) join and multi-resolution rollup.

Spark has no native range-join optimization: a raw
``points.join(intervals, pt BETWEEN start AND end)`` plans as a
broadcast-nested-loop / cartesian — O(|points|·|intervals|) comparisons.
The standard rewrite bins the time axis into fixed-width buckets:
intervals are exploded to every bucket they overlap, points map to one
bucket, and the join becomes an EQUI join on (keys…, bucket) followed by
the exact BETWEEN filter.  Cost is linear in |points| +
Σ interval_span/bucket — pick the bucket width near the median interval
span so most intervals explode to O(1) buckets.

The reference has no joins at all (SURVEY §2.3); this is engine
extension surface alongside the as-of join (ops/asof.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    pt_col: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= pt <= end``, both inclusive), equi-keyed on ``keys``.

    Output columns: all of ``points``' + the interval's columns.  The
    bucket column is internal and dropped.  ``how='inner'`` (points in
    no interval drop) or ``'left'`` (kept with null interval cols)."""
    b = F.lit(bucket_seconds)
    p = points.withColumn("_ib", (F.unix_timestamp(F.col(pt_col)) / b).cast("long"))
    iv = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    # containment goes INTO the join condition (not a post-filter), so
    # left-join rows whose bucket matched but containment failed are
    # null-extended, not dropped; a point matches a multi-bucket
    # interval exactly once (in the point's own bucket)
    cond = [p["_ib"] == iv["_ib"]]
    cond += [p[k] == iv[k] for k in keys]
    cond += [p[pt_col] >= iv[start_col], p[pt_col] <= iv[end_col]]
    joined = p.join(iv, cond, how)
    out = joined
    for c in [p["_ib"], iv["_ib"]] + [iv[k] for k in keys]:
        out = out.drop(c)
    return out


def rollup_from_partials(
    hourly: DataFrame,
    window_start_col: str,
    coarse_duration: str = "1 day",
    sum_cols: Sequence[str] = (),
    count_col: str | None = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Continuous-aggregate pattern (hypertable-style): derive a coarser
    rollup from already-materialized fine partials instead of rescanning
    raw events — at 100 TB the daily rollup reads |hours| rows, not
    |events|.  Sums/counts re-aggregate exactly (algebraic); avg is
    derived downstream as sum/count."""
    w = F.window(window_start_col, coarse_duration)
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_col:
        aggs.append(F.sum(count_col).alias(count_col))
    return (
        hourly.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"), *keys, *sum_cols, *( [count_col] if count_col else [] ))
    )
