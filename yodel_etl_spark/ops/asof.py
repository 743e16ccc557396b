"""As-of (backward temporal) join — an engine extension beyond the
reference's operator set (SURVEY §2.3: joins come free from Spark; the
time-series as-of shape is the one genuinely missing primitive).

Semantics: for every left row, attach the single right row with the
greatest ``right_ts ≤ left_ts`` within the same key (ties on the key's
timeline must be pre-deduplicated by the caller — see the query's
``max_by`` dedup — so the match is unique and deterministic).

Spark-first plan — the union-window formulation, NOT a range cross
join:

    union(tagged left, tagged right)            narrow
    → window last(_r, ignorenulls)              ONE shuffle on key,
        order by (_ts, _side)                   sort within key
    → filter left rows, flatten payload         narrow

Cost is one exchange + per-key sort: linear in |L|+|R|, versus the
inequality-join's |L|×|R| blowup.  At 100 TB the caveat is per-key
window size: a single hot key's timeline lands in one task — mitigate
by time-bucketing the key (join key → (key, day)) and stitching bucket
boundaries with a second pass over each bucket's last row (standard
practice; not needed at test SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of-backward join; right payload columns arrive as
    ``{prefix}{col}`` (NULL when no right row precedes the left row)."""
    r_payload = F.struct(*[F.col(c) for c in right_value_cols])
    r_struct_type = right.select(r_payload.alias("_r")).schema["_r"].dataType
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    l_struct_type = left.select(l_payload.alias("_l")).schema["_l"].dataType

    tagged_r = right.select(
        *[F.col(c) for c in key_cols],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts first on tied timestamps (<= semantics)
        r_payload.alias("_r"),
        F.lit(None).cast(l_struct_type).alias("_l"),
    )
    tagged_l = left.select(
        *[F.col(c) for c in key_cols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        l_payload.alias("_l"),
    )
    combined = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.where(F.col("_l").isNotNull()).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_value_cols],
    )
    return out


def asof_join_backward_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """The hot-key form of :func:`asof_join_backward`: identical output,
    but the big window partitions on ``(key, time-bucket)`` instead of
    the bare key, so one key's entire timeline no longer lands in a
    single task — the mitigation the plain form's docstring names.

    Exactness: a left row's match is either in its own bucket (the
    local window finds it) or in an earlier one; a per-``(key,
    bucket)`` last-payload summary, cumulated per key in bucket order
    and lagged by one (the ``carry``), covers the earlier buckets, and
    ``coalesce(local, carry)`` is exactly the plain form's result.

    Cost: the full data shuffles ONCE on ``(key, bucket)`` (same volume
    as the plain form, finer keys); the summary/carry frames hold one
    row per non-empty ``(key, bucket)`` — negligible beside the data.
    Pick ``bucket_seconds`` so a hot key's densest bucket fits a task;
    ties on a key's timeline must be pre-deduplicated as in the plain
    form.
    """
    r_payload = F.struct(*[F.col(c) for c in right_value_cols])
    r_struct_type = right.select(r_payload.alias("_r")).schema["_r"].dataType
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    l_struct_type = left.select(l_payload.alias("_l")).schema["_l"].dataType

    def bucket(ts: str):
        return (F.unix_timestamp(F.col(ts)) / F.lit(bucket_seconds)).cast("long")

    tagged_r = right.select(
        *[F.col(c) for c in key_cols],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        bucket(right_ts).alias("_b"),
        r_payload.alias("_r"),
        F.lit(None).cast(l_struct_type).alias("_l"),
    )
    tagged_l = left.select(
        *[F.col(c) for c in key_cols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        bucket(left_ts).alias("_b"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        l_payload.alias("_l"),
    )
    combined = tagged_r.unionByName(tagged_l)

    # per-(key, bucket) last right payload — one narrow row each
    per_bucket = (
        combined.where(F.col("_r").isNotNull())
        .groupBy(*key_cols, "_b")
        .agg(F.max_by("_r", F.col("_ts")).alias("_last_r"))
    )
    # carry = latest right payload from any EARLIER bucket of the key
    domain = combined.select(*key_cols, "_b").distinct()
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        domain.join(per_bucket, [*key_cols, "_b"], "left")
        .withColumn("_run", F.last("_last_r", ignorenulls=True).over(wb))
        .withColumn(
            "_carry", F.lag("_run").over(Window.partitionBy(*key_cols).orderBy("_b"))
        )
        .select(*key_cols, "_b", "_carry")
    )

    w = (
        Window.partitionBy(*key_cols, "_b")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        combined.withColumn("_local", F.last("_r", ignorenulls=True).over(w))
        .join(carry, [*key_cols, "_b"], "left")
        .withColumn("_m", F.coalesce(F.col("_local"), F.col("_carry")))
    )
    return matched.where(F.col("_l").isNotNull()).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_value_cols],
    )
