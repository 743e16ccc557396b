"""Keyed table diff — the reconciliation report every migration,
backfill, and CDC pipeline runs: given two snapshots of a keyed table,
classify every key as ``added`` / ``removed`` / ``changed`` /
``unchanged`` and say WHICH columns changed.

The natural companion to :mod:`yodel_etl_spark.ops.cdc` (apply_changes
produces snapshots; table_diff audits them — ``diff(apply(base, log),
base)`` recovers the log's net effect, pinned in tests) and to the
shard manifest (io/shards.py verifies bytes; this verifies VALUES).

Scale shape: ONE full-outer join on the key — co-partitioned, both
sides shuffle once on the same key (zero exchanges on a snapshot
bucketed by the key, io/bucketed.py); per-row classification and the
changed-column list are pure column algebra over null-safe
comparisons (``eqNullSafe``, so NULL→value and value→NULL transitions
count as changes and NULL==NULL does not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """``(keys…, status, changed_cols)`` per key: ``added`` (key only
    in ``new``), ``removed`` (only in ``old``), ``changed`` (present in
    both, any non-key column differs null-safely), else ``unchanged``
    (dropped unless ``include_unchanged``).  ``changed_cols`` is the
    comma-joined sorted list of differing columns ('' except for
    ``changed`` rows).  Both frames must share the same schema; one row
    per key each (the snapshot contract)."""
    keys = list(keys)
    if old.columns != new.columns:
        raise ValueError(
            f"schema mismatch: {old.columns} vs {new.columns}"
        )
    value_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in value_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in value_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = o[f"_ko_{k}"].eqNullSafe(n[f"_kn_{k}"])
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    key_out = [
        F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k) for k in keys
    ]
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    )
                    for c in value_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *key_out,
        status.alias("status"),
        F.when(
            status == "changed", F.array_join(diffs, ",")
        ).otherwise(F.lit("")).alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out
