"""Skew-handling utilities: salted two-phase aggregation and the
replicated-salt join.

Why these exist even with AQE on (session.py enables
``spark.sql.adaptive.skewJoin``): AQE can split an oversized *sort-merge
join* partition at runtime, but it cannot help when

  * a hash **aggregation** key is ultra-low-cardinality (5 event types →
    5 reduce tasks own all 100 TB of partials; 995 executors idle), or
  * a skewed join's hot key must still land on ONE task because the
    operator after it needs key-grouped input, or
  * the skew is in a **distinct** aggregate, where the two-shuffle
    expand plan moves every (group, value) pair to the group's single
    reducer.

Both utilities are exact rewrites — results are identical to the
unsalted form (asserted against the plain form and the DuckDB oracle in
tests/queries), only the shuffle key space changes.

Reference parity note: the reference is single-process pandas
(`normalize_parks_json.py:219-222` value_counts runs on one host) so it
never faces reducer skew; these are 100 TB-posture extensions per
SURVEY §2.4 / BASELINE.json north star.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"

_SALTABLE_HOW = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"}


def with_salt(df: DataFrame, spread_by: Sequence[str], buckets: int) -> DataFrame:
    """Add a deterministic salt column in ``[0, buckets)`` derived from
    ``xxhash64(spread_by)``.

    Deterministic on purpose (no ``rand()``): retries/speculative tasks
    recompute identical salts, and results stay reproducible run-to-run.
    Pick ``spread_by`` columns with high cardinality *within* each hot
    group key (a row id, the distinct-target column) so the hot key's
    rows fan out across all ``buckets`` reducers."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in spread_by]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    spread_by: Sequence[str],
    partial: Sequence[Column],
    final: Sequence[Column],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase (salted) aggregation: ``groupBy(group + salt)`` computes
    ``partial`` aggregates, then ``groupBy(group)`` merges them with
    ``final`` (expressions over the partial columns).

    Exactness contract: ``final ∘ partial`` must equal the direct
    aggregate.  For algebraic aggs that is ``sum∘sum``, ``min∘min``,
    ``sum∘count``.  For COUNT DISTINCT it holds iff the salt is a
    function of the distinct column (every distinct value lands in
    exactly one bucket, so per-bucket distinct counts sum exactly) —
    pass the distinct column as ``spread_by``.

    Scale: phase 1 spreads the hot key over ``buckets × |groups|``
    reducers and shrinks data to one row per (group, salt); phase 2
    shuffles only those tiny partials.  This is the classic fix for
    low-cardinality groupBy and per-group distinct at 100 TB.
    """
    salted = with_salt(df, spread_by, buckets)
    p = salted.groupBy(*group_cols, SALT_COL).agg(*partial)
    return p.groupBy(*group_cols).agg(*final)


def replicate_salt_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    spread_by: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew join: salt the (large, skewed) ``left`` side into ``buckets``
    sub-keys and replicate every ``right`` row once per bucket, so a hot
    join key's rows spread over ``buckets`` reducers instead of one.

    ``spread_by`` are left-side columns that vary within the hot key
    (e.g. the fact table's line number / row id).  ``right`` grows
    ``buckets``-fold — size the bucket count so ``|right| × buckets``
    stays far below the left side (hot-key-only salting with an AQE-style
    skew-key list is the refinement when right is itself large).

    Only left-preserving joins are exact under right-replication
    (unmatched right rows would appear ``buckets`` times in
    right/full/anti output), so ``how`` is restricted accordingly.
    """
    if how not in _SALTABLE_HOW:
        raise ValueError(
            f"replicate_salt_join supports {sorted(_SALTABLE_HOW)}, got {how!r}"
        )
    lsalt = with_salt(left, spread_by, buckets)
    rsalt = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i).cast("long") for i in range(buckets)]))
    )
    return lsalt.join(rsalt, [*on, SALT_COL], how).drop(SALT_COL)
