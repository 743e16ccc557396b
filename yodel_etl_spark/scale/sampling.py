"""Deterministic dataset splitting for training pipelines.

``randomSplit``/``sampleBy`` draw per-row randoms — resampling a grown
corpus reshuffles membership, leaking eval docs into train.  The
standard fix at corpus scale is HASH bucketing: a row's split is a pure
function of its key, so membership is stable under re-runs, appends,
and engine changes, and needs no shuffle at all (narrow projection).

md5 (not xxhash64) on purpose: md5 is bit-identical across engines
(Spark, DuckDB, Python), so splits are portable and oracle-checkable;
the 16-bit prefix gives 65536 lattice points — granular enough for
percent-level fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in ``[0, buckets)``: first 4 hex chars of
    ``md5(key)`` mod buckets.  DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4)) AS INTEGER) % buckets``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
        % buckets
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``hash_bucket(stratum || '|' || key) < rates[stratum]`` (percent).

    The hash mixes the stratum INTO the key, so the same key sampled
    under two strata (or the same rate) makes independent decisions —
    plain ``hash(key) < p`` would select the identical key subset in
    every stratum, correlating samples across strata.

    Same posture as :func:`hash_split`: pure narrow projection + filter
    (no shuffle, no RNG state), append-stable, identical under re-runs
    and engine changes — this is how a 100 TB corpus rebalances source
    mix without resampling churn.  Strata absent from ``rates`` keep
    ``default_pct`` percent.
    """
    for stratum, pct in rates.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {stratum!r} must be 0..100, got {pct}")
    b = hash_bucket(
        F.concat_ws("|", F.col(strata_col).cast("string"), F.col(key_col).cast("string")),
        100,
    )
    pct_expr: Column = F.lit(default_pct)
    for stratum, pct in sorted(rates.items()):
        pct_expr = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(pct_expr)
    return df.where(b < pct_expr)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Label each row train/val/… by deterministic hash bucket.

    ``fractions`` maps label -> percent (must total 100); default
    80/10/10 train/val/test.  Narrow (no shuffle), append-stable, and
    reproducible everywhere md5 exists."""
    fractions = fractions or {"train": 80, "val": 10, "test": 10}
    if sum(fractions.values()) != 100:
        raise ValueError(f"fractions must total 100, got {fractions}")
    b = hash_bucket(F.col(key_col), 100)
    expr: Column | None = None
    hi = 0
    for label, pct in fractions.items():
        hi += pct
        expr = F.when(b < hi, F.lit(label)) if expr is None else expr.when(b < hi, F.lit(label))
    return df.withColumn(split_col, expr)
