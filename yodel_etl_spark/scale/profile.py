"""ANALYZE-style column profiler — the statistics pass a pipeline runs
before deciding join strategies, partition counts, and DQ rules for an
unfamiliar table (the operational twin of the declarative gate in
:mod:`yodel_etl_spark.scale.dq`: the gate checks rules you already
know; the profiler tells you which rules to write).

Scale shape: every statistic here is computed from ONE unpivoted
value-count aggregation, and every rollup aggregate (sum / count /
min / max over a composite key) is map-side combinable — the shuffle
after the (column, value) count carries one partial row per column per
partition, never a per-value funnel.  The deterministic top value rides
a fixed-width composite sort key (zero-padded inverted count ‖ value)
reduced with plain ``min``, so "highest count, ties to the smallest
value" needs no non-combinable window over the value table.

100 TB swaps (both already in-repo): exact ``n_distinct`` →
``approx_count_distinct`` (HLL partials, :mod:`scale.sketch` shows the
mergeable-grain version) and the exact top value → Misra-Gries heavy
hitters (:func:`scale.sketch.heavy_hitters`) when a column's value set
itself outgrows a shuffle; wide text columns profile their digest
rather than the raw string (``F.md5``) at that point.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: inverted-count prefix base for the top-value composite key — bounds
#: the representable per-value count at 1e12-1 rows, far past any
#: single value's frequency before the Misra-Gries swap applies
_KEY_BASE = 999_999_999_999


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile of ``cols``: row/null/distinct counts, lexical
    min/max of the string form, numeric min/max where values parse as
    doubles (``try_cast`` — NULL for non-numeric columns), and the
    deterministic top value (highest count, ties to the smallest value)
    with its count.

    One unpivot (``stack`` — a narrow scan-stage projection), one
    map-side-combined (column, value) count, one per-column rollup of
    combinable aggregates.  Values profile through their canonical
    string cast so one output schema serves every column type; numeric
    bounds are recovered via ``try_cast`` (bigints round-trip the cast
    exactly).
    """
    pairs: list[Column] = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    unpivoted = df.select(
        F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val")
    )
    vc = unpivoted.groupBy("col_name", "val").agg(F.count(F.lit(1)).alias("cnt"))
    key = F.when(
        F.col("val").isNotNull(),
        F.concat(
            F.lpad((F.lit(_KEY_BASE) - F.col("cnt")).cast("string"), 12, "0"),
            F.lit("|"),
            F.col("val"),
        ),
    )
    num = F.col("val").try_cast("double")
    prof = vc.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_null"),
        F.sum(F.when(F.col("val").isNotNull(), 1).otherwise(0)).alias("n_distinct"),
        F.min("val").alias("min_s"),
        F.max("val").alias("max_s"),
        F.round(F.min(num), 6).alias("num_min"),
        F.round(F.max(num), 6).alias("num_max"),
        F.min(key).alias("_k"),
    )
    return prof.select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_s",
        "max_s",
        "num_min",
        "num_max",
        F.substring(F.col("_k"), 14, 2_000_000_000).alias("top_value"),
        (F.lit(_KEY_BASE) - F.substring(F.col("_k"), 1, 12).cast("long")).alias(
            "top_count"
        ),
    )
