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

100 TB swaps — WIRED as ``profile_table(..., approx=True)``: exact
``n_distinct`` → ``approx_count_distinct`` (HLL partials) and the
exact top value → Misra-Gries heavy hitters
(:func:`scale.sketch.mg_partials` on a composite column‖value key),
for when a column's value set itself outgrows the (column, value)
count shuffle.  The approx plan's only value-grain state is the
bounded per-partition MG summary + HLL registers — the exchange
carries one profile partial per column per partition plus ≤
``capacity`` counter rows per partition, independent of value
cardinality.  Wide text columns should profile their digest rather
than the raw string (``F.md5``) at that point.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: inverted-count prefix base for the top-value composite key — bounds
#: the representable per-value count at 1e12-1 rows, far past any
#: single value's frequency before the Misra-Gries swap applies
_KEY_BASE = 999_999_999_999


def profile_table(
    df: DataFrame,
    cols: Sequence[str],
    approx: bool = False,
    capacity: int = 1024,
) -> DataFrame:
    """Per-column profile of ``cols``: row/null/distinct counts, lexical
    min/max of the string form, numeric min/max where values parse as
    doubles (``try_cast`` — NULL for non-numeric columns), and the
    deterministic top value (highest count, ties to the smallest value)
    with its count.

    Exact form: one unpivot (``stack`` — a narrow scan-stage
    projection), one map-side-combined (column, value) count, one
    per-column rollup of combinable aggregates.  Values profile through
    their canonical string cast so one output schema serves every
    column type; numeric bounds are recovered via ``try_cast`` (bigints
    round-trip the cast exactly).

    ``approx=True`` (same output schema) is the value-cardinality
    escape hatch: ``n_distinct`` becomes ``approx_count_distinct``
    (HLL partials) and the top value rides a Misra-Gries summary with
    ``capacity`` counters per partition (``top_count`` is then the MG
    lower-bound estimate; when no partition ever decremented —
    capacity ≥ per-partition distinct values — both degrade to EXACT,
    which the parity test pins).  No (column, value) count shuffle
    anywhere in the approx plan.
    """
    if approx:
        return _profile_table_approx(df, cols, capacity)
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


#: column‖value separator for the approx path's composite MG key — the
#: ASCII unit separator, absent from sane column names (values MAY
#: contain it; the split recovers the value as everything after the
#: FIRST separator, so only a column name containing \\x1f could break
#: the decomposition)
_SEP = "\x1f"


def _profile_table_approx(
    df: DataFrame, cols: Sequence[str], capacity: int
) -> DataFrame:
    """Sketch-backed profile: one unpivot feeding (a) a per-column
    rollup of combinable aggregates with HLL distinct partials and (b)
    a bounded Misra-Gries pass keyed on column‖value for the top value.
    Both sides carry cardinality-independent state."""
    from yodel_etl_spark.scale.sketch import mg_partials
    from yodel_etl_spark.session import ship_package

    ship_package(df.sparkSession)
    pairs: list[Column] = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    unpivoted = df.select(
        F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val")
    ).persist()  # scanned by the rollup AND the MG pass
    num = F.col("val").try_cast("double")
    prof = unpivoted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_null"),
        F.approx_count_distinct("val").alias("n_distinct"),
        F.min("val").alias("min_s"),
        F.max("val").alias("max_s"),
        F.round(F.min(num), 6).alias("num_min"),
        F.round(F.max(num), 6).alias("num_max"),
    )
    keyed = unpivoted.select(
        F.concat_ws(_SEP, F.col("col_name"), F.col("val")).alias("k")
    ).where(F.col("val").isNotNull())
    partials = mg_partials(keyed, "k", capacity)
    merged = (
        partials.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
        .select(
            F.split_part(F.col("item"), F.lit(_SEP), F.lit(1)).alias("col_name"),
            F.substr(
                F.col("item"), F.instr(F.col("item"), _SEP) + F.lit(1)
            ).alias("val"),
            "est",
        )
    )
    # per column: highest estimate, ties to the smallest value — the
    # merged summary is ≤ capacity×partitions rows, so the struct-min
    # fold is tiny
    top = merged.groupBy("col_name").agg(
        F.min(F.struct((-F.col("est")).alias("ne"), F.col("val"))).alias("_t")
    )
    out = prof.join(top, "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_s",
        "max_s",
        "num_min",
        "num_max",
        F.col("_t.val").alias("top_value"),
        (-F.col("_t.ne")).alias("top_count"),
    )
    from yodel_etl_spark.session import register_persisted

    return register_persisted(out, unpivoted)
