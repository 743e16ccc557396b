"""Heavy-hitters (approximate top-k) sketch — Misra-Gries partials,
merged distributively.

The exact top-k by count (``groupBy(key).count() → orderBy → limit``,
see ``top_events_global``) shuffles one row per DISTINCT key; at 100 TB
with billion-key cardinality the aggregation state itself is the
bottleneck.  The Misra-Gries summary bounds per-task state at
``capacity`` counters with the classic guarantee: every item with true
frequency > n/capacity survives, and each kept estimate undercounts by
at most the partition's decrement total.

Distributed shape (all Arrow-batched, no driver loop):

  1. ``mapInPandas`` — one bounded MG summary per input partition;
     emits (item, est) counter rows plus one (NULL, decrements) row
     carrying the partition's error budget.
  2. ``groupBy(item)`` over capacity×partitions rows — tiny shuffle,
     independent of input size or key cardinality.
  3. Bounds: est ≤ true ≤ est + Σ decrements (the merged summary's
     global error), surfaced as ``count_lo`` / ``count_hi`` columns.

Mergeability is the point: partials combine associatively, so the same
operator serves batch, streaming ``foreachBatch`` accumulation, and
hierarchical (per-day → per-month) rollups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),  # NULL = decrement row
        T.StructField("est", T.LongType()),
    ]
)


def mg_partials(df: DataFrame, key_col: str, capacity: int = 1024) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``key_col``.

    Each partition yields ≤ capacity (item, est) rows and one
    (NULL, decrements) row.  State is O(capacity) regardless of input
    size — the property that lets a 1000-executor job sketch a
    billion-key column without aggregation-state spill.

    NULL keys are excluded from the sketch: NULL is reserved as the
    decrement-marker row in PARTIAL_SCHEMA, and pandas ``astype(str)``
    would otherwise alias them with genuine ``'None'`` strings."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        decrements = 0
        for pdf in batches:
            for v in pdf[key_col].astype(str):
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all: the O(1)-amortized dict sweep
                    decrements += 1
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        items = list(counters.items()) + [(None, decrements)]
        yield pd.DataFrame(items, columns=["item", "est"])

    return (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .where(F.col(key_col).isNotNull())
        .mapInPandas(run, schema=PARTIAL_SCHEMA)
    )


def merge_partials(partials: DataFrame, k: int = 10) -> DataFrame:
    """Merge any union of MG partial frames into the bounded top-k.

    Partials are associative data: frames from different partitions,
    different micro-batches (streaming ``foreachBatch`` appends), or
    different days (hierarchical rollup) merge identically — sum the
    counters, sum the decrement rows into the global error bound."""
    merged = partials.where(F.col("item").isNotNull()).groupBy("item").agg(
        F.sum("est").alias("count_lo")
    )
    err = partials.where(F.col("item").isNull()).agg(
        F.coalesce(F.sum("est"), F.lit(0)).alias("err")
    )
    return (
        merged.crossJoin(F.broadcast(err))  # 1-row bound → broadcast
        .select(
            "item",
            "count_lo",
            (F.col("count_lo") + F.col("err")).alias("count_hi"),
        )
        .orderBy(F.col("count_lo").desc(), "item")
        .limit(k)
    )


def approx_top_k(
    df: DataFrame, key_col: str, k: int = 10, capacity: int = 1024
) -> DataFrame:
    """Top-k items by estimated count with deterministic error bounds.

    Returns (item, count_lo, count_hi) ordered by count_lo desc, item:
    ``count_lo ≤ true ≤ count_hi``; every item with true count >
    n/capacity is guaranteed present in the merged summary.  When no
    partition ever decremented (capacity ≥ per-partition distinct
    keys) the sketch degrades gracefully to EXACT counts — which is
    what the parity tests pin against the plain groupBy."""
    from yodel_etl_spark.session import ship_package

    ship_package(df.sparkSession)
    return merge_partials(mg_partials(df, key_col, capacity), k)


def hll_distinct_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    rollup_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable approximate-distinct rollup (Apache DataSketches HLL,
    built into Spark 4): per-``(keys, rollup_col)`` sketches via
    ``hll_sketch_agg``, then ``hll_union_agg`` over the rollup column —
    the continuous-aggregate pattern for distinct counts at 100 TB.

    Why not plain ``approx_count_distinct``: its per-group estimates
    cannot be COMBINED — a day-level distinct-user table is useless for
    month-level questions because distincts don't sum.  HLL sketches
    union losslessly, so the fine partials (one small binary per (key,
    day)) answer every coarser grain without rescanning raw data; the
    same property merges map-side partials, so the shuffle carries one
    sketch per partition per group, never raw values.

    Returns one row per ``keys``: the unioned estimate plus the number
    of fine partials merged.  Estimate error ≈ 1.04/sqrt(2^lg_k)
    (~1.6 % at the default lg_k=12); accuracy vs exact distinct is
    asserted in tests.
    """
    partials = df.groupBy(*keys, rollup_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_partials"),
    )


# ------------------------------------------------------ count-min sketch
def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public paper) of
    a key column as a plain (d, bucket, cnt) counter table — pure
    column algebra, no Python in the row path.

    Each row explodes into ``depth`` narrow coordinates
    ``(d, xxhash64(d, key) mod width)`` and the build is one
    map-side-combined count over ``depth·width`` possible cells — the
    shuffle carries at most that many rows per partition, independent
    of input size or key cardinality (the same bounded-state rationale
    as Misra-Gries, but answering point frequency queries for ANY key
    instead of only the heavy ones).  Sketches MERGE by unioning the
    counter tables and summing per cell (see :func:`cms_merge`), so the
    operator serves batch, foreachBatch accumulation, and hierarchical
    rollups alike.  Guarantee: estimates never undercount; an estimate
    exceeds the true count by more than 2n/width with probability
    ≤ 2^-depth."""
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.pmod(
                        F.xxhash64(F.lit(d), F.col(key_col).cast("string")), width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    )
    return (
        df.select(coords.alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of counter tables — exact: merged sketch ==
    sketch of the concatenated inputs, row for row."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency upper bounds for a key batch: re-derive each
    key's ``depth`` coordinates, left-join the (broadcast — ≤
    depth·width rows) counter table, and take the per-key MIN across
    depths; a missing cell is a hard zero.  Returns (key, est)."""
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.pmod(
                        F.xxhash64(F.lit(d), F.col(key_col).cast("string")), width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    )
    ex = keys.select(F.col(key_col), coords.alias("c")).select(
        key_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket")
    )
    joined = ex.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


# ------------------------------------------------------- quantile sketch
#: weighted-sample quantile summary rows
QUANTILE_SCHEMA = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("weight", T.DoubleType()),
    ]
)


def quantile_partials(df: DataFrame, col: str, capacity: int = 256) -> DataFrame:
    """Deterministic mergeable quantile summary: per-partition rank
    sampling at bounded size.

    ``percentile_approx`` answers one query inside one job; a PIPELINE
    needs the sketch itself — persistable today, mergeable with
    tomorrow's (incremental profiling, per-day → per-month rollups, the
    same posture as the MG/HLL/CMS partials above).  Each input
    partition sorts its values and keeps ``capacity`` equally-spaced
    ranks as (value, weight = n_p/capacity) rows; partitions smaller
    than ``capacity`` emit their values exactly (weight 1).

    Guarantee (deterministic, no randomness anywhere): within one
    partition the weighted CDF is off by < n_p/capacity at any
    threshold, and the per-partition errors SUM to
    ``Σ n_p/capacity = n/capacity`` — so any quantile read off the
    merged summary has rank error < ``n/capacity``, i.e. ε = 1/capacity
    regardless of partition count.  Merging = row union (associative,
    commutative); ``quantile_compress`` re-bounds a grown union at +ε
    additional error per compression.  Shuffle cost: ≤ capacity rows
    per partition, independent of data size.

    NULLs are excluded (SQL aggregate semantics)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        chunks = [pdf[col].dropna().to_numpy(dtype="float64") for pdf in batches]
        vals = np.sort(np.concatenate(chunks)) if chunks else np.array([])
        n = len(vals)
        if n == 0:
            return
        if n <= capacity:
            yield pd.DataFrame({"value": vals, "weight": np.ones(n)})
            return
        # rank i*(n/capacity) + center offset: the sample point sits in
        # the middle of the n/capacity-wide rank stratum it represents
        idx = ((np.arange(capacity) + 0.5) * n / capacity).astype("int64")
        yield pd.DataFrame(
            {"value": vals[idx], "weight": np.full(capacity, n / capacity)}
        )

    from yodel_etl_spark.session import ship_package

    ship_package(df.sparkSession)
    return df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        run, QUANTILE_SCHEMA
    )


def quantile_compress(partials: DataFrame, capacity: int = 256) -> DataFrame:
    """Re-bound a (grown) union of quantile summaries to ≤ ``capacity``
    rows, adding ≤ W/capacity rank error (W = total weight).

    Bounded input by construction (unions of per-partition summaries),
    so the single-partition window over it is NOT a scale risk — the
    corpus never flows through here, only sketch rows."""
    from pyspark.sql import Window

    w = Window.orderBy("value", "weight").rowsBetween(Window.unboundedPreceding, 0)
    tot = partials.agg(F.sum("weight").alias("W"))
    stratum = F.col("W") / capacity
    return (
        partials.withColumn("cum", F.sum("weight").over(w))
        .crossJoin(F.broadcast(tot))  # 1-row bound → broadcast
        .withColumn("bucket", F.least(
            F.floor((F.col("cum") - F.lit(1e-9)) / stratum), F.lit(capacity - 1)
        ))
        .groupBy("bucket")
        .agg(F.max("value").alias("value"), F.sum("weight").alias("weight"))
        .select("value", "weight")
    )


def quantile_query(partials: DataFrame, probs: list[float]) -> DataFrame:
    """Read quantiles off a merged summary: smallest sampled value whose
    cumulative weight reaches p·W.  Returns (p, value) rows.

    Same boundedness note as ``quantile_compress`` — this orders sketch
    rows, never data rows."""
    from pyspark.sql import Window

    w = Window.orderBy("value", "weight").rowsBetween(Window.unboundedPreceding, 0)
    tot = partials.agg(F.sum("weight").alias("W"))
    cum = partials.withColumn("cum", F.sum("weight").over(w)).crossJoin(
        F.broadcast(tot)
    )
    picks = [
        cum.where(F.col("cum") >= F.lit(float(p)) * F.col("W") - 1e-9)
        .orderBy("value", "weight")
        .limit(1)
        .select(F.lit(float(p)).alias("p"), F.col("value"))
        for p in probs
    ]
    out = picks[0]
    for df_p in picks[1:]:
        out = out.unionByName(df_p)
    return out
