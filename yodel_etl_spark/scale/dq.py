"""Data-quality expectations: declarative row-level constraints folded
into ONE aggregation pass — the validation gate a production pipeline
runs before shipping a corpus or publishing a table (Deequ/Great-
Expectations shape, engine-native).

Scale posture: every row-level rule compiles to a ``sum(violation)``
term inside a single global aggregate, so N rules cost one narrow scan
with map-side partial aggregation (one partial row per partition — no
shuffle of data rows, only of N-term partials).  Uniqueness is the one
rule that inherently needs the key's global view; it rides the same
output frame via ``count(*) - count(DISTINCT key)``.  At 100 TB swap
the exact distinct for the salted two-phase form (``scale/skew.py``)
or ``approx_count_distinct`` when the gate only needs a threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named row-level constraint: ``condition`` must hold on every
    row (NULL condition counts as a violation — SQL three-valued logic
    would otherwise let NULLs slip through a ``value > 0`` check)."""

    name: str
    condition: Column


def expect_report(
    df: DataFrame,
    rules: list[Expectation],
    unique_key: str | None = None,
) -> DataFrame:
    """Violation report: ``(rule, n_violations, n_rows, pass_frac)``,
    one row per rule, ``pass_frac`` rounded to 6 dp after exact integer
    counts (deterministic across engines).

    All rules evaluate in one aggregate over one scan; ``unique_key``
    adds a ``unique:<key>`` rule counting duplicate-key rows
    (``count(*) - count(DISTINCT key)``; NULL keys count toward the
    violation tally since DISTINCT ignores them — pair with a not-null
    rule to attribute them separately).
    """
    terms = [
        # coalesce the SUM itself: over zero rows SUM is NULL, and a NULL
        # violation count reads as "unknown" downstream (the CLI gate
        # crashed ranking rules on an empty partition) — an empty input
        # violates nothing
        F.coalesce(
            F.sum(F.when(F.coalesce(r.condition, F.lit(False)), 0).otherwise(1)),
            F.lit(0),
        ).alias(f"v_{i}")
        for i, r in enumerate(rules)
    ]
    if unique_key is not None:
        terms.append(F.count_distinct(F.col(unique_key)).alias("v_uniq"))
    agg = df.agg(F.count(F.lit(1)).alias("n_rows"), *terms)

    pairs = [
        F.struct(F.lit(r.name).alias("rule"), F.col(f"v_{i}").alias("n_violations"))
        for i, r in enumerate(rules)
    ]
    if unique_key is not None:
        pairs.append(
            F.struct(
                F.lit(f"unique:{unique_key}").alias("rule"),
                (F.col("n_rows") - F.col("v_uniq")).alias("n_violations"),
            )
        )
    exploded = agg.select(
        "n_rows", F.explode(F.array(*pairs)).alias("e")
    )
    return exploded.select(
        F.col("e.rule").alias("rule"),
        F.col("e.n_violations").alias("n_violations"),
        F.col("n_rows").alias("n_rows"),
        # vacuous pass on an empty table (0/0 would be NULL and read as
        # "gate unknown" — there are no rows to violate anything)
        F.when(F.col("n_rows") == 0, F.lit(1.0))
        .otherwise(
            F.round(
                (F.col("n_rows") - F.col("e.n_violations")).cast("double")
                / F.col("n_rows").cast("double"),
                6,
            )
        )
        .alias("pass_frac"),
    )


def iqr_outlier_report(
    df: DataFrame,
    col: str,
    k: float = 1.5,
    capacity: int = 256,
) -> DataFrame:
    """Tukey-fence outlier screen over a numeric column, driven by the
    mergeable quantile summary (``scale.sketch.quantile_partials``):
    one row reporting the [q1 − k·IQR, q3 + k·IQR] fences and how many
    rows fall outside them.

    Why the sketch and not ``percentile_approx``: the SAME summary a
    profiling pipeline already maintains incrementally (per-day partials
    unioned into per-month) answers here with no second scan of history
    — today's fence positions come from the accumulated sketch, and only
    the outlier COUNT touches the data being gated.  Quantile rank error
    is the sketch's deterministic ε = 1/capacity (fence VALUES shift by
    at most that rank band; the count is exact against the reported
    fences).

    Scale shape: one bounded-state sketch pass + one map-side-combined
    conditional count — no data-row shuffle anywhere."""
    from yodel_etl_spark.scale.sketch import quantile_partials, quantile_query

    sk = quantile_partials(df, col, capacity=capacity)
    qs = {r["p"]: r["value"] for r in quantile_query(sk, [0.25, 0.75]).collect()}
    q1, q3 = qs[0.25], qs[0.75]
    lo = q1 - k * (q3 - q1)
    hi = q3 + k * (q3 - q1)
    c = F.col(col).cast("double")
    return df.agg(
        F.lit(col).alias("column"),
        F.lit(float(lo)).alias("fence_lo"),
        F.lit(float(hi)).alias("fence_hi"),
        F.coalesce(F.sum(F.when((c < lo) | (c > hi), 1).otherwise(0)), F.lit(0)).alias(
            "n_outliers"
        ),
        F.count(c).alias("n_rows"),
    )


def psi_drift(
    df: DataFrame,
    bin_col: Column,
    in_a: Column,
) -> DataFrame:
    """Population-stability report between two slices of one frame —
    the drift monitor a corpus pipeline runs when a new crawl batch,
    source, or time window lands: bin a signal (length, quality score,
    token count), compare the bin distribution of slice A (``in_a``
    true) against slice B (the rest), and report each bin's PSI term.
    ``PSI = Σ (p_a − p_b)·ln(p_a/p_b)``; < 0.1 is the conventional
    "stable" band, > 0.25 "shifted, investigate".

    One corpus scan: counts fold to bin grain in a single map-side-
    combined groupBy (the data never shuffles — only bin-grain
    partials); totals come from a second aggregate OVER THE BIN TABLE
    (bins-many rows) broadcast back as one row.  ``bin_col`` must be a
    deterministic, data-independent binning expression (integer
    arithmetic, not quantiles) so the report is oracle-exact and
    comparable across runs — for quantile bins, freeze the cutpoints
    first (scale/sketch.py quantile summary) and pass the comparison.

    Cross-engine determinism: probabilities and ratios are exact
    integer counts pushed through correctly-rounded IEEE ``*``/``/``;
    the one transcendental (``ln``) quantizes to integer micro-nats
    (the scale/lm.py convention), and each bin's ``term_micro`` is an
    exact BIGINT — summing them is order-insensitive.  Bins where
    either side is empty report ``term_micro`` NULL (PSI is undefined
    there; the counts still surface so the report shows WHERE the new
    slice opened or abandoned a bin — often the drift signal itself).

    Returns ``(bin, n_a, n_b, term_micro)``; ``PSI ≈ sum(term_micro)/1e6``.
    """
    from yodel_etl_spark.session import register_persisted

    # PERSISTED: the bin table feeds both the totals aggregate and the
    # report join — unpinned, each branch would re-run the corpus scan
    # and groupBy; bin-grain rows only (bins-many, bounded)
    g = (
        df.groupBy(bin_col.alias("bin"))
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(in_a, 0).otherwise(1)).cast("long").alias("n_b"),
        )
        .persist()
    )
    totals = g.agg(
        F.sum("n_a").alias("na_t"), F.sum("n_b").alias("nb_t")
    )
    j = g.crossJoin(F.broadcast(totals))
    pa = F.col("n_a").cast("double") / F.col("na_t").cast("double")
    pb = F.col("n_b").cast("double") / F.col("nb_t").cast("double")
    ratio = (F.col("n_a").cast("double") * F.col("nb_t").cast("double")) / (
        F.col("n_b").cast("double") * F.col("na_t").cast("double")
    )
    lr_micro = F.round(F.log(ratio) * F.lit(1000000.0)).cast("long")
    term = F.round((pa - pb) * lr_micro.cast("double")).cast("long")
    out = j.select(
        "bin",
        "n_a",
        "n_b",
        F.when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(None).cast("long"))
        .otherwise(term)
        .alias("term_micro"),
    )
    return register_persisted(out, g)
