"""Data-quality expectations: planted violations, NULL semantics,
single-pass plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from yodel_etl_spark.scale.dq import Expectation, expect_report


def _df(spark):
    rows = [
        (1, "ok", 5),
        (2, "", None),       # empty text; NULL value
        (None, "dup", -1),   # null id; negative value
        (4, "dup", 2),
        (4, "ok", 3),        # duplicate id
    ]
    return spark.createDataFrame(rows, ["id", "text", "v"])


def test_planted_violations(spark):
    out = expect_report(
        _df(spark),
        [
            Expectation("id_not_null", F.col("id").isNotNull()),
            Expectation("text_not_empty", F.length("text") > 0),
            Expectation("v_positive", F.col("v") > 0),
        ],
        unique_key="id",
    )
    got = {r.rule: (r.n_violations, r.n_rows, r.pass_frac) for r in out.collect()}
    assert got["id_not_null"] == (1, 5, 0.8)
    assert got["text_not_empty"] == (1, 5, 0.8)
    # NULL v counts as a violation alongside the negative one
    assert got["v_positive"] == (2, 5, 0.6)
    # 5 rows, 4 distinct non-... count(DISTINCT id) ignores NULL -> 3
    assert got["unique:id"] == (2, 5, 0.6)


def test_single_pass_plan(spark):
    df = _df(spark)
    plan = (
        expect_report(df, [Expectation("p", F.col("v") > 0)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan, no data-row shuffle: the only exchange is the
    # single-partition merge of per-partition partial rows
    assert plan.count("Scan") == 1, plan
    import re

    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("SinglePartition" in ln for ln in exchanges), plan


def test_empty_input_is_a_clean_pass(spark):
    """ADVICE r3: over zero rows SUM is NULL and pass_frac is 0/0 — the
    gate must report 0 violations / vacuous pass 1.0, not crash the CLI
    ranking rules with a None count (empty partitions are a plausible
    publish-gate input)."""
    df = _df(spark).where(F.lit(False))
    out = expect_report(
        df,
        [Expectation("id_not_null", F.col("id").isNotNull())],
        unique_key="id",
    )
    got = {r.rule: (r.n_violations, r.n_rows, r.pass_frac) for r in out.collect()}
    assert got["id_not_null"] == (0, 0, 1.0)
    assert got["unique:id"] == (0, 0, 1.0)
    # the CLI's worst-rule fold must survive (max(int, n_violations))
    assert max(0, *(v[0] for v in got.values())) == 0


def test_iqr_outlier_report(spark):
    """Fences from the quantile sketch catch planted outliers; a clean
    uniform column reports (near) none."""
    import pandas as pd

    from yodel_etl_spark.scale.dq import iqr_outlier_report

    clean = [float(v) for v in range(1000)]
    planted = clean + [1e6, -1e6, 5e5]
    df = spark.createDataFrame(pd.DataFrame({"x": planted})).repartition(4)
    rep = iqr_outlier_report(df, "x").collect()[0]
    assert rep["n_rows"] == len(planted)
    # the three planted spikes are far outside any ε-shifted fence
    assert rep["n_outliers"] == 3
    assert rep["fence_lo"] < 0 < rep["fence_hi"] < 5e5
    # clean data: fences swallow everything (uniform has no tails)
    clean_rep = iqr_outlier_report(
        spark.createDataFrame(pd.DataFrame({"x": clean})).repartition(4), "x"
    ).collect()[0]
    assert clean_rep["n_outliers"] == 0


# ------------------------------------------------------------- PSI drift


def _psi_term_micro(n_a, n_b, na_t, nb_t):
    """The operator's exact arithmetic, mirrored: quantized ln, then a
    quantized term — integer micro-nats."""
    import math

    pa, pb = n_a / na_t, n_b / nb_t
    lr_micro = round(math.log((n_a * nb_t) / (n_b * na_t)) * 1e6)
    return round((pa - pb) * lr_micro)


def test_psi_identical_distributions_is_zero(spark):
    from yodel_etl_spark.scale.dq import psi_drift

    rows = [(b, s) for b in range(4) for s in ("a", "a", "b", "b")]
    df = spark.createDataFrame(rows, ["bin", "side"])
    out = psi_drift(df, F.col("bin"), F.col("side") == "a").collect()
    assert len(out) == 4
    assert all(r["term_micro"] == 0 for r in out)


def test_psi_matches_hand_computation(spark):
    from yodel_etl_spark.scale.dq import psi_drift

    # slice A: 60/30/10 over bins 0/1/2; slice B: 30/30/40
    counts = {0: (6, 3), 1: (3, 3), 2: (1, 4)}
    rows = []
    for b, (na, nb) in counts.items():
        rows += [(b, "a")] * na + [(b, "b")] * nb
    df = spark.createDataFrame(rows, ["bin", "side"])
    got = {
        r["bin"]: (r["n_a"], r["n_b"], r["term_micro"])
        for r in psi_drift(df, F.col("bin"), F.col("side") == "a").collect()
    }
    na_t, nb_t = 10, 10
    for b, (na, nb) in counts.items():
        assert got[b] == (na, nb, _psi_term_micro(na, nb, na_t, nb_t)), b
    psi = sum(v[2] for v in got.values()) / 1e6
    assert psi > 0.25  # a 30-point mass shift is well past the alert band


def test_psi_empty_side_bin_reports_null_term(spark):
    from yodel_etl_spark.scale.dq import psi_drift

    rows = [(0, "a"), (0, "b"), (1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["bin", "side"])
    got = {
        r["bin"]: (r["n_a"], r["n_b"], r["term_micro"])
        for r in psi_drift(df, F.col("bin"), F.col("side") == "a").collect()
    }
    assert got[1] == (1, 0, None)  # bin slice B abandoned
    assert got[2] == (0, 1, None)  # bin slice B opened
    assert got[0][2] is not None


def test_psi_single_corpus_scan(spark):
    """The bin table is persisted: totals and the report join must read
    the cached bin rows, not re-run the corpus aggregation."""
    from yodel_etl_spark.scale.dq import psi_drift

    df = spark.range(100).select(
        (F.col("id") % 5).alias("bin"), (F.col("id") % 2 == 0).alias("a")
    )
    out = psi_drift(df, F.col("bin"), F.col("a"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    out.unpersist()


def test_psi_with_sketch_frozen_quantile_bins(spark):
    """The composition the psi_drift docstring prescribes for quantile
    bins: freeze cutpoints from the quantile summary of the REFERENCE
    slice, bin both slices by comparison against those frozen values,
    then run the one-pass PSI report.  Slice A ~ slice A's own
    quartiles ⇒ near-uniform shares; the shifted slice B piles into the
    top bin and PSI flags it."""
    from yodel_etl_spark.scale.dq import psi_drift
    from yodel_etl_spark.scale.sketch import quantile_partials, quantile_query

    # A: 0..999; B: same shape shifted up by 600 — a real location drift
    df = (
        spark.range(2000)
        .select(
            (F.col("id") < 1000).alias("a"),
            F.when(F.col("id") < 1000, F.col("id"))
            .otherwise(F.col("id") - 1000 + 600)
            .cast("double")
            .alias("v"),
        )
    )
    ref = df.where(F.col("a")).select("v")
    cuts = {
        r["p"]: r["value"]
        for r in quantile_query(
            quantile_partials(ref, "v", capacity=128), [0.25, 0.5, 0.75]
        ).collect()
    }
    assert set(cuts) == {0.25, 0.5, 0.75}
    # sketch error is bounded by n/capacity: cutpoints near true quartiles
    assert abs(cuts[0.5] - 500) < 32
    bin_col = (
        F.when(F.col("v") < F.lit(cuts[0.25]), 0)
        .when(F.col("v") < F.lit(cuts[0.5]), 1)
        .when(F.col("v") < F.lit(cuts[0.75]), 2)
        .otherwise(3)
    )
    rows = psi_drift(df, bin_col, F.col("a")).collect()
    by_bin = {r["bin"]: r for r in rows}
    # reference slice ≈ uniform over its own quartile bins
    for b in range(4):
        assert abs(by_bin[b]["n_a"] - 250) < 35, by_bin[b]
    # shifted slice concentrates in the top bin
    assert by_bin[3]["n_b"] > 600
    psi = sum(r["term_micro"] for r in rows if r["term_micro"] is not None) / 1e6
    assert psi > 0.25, psi
