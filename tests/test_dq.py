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
