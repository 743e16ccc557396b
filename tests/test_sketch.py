"""Misra-Gries heavy-hitters sketch (scale/sketch.py): exact
degradation when capacity suffices, and the classic > n/capacity
guarantee + bound containment when decrements fire."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from yodel_etl_spark.scale.sketch import approx_top_k
from yodel_etl_spark.session import load_tables


def test_exact_degradation_matches_groupby(spark, sf_small):
    """capacity ≥ distinct keys → no decrements → sketch == exact."""
    ev = load_tables(spark, sf_small, ("events",))["events"]
    got = approx_top_k(ev, "user_id", k=10, capacity=1024).collect()
    exact = {
        str(r["user_id"]): r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["item"], r["count_lo"]) for r in got] == top_exact
    assert all(r["count_lo"] == r["count_hi"] for r in got)  # zero error


def test_guarantee_under_decrement_pressure(spark):
    """Skewed stream through a tiny sketch: every item with true count
    > n/capacity must surface, with count_lo ≤ true ≤ count_hi."""
    rows = (
        [Row(k="hot") for _ in range(400)]
        + [Row(k="warm") for _ in range(150)]
        + [Row(k=f"cold{i}") for i in range(300)]
    )
    df = spark.createDataFrame(rows).repartition(4)
    n, capacity = len(rows), 8
    got = {r["item"]: (r["count_lo"], r["count_hi"]) for r in approx_top_k(df, "k", k=8, capacity=capacity).collect()}
    true = {"hot": 400, "warm": 150}
    for item, t in true.items():
        if t > n / capacity:
            assert item in got, f"{item} (count {t}) must survive"
        lo, hi = got[item]
        assert lo <= t <= hi
