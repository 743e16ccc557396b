"""Quantile sketch: deterministic ε = 1/capacity rank guarantee on
seeded adversarial distributions, exact degradation at small n,
merge associativity (union of per-half partials answers within the same
bound), and compression's additive error."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from yodel_etl_spark.scale.sketch import (
    quantile_compress,
    quantile_partials,
    quantile_query,
)

PROBS = [0.01, 0.25, 0.5, 0.75, 0.99]


def _rank_of(sorted_vals: list[float], v: float) -> tuple[int, int]:
    """(lowest, highest) rank v could occupy in sorted data (ties)."""
    import bisect

    return bisect.bisect_left(sorted_vals, v), bisect.bisect_right(sorted_vals, v)


def _assert_within(sorted_vals, answers, eps_ranks: float):
    n = len(sorted_vals)
    for p, v in answers:
        lo, hi = _rank_of(sorted_vals, v)
        target = p * n
        assert lo - eps_ranks <= target <= hi + eps_ranks, (
            f"p={p}: value {v} has rank [{lo},{hi}], target {target}, "
            f"allowed ±{eps_ranks}"
        )


@pytest.mark.parametrize("dist", ["uniform", "zipf", "steps"])
def test_quantile_guarantee(spark, dist):
    rng = random.Random(hash(dist) & 0xFFFF)
    n, cap = 20_000, 64
    if dist == "uniform":
        vals = [rng.random() for _ in range(n)]
    elif dist == "zipf":
        vals = [1.0 / (1 + rng.randrange(1000)) ** 2 for _ in range(n)]
    else:  # heavy ties: only 7 distinct values
        vals = [float(rng.randrange(7)) for _ in range(n)]
    df = spark.createDataFrame(pd.DataFrame({"x": vals})).repartition(16)
    sk = quantile_partials(df, "x", capacity=cap)
    assert sk.count() <= 16 * cap
    answers = [(r["p"], r["value"]) for r in quantile_query(sk, PROBS).collect()]
    assert len(answers) == len(PROBS)
    # ε = 1/capacity of n, plus one stratum of slack for the discrete
    # midpoint placement
    _assert_within(sorted(vals), answers, eps_ranks=2.0 * n / cap)


def test_quantile_exact_when_small(spark):
    vals = [float(v) for v in [5, 1, 9, 3, 7, 2, 8, 4, 6, 0]]
    df = spark.createDataFrame(pd.DataFrame({"x": vals})).repartition(2)
    sk = quantile_partials(df, "x", capacity=64)
    # every value survives exactly (weight 1): the sketch IS the data
    got = sorted((r["value"], r["weight"]) for r in sk.collect())
    assert got == [(float(v), 1.0) for v in range(10)]
    med = dict(
        (r["p"], r["value"]) for r in quantile_query(sk, [0.5]).collect()
    )
    assert med[0.5] in (4.0, 5.0)


def test_quantile_merge_and_compress(spark):
    rng = random.Random(7)
    a = [rng.gauss(0, 1) for _ in range(8000)]
    b = [rng.gauss(10, 2) for _ in range(8000)]
    cap = 128
    sk_a = quantile_partials(
        spark.createDataFrame(pd.DataFrame({"x": a})).repartition(8), "x", cap
    )
    sk_b = quantile_partials(
        spark.createDataFrame(pd.DataFrame({"x": b})).repartition(8), "x", cap
    )
    merged = sk_a.unionByName(sk_b)  # merge = row union, associative
    allv = sorted(a + b)
    n = len(allv)
    answers = [(r["p"], r["value"]) for r in quantile_query(merged, PROBS).collect()]
    _assert_within(allv, answers, eps_ranks=2.0 * n / cap)
    # re-bounding the union: ≤ cap rows, +1 stratum of extra error
    small = quantile_compress(merged, capacity=cap)
    assert small.count() <= cap
    total = small.agg({"weight": "sum"}).collect()[0][0]
    assert total == pytest.approx(n, rel=1e-9)  # weight is conserved
    answers2 = [(r["p"], r["value"]) for r in quantile_query(small, PROBS).collect()]
    _assert_within(allv, answers2, eps_ranks=3.0 * n / cap)


def test_quantile_deterministic(spark):
    vals = [float((i * 2654435761) % 997) for i in range(5000)]
    df = spark.createDataFrame(pd.DataFrame({"x": vals})).repartition(8)
    r1 = sorted(map(tuple, quantile_partials(df, "x", 32).collect()))
    r2 = sorted(map(tuple, quantile_partials(df, "x", 32).collect()))
    assert r1 == r2
