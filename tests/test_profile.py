"""Column profiler: edge-case semantics on a handcrafted frame.

The registered ``profile_docs`` query is oracle-checked by
tests/test_oracle_parity.py; these tests pin the corners the clean
testdata cannot exercise — nulls, all-null columns, top-value ties,
non-numeric strings.
"""

from __future__ import annotations

import pytest

from yodel_etl_spark.scale.profile import profile_table


@pytest.fixture(scope="module")
def prof(spark):
    rows = [
        (1, "en", None, "2.5"),
        (2, "en", None, "x"),
        (3, "de", None, "7"),
        (4, None, None, "7"),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, dead string, mixed string")
    got = profile_table(df, ("id", "lang", "dead", "mixed")).collect()
    return {r["col_name"]: r for r in got}


def test_counts_and_nulls(prof):
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert prof["lang"]["n_null"] == 1
    assert prof["lang"]["n_distinct"] == 2


def test_all_null_column(prof):
    d = prof["dead"]
    assert d["n_null"] == 4 and d["n_distinct"] == 0
    assert d["min_s"] is None and d["top_value"] is None and d["top_count"] is None


def test_top_value_tie_breaks_to_smallest(prof):
    # id: every value count 1 — the tie resolves to the smallest string
    assert prof["id"]["top_value"] == "1" and prof["id"]["top_count"] == 1
    assert prof["lang"]["top_value"] == "en" and prof["lang"]["top_count"] == 2
    # mixed: '7' appears twice, beats the tie set
    assert prof["mixed"]["top_value"] == "7" and prof["mixed"]["top_count"] == 2


def test_numeric_bounds_via_try_cast(prof):
    m = prof["mixed"]
    assert m["num_min"] == 2.5 and m["num_max"] == 7.0
    assert prof["lang"]["num_min"] is None and prof["lang"]["num_max"] is None
    assert prof["id"]["num_min"] == 1.0 and prof["id"]["num_max"] == 4.0


def test_lexical_bounds_are_string_form(prof):
    # 10 < 2 lexically is the documented semantics of min_s/max_s —
    # numeric questions read num_min/num_max
    assert prof["id"]["min_s"] == "1" and prof["id"]["max_s"] == "4"
    assert prof["mixed"]["min_s"] == "2.5" and prof["mixed"]["max_s"] == "x"


def test_no_window_or_cartesian_in_plan(spark):
    df = spark.range(10).selectExpr("id", "cast(id % 3 as string) as v")
    plan = profile_table(df, ("id", "v"))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "CartesianProduct" not in plan
