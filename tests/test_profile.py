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


def test_approx_profile_degrades_to_exact_at_capacity(spark, sf_small):
    """approx=True with capacity ≥ per-partition distinct values: the
    MG summary never decrements and the top value/count are EXACT;
    counts/nulls/lexical/numeric bounds are exact by construction;
    n_distinct is HLL-approximate (±5% at default precision)."""
    from yodel_etl_spark.session import load_tables, release

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    cols = ("lang", "source", "n_chars")
    exact = {r["col_name"]: r for r in profile_table(docs, cols).collect()}
    ap = profile_table(docs, cols, approx=True, capacity=100_000)
    got = {r["col_name"]: r for r in ap.collect()}
    release(ap)
    assert set(got) == set(exact)
    for c in cols:
        e, g = exact[c], got[c]
        for f in ("n_rows", "n_null", "min_s", "max_s", "num_min", "num_max",
                  "top_value", "top_count"):
            assert g[f] == e[f], (c, f, g[f], e[f])
        assert abs(g["n_distinct"] - e["n_distinct"]) <= max(
            1, 0.05 * e["n_distinct"]
        ), (c, g["n_distinct"], e["n_distinct"])


def test_approx_profile_has_no_value_count_shuffle(spark):
    """The approx plan must contain no (column, value) hash aggregate:
    its only aggregates are the per-column rollup, the HLL partials,
    and the bounded MG merge — value-cardinality state never shuffles."""
    df = spark.range(500).selectExpr("id", "cast(id % 7 as string) v")
    plan = (
        profile_table(df, ("id", "v"), approx=True, capacity=64)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the exact path's signature: an Aggregate keyed on [col_name, val]
    import re

    assert not re.search(r"Aggregate \[col_name#\d+, val#\d+\]", plan), plan


def test_approx_profile_value_containing_separator(spark):
    """A VALUE containing the \\x1f composite separator must still
    round-trip through the MG key decomposition."""
    rows = [("a\x1fb",)] * 5 + [("plain",)] * 3
    df = spark.createDataFrame(rows, "v string")
    got = {r["col_name"]: r for r in
           profile_table(df, ("v",), approx=True, capacity=100).collect()}
    assert got["v"]["top_value"] == "a\x1fb" and got["v"]["top_count"] == 5
