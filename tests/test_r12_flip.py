"""Executable pre-verification of the round-12 oracle flip (tools/
r12_oracle_flip.md): the staged ``tdiff``/``xspan`` DuckDB oracle SQL
must hash-match the REGISTERED Spark builders before round 12 wires it
as ``oracle=`` — the known traps (Spark vs DuckDB ``round()`` on the
acctbal bump; single-space-with-empties tokenization vs a ``\\s+``
filtered split) should fail here, in pytest, not in the driver next
round.  Also pins the counter-11 window arithmetic the flip relies on:
with the two (or three, if ``anchor`` flips too) new oracle entries
appended at tier 4, every protected name stays inside the driver's
50-row window and the new oracles are windowed immediately.
"""

from __future__ import annotations

import pytest

from yodel_etl_spark.queries.ops_q import (
    ANCHOR_ORACLE,
    TDIFF_ORACLE,
    XSPAN_ORACLE,
)
from yodel_etl_spark.registry import load_all
from yodel_etl_spark.testing import compare_frames, duckdb_connect

#: names that must stay inside the first-50 window at counter 11
#: (funnel/decontam/split_docs/cjk_tokens got their first driver-green
#: rows in r10/r11; cdc/links were the round-9 protection set)
_PROTECTED = ("funnel", "decontam", "split_docs", "cjk_tokens", "cdc", "links")


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize(
    "name,sql",
    [
        ("tdiff", TDIFF_ORACLE),
        ("xspan", XSPAN_ORACLE),
        ("anchor", ANCHOR_ORACLE),
    ],
)
def test_staged_oracle_matches_registered_builder(spark, name, sql, sf_dir):
    """Driver-grade comparison (columns + rows + values + the driver's
    stringify hash) of the staged SQL against the query the registry
    actually runs — at BOTH the pytest and the driver scale factor."""
    q = load_all()[name]
    spark_pdf = q.build(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.sql(sql).df()
    finally:
        con.close()
    res = compare_frames(name, spark_pdf, duck_pdf)
    assert res.ok, f"{name} at {sf_dir}: {res.detail}"
    assert len(spark_pdf) > 0


@pytest.mark.parametrize(
    "flips",
    [("tdiff", "xspan"), ("tdiff", "xspan", "anchor")],
    ids=["two-flip", "three-flip-with-anchor"],
)
def test_counter11_window_admits_the_flip(monkeypatch, flips):
    """Round 12 runs at counter 11.  Shadow-flip the named rows-only
    queries to oracle-backed tier 4 (fresh highest tier ⇒ they append
    at the end of the oracle block — the placement the recipe requires)
    and verify the rotated 50-slot window keeps every protected name
    AND windows the new oracles immediately.  If this ever breaks
    (registry grew, counter drifted), the flip recipe must be
    re-simulated before executing."""
    import __spark_entry__ as e

    qs = load_all()
    for n in flips:
        monkeypatch.setattr(qs[n], "oracle", "SELECT 1")
        monkeypatch.setattr(qs[n], "tier", 4)
    monkeypatch.setattr(e, "_round_counter", lambda: 11)
    window = list(e.queries())[:50]
    missing = [q for q in _PROTECTED + tuple(flips) if q not in window]
    assert not missing, f"counter-11 window evicts {missing}"


def test_counter10_window_protects_first_timers(monkeypatch):
    """THIS round's invariant (round 11 = counter 10): with the registry
    exactly as committed — no oracle insertions — split_docs (position
    49, the last slot), decontam, funnel and cjk_tokens are all inside
    the driver window for their first/banked green rows."""
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_round_counter", lambda: 10)
    window = list(e.queries())[:50]
    for q in ("funnel", "decontam", "split_docs", "cjk_tokens"):
        assert q in window, f"counter-10 window lost {q}"
