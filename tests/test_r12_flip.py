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


def test_flip_executed_oracles_live():
    """Round 12 executed the staged flip: all three carry their staged
    SQL as the LIVE driver oracle at tier 4 (end of the oracle block —
    the placement the window simulation assumed)."""
    qs = load_all()
    for name, sql in (
        ("tdiff", TDIFF_ORACLE),
        ("xspan", XSPAN_ORACLE),
        ("anchor", ANCHOR_ORACLE),
    ):
        assert qs[name].oracle == sql, f"{name} oracle not wired"
        assert qs[name].tier == 4, f"{name} not tier 4"


def test_counter11_window_post_flip(monkeypatch):
    """THIS round's invariant (round 12 = counter 11) on the registry
    exactly as committed — the flip real, not shadowed: every protected
    name stays inside the 50-slot driver window and all three new
    oracles are windowed immediately (their first driver rows)."""
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_round_counter", lambda: 11)
    window = list(e.queries())[:50]
    missing = [
        q for q in _PROTECTED + ("tdiff", "xspan", "anchor") if q not in window
    ]
    assert not missing, f"counter-11 window evicts {missing}"


def test_counter12_window_admits_ev_hourly(monkeypatch):
    """The starvation-bound promise for ``ev_hourly``: it sits at
    position 51 at counter 11 (one slot out — its second consecutive
    miss after the r11 rename broke its green-row history), so counter
    12 (round 13) MUST window it, alongside the three new oracles'
    second rows.  If the registry grows before round 13, re-simulate."""
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_round_counter", lambda: 12)
    window = list(e.queries())[:50]
    for q in ("ev_hourly", "tdiff", "xspan", "anchor"):
        assert q in window, f"counter-12 window lost {q}"
