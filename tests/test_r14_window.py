"""Round-14 rotation/byte-budget invariants (VERDICT r13 next-round
#1, per tools/r14_registration.md): the `delw` rows-only registration
must append AFTER the oracle block (no rotation shift — the r12 `vac`
precedent), the funding rename events_session_windows→evsw must sit
INSIDE the counter-13 driver window so it banks a fresh green
CORRECTNESS row under its new name this very round (the r12/r13
in-window-rename convention), and the bench stdout projection must
stay under the budget the rename bought."""

from __future__ import annotations

import json


def test_counter13_window_admits_evsw_and_keeps_oracle_block(monkeypatch):
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_round_counter", lambda: 13)
    names = list(e.queries())
    window = names[:50]
    osql = e.oracle_sql()
    # the whole driver window stays oracle-backed: the rows-only append
    # landed after the block and shifted nothing
    assert all(n in osql for n in window)
    # the funding rename is in-window (banks its green row in r14) at
    # the exact slot the registration slot implies
    assert window.index("evsw") == 46
    assert "events_session_windows" not in names
    # delw is registered, rows-only, outside the oracle block
    assert "delw" in names and "delw" not in osql
    assert names.index("delw") >= len(osql)


def test_counter12_promises_survive_the_r14_registry_change(monkeypatch):
    """The r13 window test pins counter-12 invariants; re-pin here that
    the r14 change (rename + rows-only append) left them untouched —
    an accidental oracle-block shift would break BOTH rounds' ledgers."""
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_round_counter", lambda: 12)
    window = list(e.queries())[:50]
    assert window.index("ev_hourly") == 41
    assert "jacc" in window and "vcounts" in window


def test_r14_projection_fits_funded_budget():
    """`delw` costs 12 stdout chars; the evsw rename bought 18 —
    projection must land at 1,928 (1,934 − 18 + 12) with the driver's
    2,000-char tail window far clear.  Pin ≤1,930 as the new budget
    (the r13 test keeps its ≤1,940 promise; this one documents r14's)."""
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
    assert len(line) <= 1930, (
        f"line projects to {len(line)}; r14 promised <= 1930 headroom"
    )
    assert "evsw" in names and "delw" in names
