"""Round-15 rotation invariants (VERDICT r14 next-round #4): no
registry change this round, so the counter-14 window is pure rotation
— k = 140 % 73 = 67 — and the queries rotating IN must be exactly the
longest-unwindowed oracle rows (out in BOTH the counter-12 and
counter-13 windows, i.e. at the ≤2-consecutive-miss starvation bound,
which forces the rotation to carry them back inside now)."""

from __future__ import annotations


def _window(e, counter: int, monkeypatch) -> list[str]:
    monkeypatch.setattr(e, "_round_counter", lambda: counter)
    return list(e.queries())[:50]


def test_counter14_window_is_oracle_backed_and_rotates_the_starved_in(
    monkeypatch,
):
    import __spark_entry__ as e

    osql = e.oracle_sql()
    w12 = set(_window(e, 12, monkeypatch))
    w13 = set(_window(e, 13, monkeypatch))
    w14 = _window(e, 14, monkeypatch)
    # the whole driver window stays oracle-backed (rows-only names all
    # sit after the 73-query oracle block; nothing shifted this round)
    assert all(n in osql for n in w14)
    rotated_in = set(w14) - w13
    # exactly the ten rows at the starvation bound come back: each was
    # out of BOTH prior windows (2 consecutive misses — the pinned
    # maximum), so the counter-14 rotation MUST re-admit them
    assert rotated_in == {
        "ev_daily",
        "ev_enrich",
        "ev_types",
        "events_first_seen",
        "orders_semi_anti",
        "segprio",
        "set_ops_customers",
        "strat",
        "text_pii_redact",
        "top_events_global",
    }
    assert all(n not in w12 and n not in w13 for n in rotated_in)


def test_rotation_phase_floor_is_at_least_14():
    """The durable floor rides the round: a fresh checkout without the
    untracked CORRECTNESS artifacts must resume rotation at counter 14
    or later, not reset to 0 (which would silently re-run the
    counter-0 window and break the cross-round ledger).  Exact
    equality is pinned by the CURRENT round's window test only
    (tests/test_r16_window.py) — this one keeps the historical
    lower bound."""
    import os

    import __spark_entry__ as e

    here = os.path.dirname(os.path.abspath(e.__file__))
    with open(os.path.join(here, "ROTATION_PHASE")) as fh:
        assert int(fh.read().strip()) >= 14
    assert e._round_counter() >= 14


def test_r14_promises_survive_round_15(monkeypatch):
    """Round 15 makes no registry change; the r14 pins (evsw in the
    counter-13 window at slot 46, delw rows-only after the oracle
    block) must hold verbatim."""
    import __spark_entry__ as e

    w13 = _window(e, 13, monkeypatch)
    assert w13.index("evsw") == 46
    names = list(e.queries())
    osql = e.oracle_sql()
    assert "delw" in names and "delw" not in osql
    assert names.index("delw") >= len(osql)
