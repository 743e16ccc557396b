"""Round-16 rotation invariants (the r14/r15 convention continued): no
registry change this round, so the counter-15 window is pure rotation,
and the queries rotating IN must be exactly the longest-unwindowed
oracle rows (out of BOTH the counter-13 and counter-14 windows — the
pinned ≤2-consecutive-miss starvation bound forces the rotation to
carry them back inside now)."""

from __future__ import annotations


def _window(e, counter: int, monkeypatch) -> list[str]:
    monkeypatch.setattr(e, "_round_counter", lambda: counter)
    return list(e.queries())[:50]


def test_counter15_window_is_oracle_backed_and_rotates_the_starved_in(
    monkeypatch,
):
    import __spark_entry__ as e

    osql = e.oracle_sql()
    w13 = set(_window(e, 13, monkeypatch))
    w14 = set(_window(e, 14, monkeypatch))
    w15 = _window(e, 15, monkeypatch)
    assert all(n in osql for n in w15)
    rotated_in = set(w15) - w14
    assert rotated_in == {
        "audio_wav",
        "centroids",
        "decontam_semantic",
        "pipeline_curate",
        "sample_dsir",
        "sample_reservoir",
        "scd2_user_history",
        "text_bm25",
        "text_normalize",
        "text_tfidf_top",
    }
    assert all(n not in w13 and n not in w14 for n in rotated_in)


def test_rotation_phase_floor_is_15():
    """The durable floor rides the round: a fresh checkout without the
    untracked CORRECTNESS artifacts must resume rotation at counter 15
    (CORRECTNESS_r15.json is tracked, so the live counter is already
    15; the committed floor must match it for a re-clone)."""
    import os

    import __spark_entry__ as e

    here = os.path.dirname(os.path.abspath(e.__file__))
    with open(os.path.join(here, "ROTATION_PHASE")) as fh:
        assert int(fh.read().strip()) == 15
    assert e._round_counter() >= 15
