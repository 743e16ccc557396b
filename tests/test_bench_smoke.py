"""bench.py smoke: the driver's per-round feedback loop must emit one
valid JSON line whatever else changes — a broken bench means the round
records no BENCH file at all."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_valid_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="top_events_global,distinct_counts",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # exactly one JSON object on stdout
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "sum_min"
    assert set(rec["queries"]) == {"top_events_global", "distinct_counts"}
    assert rec["sf"] == 0.001
    assert rec["value"] > 0
    assert "med" not in rec  # sum-of-medians was cut from stdout at 76
    # queries (byte budget) — it rides the stderr VERBOSE record
    assert "wall" not in rec  # harness wall-clock lives on stderr (VERBOSE) only
    # the contention-control ratios (two tiny gauges + the mid-size
    # flagship — the r6 drift detector) live on the VERBOSE record
    # only, never on the byte-budgeted stdout line
    assert "ctl_ratio" not in rec
    vline = next(ln for ln in proc.stderr.splitlines() if ln.startswith("VERBOSE {"))
    verbose = json.loads(vline[len("VERBOSE ") :])
    assert verbose["ctl_ratio"] == {
        "top_events_global": round(
            verbose["queries_min"]["top_events_global"] / 0.119, 2
        )
    }  # only controls present in the run's query set are rated
    # "ctl"/"nq" were dropped at 73 queries (the controls sort in the
    # t* tail of the queries dict, inside any 2,000-char tail capture;
    # nq = len(queries)) — pin their absence so they don't creep back
    # and re-blow the window budget
    assert "ctl" not in rec and "nq" not in rec
    # tail-safety contract (BENCH_r03 lost its headline to the driver's
    # 2,000-char tail capture): every scalar aggregate must serialize
    # AFTER the per-query dict so a truncated tail still ends with the
    # judge-readable headline, and the line itself must leave headroom.
    line = lines[0]
    assert line.index('"queries"') < line.index('"value"') < line.index('"sf"')
    # per-query medians live on stderr now, never on the stdout line
    assert '"queries_median"' not in line
    assert any(ln.startswith("VERBOSE {") for ln in proc.stderr.splitlines())


def test_bench_full_line_fits_driver_tail_window():
    """Project the stdout line length for the FULL registry: the driver
    archives the last 2,000 chars of output, so the line (plus the
    preceding stderr fragment it shares the window with) must fit or the
    per-round record loses its parse.  Guard at authoring time — this is
    exactly the regression that nulled BENCH_r03's parse."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from yodel_etl_spark.registry import load_all

    names = sorted(load_all())
    mock = {
        "metric": "sum_min",
        "unit": "sec",
        # per-query stdout values are 2-decimal (bench.py timings2);
        # width assumption: single-digit integer part — the slowest
        # registered query is ~3 s and a 10 s query would blow the
        # window budget (and the 2x-of-baseline bar) long before this
        # guard matters
        "queries": {n: 9.99 for n in names},
        "value": 999.99,
        "sf": 0.001,
    }
    line = json.dumps(mock, separators=(",", ":"))
    # 2,000-char window minus the trailing newline and a scalar-width
    # margin; r3's artifact shows the capture is stdout-only
    assert len(line) <= 1985, (
        f"bench stdout line projects to {len(line)} chars; the driver tail "
        "window is 2,000 — shorten query names or trim headline keys"
    )
    # with "ctl" gone, the contention gauges must keep sorting into the
    # truncation-safe zone even if the registry outgrows the window one
    # day: pad the mock with hypothetical queries ALPHABETICALLY BEFORE
    # the controls until the line exceeds the 2,000-char capture, then
    # require both control entries (and the scalar headline after them)
    # inside the final 1,990 chars.  (The un-padded form of this check
    # was vacuous: line <= 1985 made the distance bound always true.)
    pad = [f"padding_query_{i:02d}" for i in range(60)]
    mock["queries"] = {n: 9.99 for n in sorted(names + pad)}
    padded_line = json.dumps(mock, separators=(",", ":"))
    assert len(padded_line) > 2000  # the scenario the guard exists for
    for ctl in ("top_events_global", "text_fingerprint"):
        assert len(padded_line) - padded_line.rindex(f'"{ctl}"') <= 1990, ctl


def test_headline_selection():
    """--headline must pick exactly the bench=True subset (a strict,
    non-empty subset of the registry) and compose with the allowlist."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from yodel_etl_spark.registry import load_all

    qs = load_all()
    all_names = bench.select_names(qs)
    head = bench.select_names(qs, headline=True)
    assert head and set(head) < set(all_names)
    assert all(qs[n].bench for n in head)
    assert [n for n in all_names if qs[n].bench] == head
    pick = {head[0], all_names[0]}
    assert bench.select_names(qs, only=pick, headline=True) == sorted(
        n for n in pick if qs[n].bench
    )


def test_baseline_table_matches_registry():
    """The round-5 re-baseline table in BASELINE.md is the 2×-bar
    denominator — its names must track the live registry exactly, or
    future comparisons silently lose/misname queries (the drift that
    made the r1 table need merge-accounting prose)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from yodel_etl_spark.registry import load_all

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "BASELINE.md")).read()
    section = text.split("## Per-query baseline — round-5 re-baseline")[1]
    section = section.split("## ")[0]  # up to the next heading
    names = set()
    for ln in section.splitlines():
        if ln.startswith("| ") and ln.count("|") == 4 and "min_s" not in ln and "---" not in ln:
            names.add(ln.split("|")[1].strip())
    assert names == set(load_all()), (
        sorted(names ^ set(load_all()))
    )
