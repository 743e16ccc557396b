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
    assert rec["metric"] == "sum_of_min_query_sec"
    assert set(rec["queries"]) == {"top_events_global", "distinct_counts"}
    assert rec["sf"] == 0.001
    assert rec["n_queries"] == 2
    assert set(rec["queries_median"]) == set(rec["queries"])
    assert rec["value"] > 0 and rec["wall_total_sec"] > 0
