#!/usr/bin/env bash
# One-command ISOLATED stress run (VERDICT r12 next-round #3).
#
# The env-gated scale-stress suite (tests/test_stress.py, 24 tests)
# asserts TIMING ratios — sublinear scaling, delta-vs-corpus cost.
# Running all of them in ONE pytest process fails ~3 bounds from intra-suite
# JVM pressure (GC debt, executor-thread contention left by earlier
# tests), not from regressions; the r12 record pinned this by re-running
# the failures isolated and watching them pass with margin.  This script
# makes the isolated protocol the one-command default: each test gets
# its OWN pytest process (fresh JVM, cold SparkSession) so every timing
# bound is measured against an idle heap.
#
# Quiet-window requirement: the host has intermittent co-tenant bursts;
# timing bounds are only meaningful on a quiet machine.  The script
# gauges first (BASELINE.md convention): it runs the two ctl queries
# and WARNS when they read outside their verified-quiet bands
# (top_events_global ~0.10-0.15 s, text_fingerprint ~0.14-0.17 s) —
# pass --no-gauge to skip the ~40 s check.
#
# Usage:   tools/run_stress.sh [--no-gauge] [extra pytest args...]
# Example: tools/run_stress.sh -k minhash
set -u
cd "$(dirname "$0")/.."

GAUGE=1
if [ "${1:-}" = "--no-gauge" ]; then GAUGE=0; shift; fi
if [ "$GAUGE" = 1 ]; then
  echo "gauging window quietness (ctl queries, ~60 s)..."
  # flagship rides along as the WARM-UP leg (bench.py executes queries
  # in sorted order per pass, so flagship runs first and absorbs part
  # of the fresh session's JIT/codegen cost) and as a SECOND-SCALE
  # gauge: the sub-0.3 s micro-gauges are noisy against a cold JVM —
  # r15 observed them reading 1.5-2x band on load-0.01, steal-free
  # windows where the full bench's amortized inline gauges read
  # in-band minutes later.  Treat a CONTENDED verdict here as "timing
  # bounds may be unreliable", not proof of a co-tenant burst; the
  # flagship ratio is the leg to trust
  CTL=$(SPARK_GRAFT_BENCH_QUERIES=flagship,top_events_global,text_fingerprint python bench.py 2>/dev/null)
  echo "ctl: $CTL"
  python - "$CTL" <<'PYEOF'
import json, sys
q = json.loads(sys.argv[1])["queries"]
bands = {"top_events_global": 0.16, "text_fingerprint": 0.19, "flagship": 1.25}
hot = {k: v for k, v in q.items() if v > bands.get(k, 9e9)}
if hot:
    print(f"WARNING: window is CONTENDED ({hot}) — timing-bound "
          "failures below are not regressions; re-run when quiet.")
else:
    print("window reads quiet; timing bounds are meaningful.")
PYEOF
fi

export SPARK_GRAFT_STRESS=1

# collect test ids without importing Spark workers (collection is cheap)
mapfile -t TESTS < <(python -m pytest tests/test_stress.py --collect-only -q "$@" 2>/dev/null \
  | grep '^tests/test_stress.py::')

if [ "${#TESTS[@]}" -eq 0 ]; then
  echo "no stress tests collected (check -k filter)" >&2
  exit 2
fi

echo "running ${#TESTS[@]} stress tests, one pytest process each (isolated JVMs)"
pass=0; fail=0; failed=()
for t in "${TESTS[@]}"; do
  echo "=== $t"
  # pipeline runs BARE and PIPESTATUS is read on the very next line: an
  # if-wrapper (even `then :`) would run another command before the read
  # and reset PIPESTATUS to the wrapper's own status — every failure
  # would then count as a pass and the script could never exit nonzero
  python -m pytest "$t" -q --no-header 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 0 ]; then
    pass=$((pass+1))
  else
    fail=$((fail+1)); failed+=("$t")
  fi
done

echo
echo "stress summary: $pass passed, $fail failed (of ${#TESTS[@]})"
if [ "$fail" -gt 0 ]; then
  printf 'FAILED: %s\n' "${failed[@]}"
  echo "NOTE: timing-bound failures on a non-quiet host are expected —"
  echo "gauge with the ctl queries (header comment) before trusting them."
  exit 1
fi
