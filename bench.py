#!/usr/bin/env python
"""BENCH harness (BASELINE.md method: median of N timed runs after 1 warm-up).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the ``noop`` sink — full plan runs distributed,
nothing funnels through the driver, so the number measures the engine,
not ``collect()`` serialization.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def _force(df) -> None:
    """Materialize the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from yodel_etl_spark.registry import load_all
    from yodel_etl_spark.session import get_spark

    spark = get_spark(app_name="yodel_etl_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name in sorted(queries):
        build = queries[name].build
        _force(build(spark, SF_DIR))  # warm-up (JIT, code cache, file listing)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            _force(build(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)
    total = round(time.perf_counter() - t_total0, 2)

    print(
        json.dumps(
            {
                "metric": "sum_of_median_query_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "n_queries": len(timings),
                "runs_per_query": RUNS,
                "wall_total_sec": total,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
