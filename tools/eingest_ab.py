#!/usr/bin/env python
"""A/B the `eingest` micro-bench GUARDED (max_fatness set, never
refusing) vs UNGUARDED (the registered row) — the r13 acceptance check
for folding the gate's staleness probe into existing work (VERDICT r12
next-round #5): with the frozen denominators cached across batches the
guarded arm should sit within host noise of the unguarded arm, where
the r12 implementation paid one `ivf_index_stats` aggregate job per
micro-batch on a per-job-constant-dominated path.

Interleaved min-of-N like bench.py (both arms sampled in each pass, so
a co-tenant burst inflates at most one sample per arm); relative
comparison is the point, so mild contention cancels.

Usage: python tools/eingest_ab.py  [SPARK_GRAFT_AB_RUNS=3]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3"))


def main() -> int:
    from yodel_etl_spark.registry import load_all
    from yodel_etl_spark.scale import dedup as D
    from yodel_etl_spark.session import get_spark

    spark = get_spark(app_name="yodel_eingest_ab")
    spark.sparkContext.setLogLevel("ERROR")
    build = load_all()["eingest"].build

    real = D.embedding_dedup_ingest

    def guarded(*a, **k):
        # a bound the fixture can never breach: measures pure guard
        # cost (stats read + projection), not refusal paths
        k.setdefault("max_fatness", 1000.0)
        return real(*a, **k)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {"unguarded": [], "guarded": []}
    for _ in range(RUNS):
        for label, fn in (("unguarded", real), ("guarded", guarded)):
            D.embedding_dedup_ingest = fn
            try:
                force(build(spark, SF_DIR))  # warm-up (JIT, listings)
                t0 = time.perf_counter()
                force(build(spark, SF_DIR))
                samples[label].append(time.perf_counter() - t0)
            finally:
                D.embedding_dedup_ingest = real
            spark.catalog.clearCache()
    out = {
        "min": {k: round(min(v), 3) for k, v in samples.items()},
        "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
        "samples": {k: [round(x, 3) for x in v] for k, v in samples.items()},
        "runs": RUNS,
        "sf_dir": SF_DIR,
    }
    out["guarded_over_unguarded_min"] = round(
        out["min"]["guarded"] / out["min"]["unguarded"], 3
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
