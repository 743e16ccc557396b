#!/usr/bin/env python
"""Guard-cost A/B for the embedding ingest gate (VERDICT r12
next-round #5): with ``max_fatness`` set, the r12 gate paid one
``ivf_index_stats`` aggregate job per micro-batch; r13 caches the
frozen denominators (``n_cells``, ``built_mean``) across batches and
tracks ``n_vectors`` from the gate's own admit counts, so the
per-batch guard cost collapses to the ``novel.count()`` the projection
needs anyway.

Three arms over an 8-micro-batch stream (the 2-batch registered
``eingest`` fixture cannot distinguish the designs — both read stats
exactly once there; the fold's win scales with batches/stream):

- ``unguarded``  — max_fatness unset (the registered bench row's shape)
- ``guarded``    — max_fatness set, r13 cached-denominator code
- ``legacy``     — max_fatness set, a FRESH gate closure per batch, so
  the cache never survives: exactly the r12 per-batch-stats cost

Arms are interleaved per pass (bench.py discipline) so a co-tenant
burst inflates at most one sample per arm; the RELATIVE ordering is
the result.  Expect guarded ≈ unguarded + 7 count jobs, legacy ≈
guarded + 7 stats jobs.

Usage: python tools/eingest_ab.py   [SPARK_GRAFT_AB_RUNS=3]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3"))
BATCHES = int(os.environ.get("SPARK_GRAFT_AB_BATCHES", "8"))


def main() -> int:
    from pyspark.sql import functions as F

    from yodel_etl_spark.session import load_tables
    from yodel_etl_spark.scale import dedup as D
    from yodel_etl_spark.session import get_spark

    spark = get_spark(app_name="yodel_eingest_ab")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].select(
        "vec_id", "embedding"
    )
    src = tempfile.mkdtemp(prefix="eingest_ab_src_")
    try:
        for i in range(BATCHES):
            emb.where(F.col("vec_id") % BATCHES == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)

        def run(arm: str) -> float:
            work = tempfile.mkdtemp(prefix=f"eingest_ab_{arm}_")
            index, corpus, ckpt = (
                os.path.join(work, d) for d in ("idx", "corp", "ckpt")
            )
            kw = dict(threshold=0.9, nprobe=3)
            if arm == "unguarded":
                land = D.embedding_dedup_ingest(index, corpus, **kw)
            elif arm == "guarded":
                land = D.embedding_dedup_ingest(
                    index, corpus, max_fatness=1000.0, **kw
                )
            else:  # legacy: fresh closure per batch -> stats per batch

                def land(batch, bid):
                    D.embedding_dedup_ingest(
                        index, corpus, max_fatness=1000.0, **kw
                    )(batch, bid)

            t0 = time.perf_counter()
            q = (
                spark.readStream.schema("vec_id long, embedding array<double>")
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
                .writeStream.foreachBatch(land)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not q.awaitTermination(600):
                    q.stop()
                    raise TimeoutError(f"{arm} drain exceeded 600s")
                return time.perf_counter() - t0
            finally:
                spark.catalog.clearCache()
                shutil.rmtree(work, ignore_errors=True)

        arms = ("unguarded", "guarded", "legacy")
        samples: dict[str, list[float]] = {a: [] for a in arms}
        for _ in range(RUNS):
            for arm in arms:
                samples[arm].append(run(arm))
        out = {
            "min": {a: round(min(v), 3) for a, v in samples.items()},
            "median": {
                a: round(statistics.median(v), 3) for a, v in samples.items()
            },
            "samples": {
                a: [round(x, 3) for x in v] for a, v in samples.items()
            },
            "runs": RUNS,
            "batches": BATCHES,
            "sf_dir": SF_DIR,
        }
        out["guarded_over_unguarded_min"] = round(
            out["min"]["guarded"] / out["min"]["unguarded"], 3
        )
        out["legacy_over_guarded_min"] = round(
            out["min"]["legacy"] / out["min"]["guarded"], 3
        )
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
