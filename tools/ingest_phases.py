#!/usr/bin/env python
"""Per-phase timing decomposition of the `ingest` registered query
(near_dedup_ingest over the two-file document stream at sf0.1) — the
attribution record behind the BASELINE.md phase table, so future drift
on the registry's most expensive query is diagnosable instead of one
opaque number.

Replays the land() flow MANUALLY with an explicit action per phase
(the registered query runs the same plans lazily, so phase sums land a
little above the streaming run's in-gate cost — forcing a phase
boundary materializes joins the lazy flow shares; the residual vs the
bench number is the FileStreamSource/checkpoint machinery plus that
sharing).  Run on a quiet window (check the flagship control).

Usage: python tools/ingest_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from yodel_etl_spark.queries.infra_q import _ingest_src, _work_dir
    from yodel_etl_spark.scale.dedup import (
        _extend_index_tables,
        _index_exists,
        _minhash_tables,
        _pairs_from_tables,
        _probe_from_tables,
    )
    from yodel_etl_spark.session import get_spark, release

    spark = get_spark(app_name="ingest_phases")
    spark.sparkContext.setLogLevel("ERROR")

    src = _ingest_src(spark, SF)

    files = sorted(
        (os.path.join(src, p) for p in os.listdir(src) if p.startswith("part-")),
        key=os.path.getmtime,
    )
    phases: dict[str, float] = {}

    def clock(name: str, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        phases[name] = phases.get(name, 0.0) + dt
        return out

    # control: flagship-class scan so the record carries its own gauge
    t = time.perf_counter()
    spark.read.parquet(f"{SF}/lineitem.parquet").agg(F.count(F.lit(1))).collect()
    print(f"control lineitem count: {time.perf_counter() - t:.2f}s")

    def run_batch(f: str, index: str, corpus: str) -> None:
        batch = spark.read.parquet(f).dropDuplicates(["doc_id"])
        have = _index_exists(spark, index)
        banded, sets = _minhash_tables(batch, "doc_id", "text", 64, 16, 3)
        banded = banded.persist()
        sets = sets.persist()
        # sign: materialize the shared signature tables (the one
        # data-sized kernel; the land() pays it inside novel_ids)
        clock("sign", lambda: (banded.count(), sets.count()))
        pairs = _pairs_from_tables(banded, sets, 0.8)
        losers = pairs.select(F.col("doc_b").alias("doc")).distinct()
        surv = batch.select(F.col("doc_id").alias("doc")).join(
            losers, "doc", "left_anti"
        )
        clock("inbatch_pairs", lambda: surv.count())
        if have:
            hits = _probe_from_tables(
                spark,
                index,
                banded.join(surv, "doc", "left_semi"),
                sets.join(surv, "doc", "left_semi"),
                0.8,
            )
            dup = hits.select(F.col("doc_inc").alias("doc")).distinct()
            novel_ids = surv.join(dup, "doc", "left_anti")
            novel_ids = clock(
                "probe+snapshot", lambda: novel_ids.localCheckpoint(eager=True)
            )
        else:
            novel_ids = clock(
                "probe+snapshot", lambda: surv.localCheckpoint(eager=True)
            )
        novel = batch.join(
            novel_ids.withColumnRenamed("doc", "doc_id"), "doc_id", "left_semi"
        )
        clock(
            "write_corpus",
            lambda: novel.write.mode("append").parquet(corpus),
        )
        nb = banded.join(novel_ids, "doc", "left_semi")
        ns = sets.join(novel_ids, "doc", "left_semi")
        if have:
            clock("write_index", lambda: _extend_index_tables(nb, ns, index))
        else:
            def first_write():
                nb.write.mode("overwrite").parquet(f"{index}/banded")
                ns.write.mode("overwrite").parquet(f"{index}/sets")
                spark.createDataFrame(
                    [(64, 16, 3)], "num_hashes int, bands int, k int"
                ).write.mode("overwrite").parquet(f"{index}/params")

            clock("write_index", first_write)
        release(banded)
        sets.unpersist()

    # two passes over fresh work dirs: pass 0 warms the JVM (codegen,
    # parquet readers) the way bench.py's warm-up execution does; the
    # reported table is pass 1 (the min-of-N analogue)
    for p in range(2):
        phases.clear()
        root = _work_dir(f"ingest_phases{p}", SF)
        index = os.path.join(root, "idx")
        corpus = os.path.join(root, "corp")
        for f in files:
            run_batch(f, index, corpus)
        print(f"pass {p} phase sum: {sum(phases.values()):.2f}s")

    total = sum(phases.values())
    print(f"\nphase decomposition at {SF} (2 batches, forced boundaries, warm pass):")
    for k, v in phases.items():
        print(f"  {k:>16}: {v:6.2f}s  ({100 * v / total:4.1f}%)")
    print(f"  {'SUM':>16}: {total:6.2f}s (streaming machinery = bench - SUM)")


if __name__ == "__main__":
    main()
