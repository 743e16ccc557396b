"""Write-path layout benchmark query: z-ordered write + multi-predicate
pruned read-back (io/layout.py's write_zordered), registered so layout
cost is a recorded bench number across rounds — the write path IS a
query cost at 100 TB (scan cost is set at write time), so it belongs in
the same per-round record as the reads.

Rows-only by design: the measured artifact is the files' physical
layout (tests/test_layout.py pins footer-level pruning); the returned
aggregate is an exact count/sum over the pruned read-back, so the
rows-only stability check still has deterministic values.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables, spread


@register(
    "write_zorder",
    oracle=None,  # side-effecting write + layout-dependent file set;
    # correctness of the layout is pinned at parquet-footer level in
    # tests/test_layout.py, value determinism by the exact-count return
    doc="Z-ordered write of events on (user_id, value) — quantile-"
    "normalized Morton interleave (one approx-percentile pass + one "
    "range exchange, no global window) — followed by a two-predicate "
    "pruned read-back aggregated to exact counts.  Benchmarks the "
    "'land it queryable' write path: at 100 TB the scan cost of every "
    "later query is set HERE, and the multi-dimension min/max "
    "tightness is what a linear sort cannot give.  Rows-only: the "
    "write is a side effect; footer-level pruning (files skipped vs "
    "linear sort, no degenerate dimension) is pinned in "
    "tests/test_layout.py.",
    tags=("layout", "io", "scale"),
    bench=True,
)
def write_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.layout import write_zordered

    ev = spread(load_tables(spark, sf_dir, ("events",))["events"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"yodel_zorder_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    write_zordered(ev, path, zorder_by=("user_id", "value"), buckets=64, n_files=8)
    back = spark.read.parquet(path)
    # two RANGE predicates — the shape parquet min/max stats prune on,
    # and the multi-dimension case where z-order beats a linear sort
    pruned = back.where(
        F.col("user_id").between(100, 400) & F.col("value").between(100.0, 300.0)
    )
    return pruned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
