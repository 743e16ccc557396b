"""Layout writer: partition pruning and filter pushdown are asserted
against the reader's physical plan, and the small-files property is
asserted on disk."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from yodel_etl_spark.io.layout import write_clustered
from yodel_etl_spark.session import load_tables


def _plan(df) -> str:
    # "formatted" explain prints the full scan metadata sections —
    # plain executedPlan().toString() truncates them at
    # maxMetadataStringLength
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _write_events(spark, sf_small, tmp_path) -> str:
    ev = load_tables(spark, sf_small, ("events",))["events"]
    out = str(tmp_path / "events_clustered")
    write_clustered(
        ev.withColumn("event_date", F.to_date("ts")),
        out,
        partition_by=("event_date",),
        sort_by=("user_id",),
    )
    return out


def test_partition_pruning(spark, sf_small, tmp_path):
    out = _write_events(spark, sf_small, tmp_path)
    days = sorted(
        os.path.basename(d) for d in glob.glob(f"{out}/event_date=*")
    )
    assert len(days) > 1, "need multiple partition dirs for a pruning test"
    one_day = days[0].split("=", 1)[1]
    q = spark.read.parquet(out).where(F.col("event_date") == one_day)
    plan = _plan(q)
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # runtime scan metrics prove the pruning actually happened: exactly
    # one partition directory and one file were read
    q.collect()
    scan = q._jdf.queryExecution().executedPlan().collectLeaves().head()
    metrics = scan.metrics()
    assert metrics.apply("numPartitions").value() == 1
    assert metrics.apply("numFiles").value() == 1


def test_sort_key_filter_pushdown_and_file_layout(spark, sf_small, tmp_path):
    out = _write_events(spark, sf_small, tmp_path)
    q = spark.read.parquet(out).where(F.col("user_id") == 7).select("event_id")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in plan
    # one shuffle on the partition key -> one file per partition dir
    for d in glob.glob(f"{out}/event_date=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"
    # rows inside each file are sorted by user_id (row-group min/max
    # are range-disjoint, so stats-based skipping is effective)
    import pyarrow.parquet as pq

    some_file = glob.glob(f"{out}/event_date=*/*.parquet")[0]
    uid = pq.read_table(some_file, columns=["user_id"])["user_id"].to_pylist()
    assert uid == sorted(uid)


def test_round_trip_values(spark, sf_small, tmp_path):
    ev = load_tables(spark, sf_small, ("events",))["events"]
    out = _write_events(spark, sf_small, tmp_path)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    a = {r["event_id"] for r in ev.select("event_id").collect()}
    b = {r["event_id"] for r in back.select("event_id").collect()}
    assert a == b


# ----------------------------------------------------------- z-order
def _file_extents(path: str, cols: tuple[str, str]) -> list[dict]:
    """Per-file (min, max) of each column from the parquet footers —
    the statistics a scan's skipping actually uses."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        ext = {c: [None, None] for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in ext and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    if ext[name][0] is None or mn < ext[name][0]:
                        ext[name][0] = mn
                    if ext[name][1] is None or mx > ext[name][1]:
                        ext[name][1] = mx
        out.append(ext)
    return out


def test_zorder_bounds_skipping_on_every_dimension(spark, sf_small, tmp_path):
    """The claim z-order exists to make true: a LINEAR sort on user_id
    gives perfect file-skipping on user_id and NONE on value (every
    file spans ~the full value range, so a value-only predicate scans
    all files); z-order trades a little of the first dimension's
    selectivity for bounded selectivity on BOTH.  Metric: how many of
    the 8 files' footer [min, max] ranges contain a probe point, averaged over quantile-spread probes — what parquet stats skipping
    actually evaluates."""
    from yodel_etl_spark.io.layout import write_zordered

    ev = load_tables(spark, sf_small, ("events",))["events"].select(
        "event_id", "user_id", "value"
    )
    n_files = 8
    lin = str(tmp_path / "linear")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lin)
    )
    zo = str(tmp_path / "zordered")
    write_zordered(ev, zo, ("user_id", "value"), n_files=n_files)

    cols = {
        c: sorted(r[c] for r in ev.select(c).collect())
        for c in ("user_id", "value")
    }
    probes = {
        c: [vals[int(q * len(vals)) // 100] for q in range(5, 100, 10)]
        for c, vals in ((c, cols[c]) for c in cols)
    }

    def avg_touched(path: str, col: str) -> float:
        exts = _file_extents(path, ("user_id", "value"))
        pts = probes[col]
        return sum(
            1
            for x in pts
            for e in exts
            if e[col][0] is not None and e[col][0] <= x <= e[col][1]
        ) / len(pts)

    lin_u, lin_v = avg_touched(lin, "user_id"), avg_touched(lin, "value")
    z_u, z_v = avg_touched(zo, "user_id"), avg_touched(zo, "value")
    # linear: value predicates touch everything
    assert lin_v > n_files * 0.9, (lin_u, lin_v)
    # z-order: value predicates now skip most files...
    assert z_v < lin_v / 2, (z_v, lin_v)
    # ...and NO dimension degenerates to scan-everything
    assert max(z_u, z_v) < n_files * 0.8, (z_u, z_v)

    # and the layout is a pure re-ordering — nothing lost or changed
    back = spark.read.parquet(zo)
    assert back.count() == ev.count()
    assert {r["event_id"] for r in back.select("event_id").collect()} == {
        r["event_id"] for r in ev.select("event_id").collect()
    }


def test_clustered_orc_roundtrip_and_pushdown(spark, sf_small, tmp_path):
    """The fmt knob is real: the clustered layout writes ORC with the
    same partition dirs, values survive the roundtrip, and a sort-key
    filter reaches the ORC scan as a pushed filter."""
    ev = load_tables(spark, sf_small, ("events",))["events"].select(
        "event_id", "user_id", "value", F.to_date("ts").alias("event_date")
    )
    out = str(tmp_path / "orc_out")
    write_clustered(
        ev, out, partition_by=("event_date",), sort_by=("user_id",), fmt="orc"
    )
    back = spark.read.orc(out)
    assert back.count() == ev.count()
    assert {r["event_id"] for r in back.select("event_id").collect()} == {
        r["event_id"] for r in ev.select("event_id").collect()
    }
    plan = (
        back.where(F.col("user_id") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "orc" in plan.lower()
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters: [")[1][:80]
