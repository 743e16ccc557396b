"""Small-files compaction (io/compact.py): fragmented leaves rewrite
to ~target-size files with values preserved exactly, healthy leaves
stay byte-identical, partition directories compact independently, and
a second run is a no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from yodel_etl_spark.io.compact import compact_parquet


def _file_count(d):
    return sum(f.endswith(".parquet") for f in os.listdir(d))


def test_compact_fragmented_table(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10_000).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before = spark.read.parquet(path).toPandas().sort_values("id").reset_index(drop=True)
    assert _file_count(path) == 40

    reports = compact_parquet(spark, path, target_bytes=512 * 1024)
    assert len(reports) == 1 and reports[0]["rewritten"]
    assert reports[0]["n_files_before"] == 40
    assert reports[0]["n_files_after"] < 5

    after = spark.read.parquet(path).toPandas().sort_values("id").reset_index(drop=True)
    assert before.equals(after)  # values preserved exactly

    # idempotence: second run is a listing-only no-op
    again = compact_parquet(spark, path, target_bytes=512 * 1024)
    assert not again[0]["rewritten"]
    assert again[0]["n_files_before"] == reports[0]["n_files_after"]


def test_compact_skips_healthy_directory(spark, tmp_path):
    path = str(tmp_path / "healthy")
    spark.range(10_000).coalesce(1).write.parquet(path)
    files_before = sorted(os.listdir(path))
    mtimes = {f: os.path.getmtime(os.path.join(path, f)) for f in files_before}
    reports = compact_parquet(spark, path, target_bytes=4 * 1024)
    assert not reports[0]["rewritten"]
    assert sorted(os.listdir(path)) == files_before
    assert all(
        os.path.getmtime(os.path.join(path, f)) == mtimes[f] for f in mtimes
    )  # byte-untouched


def test_compact_partitioned_per_leaf(spark, tmp_path):
    """Only the fragmented partition rewrites; the healthy one is
    untouched — the unit of work is the leaf directory."""
    path = str(tmp_path / "part")
    df = spark.range(4_000).select(
        (F.col("id") % 2).alias("p"), "id", (F.col("id") * 3).alias("v")
    )
    # p=0 fragmented (20 files), p=1 healthy (1 file)
    df.where("p = 0").repartition(20).write.parquet(path + "/p=0")
    df.where("p = 1").coalesce(1).write.parquet(path + "/p=1")
    before = (
        spark.read.parquet(path + "/p=0", path + "/p=1")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    reports = {r["dir"].rsplit("/", 1)[-1]: r for r in compact_parquet(
        spark, path, target_bytes=512 * 1024
    )}
    assert reports["p=0"]["rewritten"] and not reports["p=1"]["rewritten"]
    assert _file_count(path + "/p=0") < 20
    after = (
        spark.read.parquet(path + "/p=0", path + "/p=1")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert before.equals(after)


def test_compact_recovers_from_stale_staging(spark, tmp_path):
    """A crashed prior run's _compacting leftovers must not poison the
    next run."""
    path = str(tmp_path / "crashy")
    spark.range(1_000).repartition(10).write.parquet(path)
    stage = os.path.join(os.path.dirname(path), "_compact_stage_crashy", "_root")
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, "junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    n = spark.read.parquet(path).count()
    reports = compact_parquet(spark, path, target_bytes=512 * 1024)
    assert reports[0]["rewritten"]
    assert spark.read.parquet(path).count() == n
    assert not os.path.exists(stage)


def test_staging_lives_outside_the_table_root(spark, tmp_path):
    """Staging must never sit inside the table root: a dir named x=y in
    there is parsed as a phantom partition COLUMN by discovery (the `_`
    prefix shields files, not directories) and breaks whole-table
    reads.  Compact a fragmented partition and assert the staged path
    the op used was a sibling of the root, the table reads clean
    mid-crash-equivalent (stale stage left on disk), and values
    survive."""
    path = str(tmp_path / "tbl")
    df = spark.range(4_000).select((F.col("id") % 2).alias("p"), "id")
    df.where("p = 0").repartition(20).write.parquet(path + "/p=0")
    df.where("p = 1").coalesce(1).write.parquet(path + "/p=1")
    # simulate a crashed run: pre-create a stale stage with junk
    stale_root = os.path.join(os.path.dirname(path), "_compact_stage_tbl")
    os.makedirs(os.path.join(stale_root, "p=0"), exist_ok=True)
    with open(os.path.join(stale_root, "p=0", "junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    # the table itself reads clean despite the stale sibling
    assert spark.read.parquet(path + "/p=0", path + "/p=1").count() == 4_000
    reports = compact_parquet(spark, path, target_bytes=512 * 1024)
    by = {r["dir"].rsplit("/", 1)[-1]: r for r in reports}
    assert by["p=0"]["rewritten"]
    assert spark.read.parquet(path + "/p=0", path + "/p=1").count() == 4_000
    # nothing named with an '=' was ever created inside the root
    assert all("_compact" not in d for d in os.listdir(path))
