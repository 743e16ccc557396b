"""Round-15 hardening of the delete fast path (the four ADVICE r14
findings + the spurious-analyzer-ERROR item): eligibility for the
partition-only membership probe is proven from the predicate's OWN
expression tree before the JVM analyzer ever sees it, file-context and
random expressions are rejected (they analyze fine against the probe
frame but evaluate differently there), probe values are cast INSIDE
Spark so the session timezone governs both paths, disabled partition
type inference is mirrored, and the batched counters verify each
leaf's own footer schema before trusting a single-schema union read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.io.compact import (
    _fs_for,
    _partition_only_membership,
    delete_parquet_where,
    vacuum_parquet,
)


def _make_partitioned(spark, path: str, n_days: int = 3):
    spark.range(0, 30 * n_days).selectExpr(
        "id AS k", f"id % {n_days} AS day"
    ).write.partitionBy("day").parquet(path)
    fs = _fs_for(spark, path)
    return fs, fs.leaf_dirs(path)


def test_membership_rejects_file_context_and_random(spark, tmp_path):
    """ADVICE r14 #1: input_file_name()/spark_partition_id()/
    monotonically_increasing_id()/rand() analyze successfully against
    the driver-side probe frame while evaluating differently there —
    e.g. `input_file_name() NOT LIKE '%bad%'` sees an EMPTY file name
    on the probe, marks every leaf a full match, and manifest-drops
    whole leaves the exact scan path would keep.  The membership probe
    must refuse them in BOTH spellings (SQL string and Column API)."""
    path = str(tmp_path / "t")
    _, leaves = _make_partitioned(spark, path)
    rejected = [
        F.expr("input_file_name() NOT LIKE '%bad%'"),
        F.expr("day < 2 OR input_file_name() LIKE '%x%'"),
        F.expr("spark_partition_id() = 0"),
        F.expr("monotonically_increasing_id() < 10"),
        F.expr("rand() < 0.5"),
        ~F.input_file_name().like("%bad%"),
        F.spark_partition_id() == 0,
        F.monotonically_increasing_id() < 10,
        F.rand() < F.lit(0.5),
    ]
    for cond in rejected:
        assert _partition_only_membership(spark, path, leaves, cond) is None
    # ...while the plain partition-only shape still fast-paths
    got = _partition_only_membership(spark, path, leaves, F.expr("day < 1"))
    assert got is not None and sum(got.values()) == 1


def test_membership_rejects_star_subquery_and_multipart(spark, tmp_path):
    """Star expansion and subqueries smuggle references the driver-side
    walk cannot enumerate; multi-part names (struct access, qualified
    refs) cannot name a scalar partition column.  All must route to
    the exact scan path, silently."""
    path = str(tmp_path / "t")
    _, leaves = _make_partitioned(spark, path)
    for cond in (
        F.expr("concat_ws(',', *) = ''"),
        F.expr("day IN (SELECT 1)"),
        F.expr("t.day < 5"),
        F.expr("s.field = 1"),
    ):
        assert _partition_only_membership(spark, path, leaves, cond) is None


def test_membership_data_column_never_reaches_the_analyzer(
    spark, tmp_path, monkeypatch
):
    """VERDICT r14 'what's wrong' #2: a data-column predicate used to
    be discovered by LETTING ANALYSIS FAIL against the probe frame,
    which stack-traced an UNRESOLVED_COLUMN ERROR into driver logs on
    every routine opt-out delete.  Now the reference walk decides
    BEFORE any probe frame exists: no createDataFrame, no analyzer
    call, no error log — just a silent None routing to the scan path."""
    path = str(tmp_path / "t")
    _, leaves = _make_partitioned(spark, path)
    calls = {"n": 0}
    cls = type(spark)
    real = cls.createDataFrame

    def counting(self, *a, **kw):
        calls["n"] += 1
        return real(self, *a, **kw)

    monkeypatch.setattr(cls, "createDataFrame", counting)
    got = _partition_only_membership(
        spark, path, leaves, F.expr("k < 100 AND day < 2")
    )
    monkeypatch.undo()
    assert got is None and calls["n"] == 0
    # end to end: the delete still lands exactly, via the scan path
    rep = delete_parquet_where(spark, path, "k < 100 AND day < 2")
    assert rep["n_deleted"] > 0
    assert spark.read.parquet(path).where("k < 100 AND day < 2").count() == 0


def test_membership_nondet_udf_caught_by_analyzed_plan(spark, tmp_path):
    """Belt vs suspenders: a nondeterministic UDF is invisible to the
    function-name blocklist (its class is PythonUDF, not a name), but
    after resolution Catalyst marks it Nondeterministic — the
    analyzed-plan determinism gate must refuse it."""
    from pyspark.sql.functions import udf

    path = str(tmp_path / "t")
    _, leaves = _make_partitioned(spark, path)
    flaky = udf(lambda x: True, "boolean").asNondeterministic()
    assert (
        _partition_only_membership(spark, path, leaves, flaky(F.col("day")))
        is None
    )
    # a DETERMINISTIC udf over a partition column is allowed: it
    # evaluates identically on the probe and on the scan
    stable = udf(lambda x: x == 1, "boolean")
    got = _partition_only_membership(spark, path, leaves, stable(F.col("day")))
    assert got is not None and sum(got.values()) == 1


def test_membership_case_insensitive_partition_refs(spark, tmp_path):
    """Spark resolves column references case-insensitively by default;
    the reference walk must too, or `DAY < 2` would silently lose the
    fast path (and under the old code reach the analyzer)."""
    path = str(tmp_path / "t")
    _, leaves = _make_partitioned(spark, path)
    got = _partition_only_membership(spark, path, leaves, F.expr("DAY < 2"))
    assert got is not None and sum(got.values()) == 2


def test_timestamp_partitions_respect_session_timezone(
    spark, tmp_path, monkeypatch
):
    """ADVICE r14 #2: the old probe converted partition strings to
    naive Python datetimes and fed createDataFrame, where
    TimestampType.toInternal interprets them in the DRIVER OS timezone
    (time.mktime), while the scan path casts the same strings under
    spark.sql.session.timeZone.  With the session pinned to
    America/New_York on this UTC driver, a `ts <
    TIMESTAMP'2024-01-02 00:00:00'` cutoff lands at 05:00Z — the old
    probe would read the `2024-01-02 03:00:00` leaf as 03:00Z < 05:00Z
    and wrongly manifest-drop it; cast-inside-Spark keeps it (03:00 NY
    is after midnight NY).  The fast path must still ENGAGE (zero
    per-leaf scan reads: full-match leaves retire by manifest,
    zero-match leaves price from footers)."""
    import pyspark.sql.readwriter as rw

    path = str(tmp_path / "ts")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.createDataFrame(
            [
                (i, ts)
                for ts in ("2024-01-01 22:00:00", "2024-01-02 03:00:00")
                for i in range(5)
            ],
            "k long, ts string",
        ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts").write.partitionBy(
            "ts"
        ).parquet(path)

        calls = {"n": 0}
        real = rw.DataFrameReader.parquet

        def counting(self, *a, **kw):
            calls["n"] += 1
            return real(self, *a, **kw)

        monkeypatch.setattr(rw.DataFrameReader, "parquet", counting)
        rep = delete_parquet_where(
            spark, path, "ts < TIMESTAMP'2024-01-02 00:00:00'"
        )
        monkeypatch.undo()
        assert calls["n"] == 0, "fast path must engage (no scan jobs)"
        assert rep["n_deleted"] == 5 and rep["rows_after"] == 5
        left = spark.read.parquet(path)
        assert left.count() == 5
        assert (
            left.selectExpr(
                "date_format(min(ts), 'yyyy-MM-dd HH:mm:ss')"
            ).first()[0]
            == "2024-01-02 03:00:00"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_disabled_type_inference_probes_as_string(
    spark, tmp_path, monkeypatch
):
    """ADVICE r14 #4: with
    spark.sql.sources.partitionColumnTypeInference.enabled=false Spark
    types every partition column STRING and compares lexicographically
    — `part < '5'` then matches '10' (because '1' < '5') and NOT '9'.
    A typed probe would flip both.  The fast path must mirror the
    string typing under that configuration (and still engage: zero
    scan reads)."""
    import pyspark.sql.readwriter as rw

    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    path = str(tmp_path / "inf")
    spark.range(0, 20).selectExpr(
        "id AS k", "CASE WHEN id % 2 = 0 THEN 9 ELSE 10 END AS part"
    ).write.partitionBy("part").parquet(path)
    prev = spark.conf.get(key, "true")
    try:
        spark.conf.set(key, "false")
        # the scan path's own semantics under this conf, as reference
        assert dict(spark.read.parquet(path).dtypes)["part"] == "string"
        calls = {"n": 0}
        real = rw.DataFrameReader.parquet

        def counting(self, *a, **kw):
            calls["n"] += 1
            return real(self, *a, **kw)

        monkeypatch.setattr(rw.DataFrameReader, "parquet", counting)
        rep = delete_parquet_where(spark, path, "part < '5'")
        monkeypatch.undo()
        assert calls["n"] == 0, "fast path must engage (no scan jobs)"
        assert rep["n_deleted"] == 10  # the part=10 leaf, lexicographic
        left = spark.read.parquet(path)
        assert left.count() == 10
        assert {r["part"] for r in left.select("part").distinct().collect()} == {
            "9"
        }
    finally:
        spark.conf.set(key, prev)


def test_batched_delete_counts_surface_missing_column_drift(spark, tmp_path):
    """ADVICE r14 #3: the batched counter reads all leaves in ONE
    union whose schema comes from a single file — a leaf whose files
    LACK the predicate's data column would yield NULLs and be silently
    counted as zero-match (the delete no-ops on it).  The footer-schema
    check must route such corpora to the per-leaf fallback, which
    RAISES and surfaces the drift instead of silently skipping."""
    import os

    path = str(tmp_path / "drift")
    spark.createDataFrame(
        [(i, i * 10, 0) for i in range(10)], "k long, v long, part long"
    ).write.partitionBy("part").parquet(path)
    spark.createDataFrame(
        [(i, 1) for i in range(10, 20)], "k long, part long"
    ).write.mode("append").partitionBy("part").parquet(path)
    with pytest.raises(Exception, match="UNRESOLVED_COLUMN|cannot resolve"):
        delete_parquet_where(spark, path, "v >= 50")
    # the per-leaf contract: the healthy leaf (sorted first) completed
    # its exact delete, the DRIFTED leaf was never silently no-oped —
    # it raised before any count, still holds all 10 rows, and a
    # re-run after fixing the drift would pick up exactly there
    healthy = spark.read.parquet(os.path.join(path, "part=0"))
    assert healthy.count() == 5 and healthy.where("v >= 50").count() == 0
    assert spark.read.parquet(os.path.join(path, "part=1")).count() == 10


def test_batched_vacuum_counts_surface_missing_key_column_drift(
    spark, tmp_path
):
    """Vacuum twin of the drift check: a leaf lacking a KEY column
    would have every row fold into one NULL-key group under the union
    read (massive phantom duplication → a destructive rewrite).  The
    footer check must route to the per-leaf fallback, which REFUSES
    with the key-drift ValueError (the d5abedf guard: the sampled
    count schema lacking the key proves the sampled file lacks it —
    never a raw unresolved-column analysis error, never a silent
    no-op)."""
    path = str(tmp_path / "vdrift")
    spark.createDataFrame(
        [(i, 0) for i in range(10)], "k long, part long"
    ).write.partitionBy("part").parquet(path)
    spark.createDataFrame(
        [(i * 100, 1) for i in range(10)], "other long, part long"
    ).write.mode("append").partitionBy("part").parquet(path)
    with pytest.raises(ValueError, match="lacks key column"):
        vacuum_parquet(spark, path, ["k"], per_leaf=True)
    assert spark.read.parquet(path, path).count() == 20


def test_footer_column_names_both_arms(spark, tmp_path):
    """The footer schema probe must agree between the local pyarrow
    arm and the Hadoop ranged-tail-read arm (file:// is the test
    scheme for the latter, exactly like footer_num_rows)."""
    path = str(tmp_path / "cols")
    spark.createDataFrame([(1, "a", 2.5)], "k long, s string, x double")\
        .coalesce(1).write.parquet(path)
    local = _fs_for(spark, path)
    remote = _fs_for(spark, f"file://{path}")
    lf = local.parquet_files(path)[0]
    rf = remote.parquet_files(remote.normalize(f"file://{path}"))[0]
    want = {"k", "s", "x"}
    assert local.footer_column_names(*lf) == want
    assert remote.footer_column_names(*rf) == want


def test_batched_delete_counts_surface_nested_field_drift(spark, tmp_path):
    """Nested twin of the missing-column drift check: a leaf whose
    STRUCT lacks the referenced field passes a top-level footer check
    (the struct column exists everywhere) but the union read would
    NULL-fill ``s.x`` and silently zero-match the delete on that leaf.
    The counters must verify full footer FIELD paths and route to the
    per-leaf fallback, which raises and surfaces the drift."""
    import os

    from yodel_etl_spark.io.compact import (
        _batched_leaf_counts,
        _predicate_tree_info,
    )

    path = str(tmp_path / "ndrift")
    spark.createDataFrame(
        [(i, (i, i * 2), 0) for i in range(10)],
        "k long, s struct<x: long, y: long>, part long",
    ).write.partitionBy("part").parquet(path)
    spark.createDataFrame(
        [(i, (i * 3,), 1) for i in range(10, 20)],
        "k long, s struct<y: long>, part long",
    ).write.mode("append").partitionBy("part").parquet(path)
    cond = F.expr("s.x >= 5")
    info = _predicate_tree_info(spark, cond)
    assert info is not None and info["multi"] == {"s.x"}
    fs = _fs_for(spark, path)
    leaves = fs.leaf_dirs(path)
    files_map = {leaf: fs.parquet_files(leaf) for leaf in leaves}
    assert (
        _batched_leaf_counts(spark, path, leaves, files_map, cond, fs)
        is None
    ), "struct-field drift must route to the per-leaf fallback"
    with pytest.raises(Exception, match="FIELD_NOT_FOUND|No such struct field|cannot resolve"):
        delete_parquet_where(spark, path, "s.x >= 5")
    # the drifted leaf was never silently no-oped: still all 10 rows
    assert spark.read.parquet(os.path.join(path, "part=1")).count() == 10


def test_batched_delete_counts_accept_uniform_nested_field(spark, tmp_path):
    """Positive control: when every leaf's footer carries the full
    ``s.x`` path, the nested predicate stays on the batched one-job
    path and the delete is exact."""
    from yodel_etl_spark.io.compact import _batched_leaf_counts

    path = str(tmp_path / "nok")
    spark.createDataFrame(
        [(i, (i, i * 2), i % 2) for i in range(20)],
        "k long, s struct<x: long, y: long>, part long",
    ).write.partitionBy("part").parquet(path)
    cond = F.expr("s.x >= 10")
    fs = _fs_for(spark, path)
    leaves = fs.leaf_dirs(path)
    files_map = {leaf: fs.parquet_files(leaf) for leaf in leaves}
    counts = _batched_leaf_counts(spark, path, leaves, files_map, cond, fs)
    assert counts is not None
    assert sum(n for n, _ in counts.values()) == 20
    assert sum(nm for _, nm in counts.values()) == 10
    rep = delete_parquet_where(spark, path, "s.x >= 10")
    assert rep["n_deleted"] == 10
    assert spark.read.parquet(path).where("s.x >= 10").count() == 0


def test_footer_field_paths_both_arms(spark, tmp_path):
    """The nested footer schema probe must agree between arms and
    descend structs only (list/map elements are not dot-addressable,
    so the walk stops at them — conservative routing to the exact
    fallback for predicates that cross one)."""
    path = str(tmp_path / "nested")
    spark.createDataFrame(
        [(1, (2, (3.5, "a")), [4], {"k": 5})],
        "k long, s struct<x: long, inner: struct<f: double, g: string>>, "
        "arr array<long>, m map<string, long>",
    ).coalesce(1).write.parquet(path)
    local = _fs_for(spark, path)
    remote = _fs_for(spark, f"file://{path}")
    lf = local.parquet_files(path)[0]
    rf = remote.parquet_files(remote.normalize(f"file://{path}"))[0]
    want = {"k", "s", "s.x", "s.inner", "s.inner.f", "s.inner.g", "arr", "m"}
    assert local.footer_field_paths(*lf) == want
    assert remote.footer_field_paths(*rf) == want


def test_schema_report_names_the_drift(spark, tmp_path):
    """The diagnostic behind every drift refusal/fallback: per-leaf
    footer inventory (metadata-grain, no Spark jobs) that names which
    leaves lack which fields — nested struct paths included,
    partition-path columns excluded."""
    from yodel_etl_spark.io.compact import schema_report

    path = str(tmp_path / "rep")
    spark.createDataFrame(
        [(i, (i, i * 2), 0) for i in range(5)],
        "k long, s struct<x: long, y: long>, part long",
    ).write.partitionBy("part").parquet(path)
    spark.createDataFrame(
        [(i, (i * 3,), 1) for i in range(5)],
        "k long, s struct<y: long>, part long",
    ).write.mode("append").partitionBy("part").parquet(path)
    rep = schema_report(spark, path)
    assert not rep["uniform"]
    assert rep["n_leaves"] == 2
    assert "s.x" in rep["union"] and "k" in rep["union"]
    (bad_leaf,) = rep["missing"]
    assert bad_leaf.endswith("part=1")
    assert rep["missing"][bad_leaf] == ["s.x"]
    # partition-path columns are never reported missing
    assert all("part" not in v for v in rep["missing"].values())

    # uniform corpus: empty drift map, uniform=True
    clean = str(tmp_path / "clean")
    spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "k long, part long"
    ).write.partitionBy("part").parquet(clean)
    crep = schema_report(spark, clean)
    assert crep["uniform"] and crep["missing"] == {}


def test_schema_report_per_file_catches_within_leaf_drift(spark, tmp_path):
    """Leaf-sampled probes share the per-leaf read's single-schema
    blind spot; per_file=True reads every footer and surfaces a
    column present in only SOME of a leaf's files — the grain the
    re-layout guard checks."""
    from yodel_etl_spark.io.compact import schema_report

    path = str(tmp_path / "wl")
    spark.createDataFrame(
        [(1, 0)], "k long, part long"
    ).coalesce(1).write.partitionBy("part").parquet(path)
    spark.createDataFrame(
        [(2, "x", 0)], "k long, extra string, part long"
    ).coalesce(1).write.mode("append").partitionBy("part").parquet(path)
    rep = schema_report(spark, path, per_file=True)
    (leaf,) = rep["within_leaf_drift"]
    assert rep["within_leaf_drift"][leaf] == ["extra"]
    assert rep["n_files"] == 2

    # the Hadoop arm agrees (file:// — the remote test scheme)
    hrep = schema_report(spark, f"file://{path}", per_file=True)
    assert list(hrep["within_leaf_drift"].values()) == [["extra"]]


def test_schema_report_reports_unreadable_footers(spark, tmp_path):
    """A corrupt footer must be REPORTED, not raised — this is the
    diagnostic operators run when the maintenance ops refuse."""
    import os

    from yodel_etl_spark.io.compact import schema_report

    path = str(tmp_path / "corrupt")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "k long, part long"
    ).coalesce(1).write.partitionBy("part").parquet(path)
    victim = next(
        os.path.join(dp, f)
        for dp, _d, fl in os.walk(path)
        for f in fl
        if f.endswith(".parquet")
    )
    with open(victim, "r+b") as fh:  # truncate: footer magic gone
        fh.truncate(4)
    rep = schema_report(spark, path, per_file=True)
    assert rep["unreadable"] == [victim]
    assert not rep["uniform"]
    assert "k" in rep["union"]  # the healthy leaf still inventories


def test_compact_preserves_drifted_extra_column(spark, tmp_path):
    """Compaction rewrites a fragmented leaf from a merged schema: a
    column present in only SOME of the leaf's files must survive
    NULL-filled, not be dropped by the sampled single-schema read."""
    from yodel_etl_spark.io.compact import compact_parquet

    path = str(tmp_path / "cdrift")
    spark.createDataFrame(
        [(i,) for i in range(5)], "k long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(i, f"x{i}") for i in range(5, 10)], "k long, extra string"
    ).coalesce(1).write.mode("append").parquet(path)
    reps = compact_parquet(spark, path, target_bytes=1 << 30, min_files=2)
    assert any(r["rewritten"] for r in reps)
    got = spark.read.parquet(path)
    assert "extra" in got.columns and got.count() == 10
    assert got.where("k >= 5 AND extra != concat('x', k)").count() == 0
    assert got.where("k < 5 AND extra IS NOT NULL").count() == 0


def test_vacuum_refuses_within_leaf_key_drift(spark, tmp_path):
    """A file inside the leaf whose footer lacks the KEY column would
    NULL-key its rows under the merged read and collapse them into one
    survivor — per-leaf sampling cannot see this (the other file
    carries the key), so the rewrite itself must refuse."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = str(tmp_path / "vwl")
    spark.createDataFrame(
        [(i, i) for i in range(6)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(100 + i,) for i in range(6)], "v long"
    ).coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="lacks key column"):
        vacuum_parquet(spark, path, ["k"])
    # refusal left every row in place
    assert (
        spark.read.option("mergeSchema", "true").parquet(path).count() == 12
    )


def test_vacuum_preserves_drifted_extra_column(spark, tmp_path):
    """When every file carries the keys, a drifted EXTRA column must
    survive the dedup rewrite NULL-filled."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = str(tmp_path / "vextra")
    spark.createDataFrame(
        [(i, i) for i in range(6)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(i, i, f"x{i}") for i in range(3, 9)],
        "k long, v long, extra string",
    ).coalesce(1).write.mode("append").parquet(path)
    rep = vacuum_parquet(spark, path, ["k"])
    assert rep["rewritten"] and rep["rows_after"] == 9
    got = spark.read.parquet(path)
    assert "extra" in got.columns and got.count() == 9
    # keys only ever written without the column are NULL; keys whose
    # surviving copy carried it may keep it (pick-dependent for 3..5)
    assert got.where("k < 3 AND extra IS NOT NULL").count() == 0
    assert got.where(
        "k >= 6 AND extra != concat('x', k)"
    ).count() == 0


def test_delete_rewrite_preserves_drifted_extra_column(spark, tmp_path):
    """Survivor rewrites read the merged schema: deleting rows from a
    leaf must not drop a column that only some files carry; rows from
    files lacking the predicate column evaluate NULL and SURVIVE (the
    documented affirmative-selection contract)."""
    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "ddrift")
    spark.createDataFrame(
        [(i, i * 10) for i in range(6)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(100 + i, 1000, f"x{i}") for i in range(4)],
        "k long, v long, extra string",
    ).coalesce(1).write.mode("append").parquet(path)
    rep = delete_parquet_where(spark, path, "v >= 30 AND v < 100")
    assert rep["n_deleted"] == 3 and rep["rewritten"]
    got = spark.read.parquet(path)
    assert "extra" in got.columns and got.count() == 7
    assert got.where("k >= 100 AND extra IS NULL").count() == 0
