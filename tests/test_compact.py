"""Small-files compaction (io/compact.py): fragmented leaves rewrite
to ~target-size files with values preserved exactly, healthy leaves
stay byte-identical, partition directories compact independently, and
a second run is a no-op."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import yodel_etl_spark.io.compact as compact_mod
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


def _frag_table(spark, tmp_path, name, n_files=10):
    path = str(tmp_path / name)
    df = spark.range(5_000).select("id", (F.col("id") * 7).alias("v"))
    df.repartition(n_files).write.parquet(path)
    before = (
        spark.read.parquet(path).toPandas().sort_values("id").reset_index(drop=True)
    )
    return path, before


def _rows(spark, path):
    return spark.read.parquet(path).toPandas().sort_values("id").reset_index(drop=True)


def test_crash_after_commit_before_install_loses_nothing(spark, tmp_path, monkeypatch):
    """Kill the swap at its most dangerous point — manifest committed,
    zero staged files installed, originals still in place — and show the
    re-run FINISHES the swap with zero row loss (the pre-fix code
    rmtree'd the stage here only AFTER originals were already gone)."""
    path, before = _frag_table(spark, tmp_path, "crash_commit")

    def boom(fs, stage, leaf):
        raise RuntimeError("simulated crash at commit point")

    monkeypatch.setattr(compact_mod, "_finish_swap", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_parquet(spark, path, target_bytes=512 * 1024)
    # crash window: originals untouched, table reads complete
    assert _rows(spark, path).equals(before)
    monkeypatch.undo()

    reports = compact_parquet(spark, path, target_bytes=512 * 1024)
    assert reports[0]["recovered"]
    assert _rows(spark, path).equals(before)  # zero loss, zero duplicates
    assert not os.path.exists(
        os.path.join(str(tmp_path), "_compact_stage_crash_commit")
    )
    assert _file_count(path) < 10  # the recovered swap really compacted


def test_crash_mid_install_loses_nothing(spark, tmp_path, monkeypatch):
    """Crash after SOME staged files moved into the leaf: the re-run
    installs the remainder and retires the originals — rows exact."""
    path, before = _frag_table(spark, tmp_path, "crash_install")
    # size the target so the rewrite emits ~3 staged files (n_out ≥ 2)
    # while the leaf still classifies as fragmented (mean < target/2)
    total = sum(sz for _, sz in compact_mod._LocalFS().parquet_files(path))
    target = total // 3

    moved = {"n": 0}
    real_move = compact_mod._move

    def move_once_then_crash(src, dst):
        if moved["n"] >= 1:
            raise RuntimeError("simulated crash mid-install")
        moved["n"] += 1
        return real_move(src, dst)

    monkeypatch.setattr(compact_mod, "_move", move_once_then_crash)
    with pytest.raises(RuntimeError, match="mid-install"):
        compact_parquet(spark, path, target_bytes=target)
    assert moved["n"] == 1  # exactly one staged file landed pre-crash
    monkeypatch.undo()

    reports = compact_parquet(spark, path, target_bytes=target)
    assert reports[0]["recovered"]
    assert _rows(spark, path).equals(before)


def test_crash_mid_retire_loses_nothing(spark, tmp_path, monkeypatch):
    """Crash after all staged files installed but only SOME originals
    deleted (the brief duplicate-visible window): the re-run retires the
    rest and the table is exact — no loss AND no lingering duplicates."""
    path, before = _frag_table(spark, tmp_path, "crash_retire")

    removed = {"n": 0}
    real_remove = compact_mod._remove

    def remove_twice_then_crash(p):
        if removed["n"] >= 2:
            raise RuntimeError("simulated crash mid-retire")
        removed["n"] += 1
        return real_remove(p)

    monkeypatch.setattr(compact_mod, "_remove", remove_twice_then_crash)
    with pytest.raises(RuntimeError, match="mid-retire"):
        compact_parquet(spark, path, target_bytes=512 * 1024)
    monkeypatch.undo()

    reports = compact_parquet(spark, path, target_bytes=512 * 1024)
    assert reports[0]["recovered"]
    assert _rows(spark, path).equals(before)


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


def test_concurrent_leaf_compaction_matches_serial(spark, tmp_path):
    """max_concurrency > 1 rewrites leaves from a thread pool; the
    reports (leaf order, flags, file counts) and the table values must
    be identical to the serial pass — leaves are independent units, so
    concurrency must be unobservable in the result."""
    def build(path):
        df = spark.range(6_000).select(
            (F.col("id") % 6).alias("p"), "id", (F.col("id") * 3).alias("v")
        )
        for p in range(6):
            df.where(F.col("p") == p).repartition(10).write.parquet(
                f"{path}/p={p}"
            )

    serial, conc = str(tmp_path / "ser"), str(tmp_path / "conc")
    build(serial)
    build(conc)
    r_ser = compact_parquet(spark, serial, target_bytes=512 * 1024)
    r_conc = compact_parquet(
        spark, conc, target_bytes=512 * 1024, max_concurrency=4
    )
    strip = lambda rs, root: [
        {**r, "dir": os.path.relpath(r["dir"], root)} for r in rs
    ]
    assert strip(r_ser, serial) == strip(r_conc, conc)
    assert all(r["rewritten"] and r["n_files_after"] == 1 for r in r_conc)
    a = spark.read.parquet(serial).toPandas().sort_values("id").reset_index(drop=True)
    b = spark.read.parquet(conc).toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)
    # idempotence holds under concurrency too
    again = compact_parquet(spark, conc, target_bytes=512 * 1024, max_concurrency=4)
    assert all(not r["rewritten"] for r in again)


def test_stage_key_is_injective_for_colliding_leaf_names(spark, tmp_path, monkeypatch):
    """A literal directory `a=1__b=2` and a nested `a=1/b=2` used to
    flatten to the SAME stage dir; under max_concurrency > 1 the two
    rewrites then share a stage and the later overwrite can delete the
    earlier's committed staged files — a data-loss race serial mode
    never had.  The flattened key now carries a digest of the raw
    relative path, so the stages must be distinct."""
    path = str(tmp_path / "coll")
    df = spark.range(2_000).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(8).write.parquet(f"{path}/a=1/b=2")
    df.repartition(8).write.parquet(f"{path}/a=1__b=2")

    stages = []
    orig = compact_mod._finish_swap

    def spy(fs, stage, leaf):
        stages.append(stage)
        return orig(fs, stage, leaf)

    monkeypatch.setattr(compact_mod, "_finish_swap", spy)
    reports = compact_parquet(spark, path, target_bytes=512 * 1024)
    assert len(reports) == 2 and all(r["rewritten"] for r in reports)
    assert len(stages) == 2 and len(set(stages)) == 2, (
        "colliding leaf names must map to distinct stage dirs"
    )
    for leaf in (f"{path}/a=1/b=2", f"{path}/a=1__b=2"):
        assert spark.read.parquet(leaf).count() == 2_000


def test_recovery_finishes_legacy_pre_digest_stage(spark, tmp_path, monkeypatch):
    """Upgrade safety: a committed swap staged under the OLD
    (pre-digest) flattened name must still be FINISHED by the new
    code's recovery — orphaning it would leave the leaf with the
    retire step never applied (duplicate rows forever)."""
    path = str(tmp_path / "t")
    df = spark.range(1_000).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(6).write.parquet(f"{path}/p=1")
    leaf = f"{path}/p=1"

    # simulate the old version crashing mid-retire: staged files are
    # already installed, the manifest still lists the originals
    import shutil as _sh

    legacy_stage = str(tmp_path / "_compact_stage_t" / "p=1")
    os.makedirs(legacy_stage)
    originals = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
    # the "rewrite" that was installed before the crash: one compacted
    # copy of the leaf, present in the leaf alongside the originals
    spark.read.parquet(leaf).coalesce(1).write.parquet(str(tmp_path / "rw"))
    rewritten = [
        f for f in os.listdir(str(tmp_path / "rw")) if f.endswith(".parquet")
    ]
    _sh.copy(
        os.path.join(str(tmp_path / "rw"), rewritten[0]),
        os.path.join(leaf, "part-legacy-rewrite.parquet"),
    )
    with open(os.path.join(legacy_stage, "_SWAP_MANIFEST"), "w") as fh:
        fh.write("\n".join(originals))

    before = spark.read.parquet(leaf).count()
    assert before == 2_000  # duplicated: originals + installed copy

    reports = compact_parquet(spark, path, target_bytes=512 * 1024)
    assert reports[0]["recovered"]
    # the legacy stage is finished: originals retired, values restored
    after = spark.read.parquet(leaf)
    assert after.count() == 1_000
    assert not os.path.isdir(legacy_stage)


def test_legacy_stage_recovers_into_its_own_leaf_only(spark, tmp_path):
    """The pre-digest legacy stage name is NOT leaf-unique: with both
    a nested `a=1/b=2` and a literal `a=1__b=2` leaf present, a
    committed legacy swap must finish into the leaf whose files its
    manifest actually names — never into the colliding leaf."""
    import shutil as _sh

    path = str(tmp_path / "t")
    df = spark.range(1_000).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(6).write.parquet(f"{path}/a=1/b=2")
    df.repartition(6).write.parquet(f"{path}/a=1__b=2")
    nested, literal = f"{path}/a=1/b=2", f"{path}/a=1__b=2"
    nested_before = sorted(os.listdir(nested))

    # committed legacy swap FOR THE LITERAL LEAF, crashed mid-retire:
    # installed copy present, originals still listed in the manifest
    legacy_stage = str(tmp_path / "_compact_stage_t" / "a=1__b=2")
    os.makedirs(legacy_stage)
    originals = [f for f in os.listdir(literal) if f.endswith(".parquet")]
    spark.read.parquet(literal).coalesce(1).write.parquet(str(tmp_path / "rw"))
    rewritten = [
        f for f in os.listdir(str(tmp_path / "rw")) if f.endswith(".parquet")
    ]
    _sh.copy(
        os.path.join(str(tmp_path / "rw"), rewritten[0]),
        os.path.join(literal, "part-legacy-rewrite.parquet"),
    )
    with open(os.path.join(legacy_stage, "_SWAP_MANIFEST"), "w") as fh:
        fh.write("\n".join(originals))

    compact_parquet(spark, path, target_bytes=512 * 1024, max_concurrency=2)
    # literal leaf: swap finished (originals retired, values restored)
    assert spark.read.parquet(literal).count() == 1_000
    assert not os.path.isdir(legacy_stage)
    # nested leaf: never received the literal leaf's staged files —
    # it was compacted normally from its OWN originals
    assert spark.read.parquet(nested).count() == 1_000
    assert not any(
        f.startswith("part-legacy") for f in os.listdir(nested)
    ), sorted(os.listdir(nested))
    assert sorted(os.listdir(nested)) != nested_before  # own rewrite ran


def test_fully_finished_legacy_stage_is_reaped_not_orphaned(spark, tmp_path):
    """ADVICE r11: a committed legacy stage whose install AND retire
    both completed (no staged parquet, manifest basenames exist nowhere
    under the root) used to be skipped by the ownership check forever —
    re-probed by every colliding leaf on every pass.  It is provably
    finished, so the next compaction reaps it."""
    path = str(tmp_path / "t")
    df = spark.range(1_000).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(6).write.parquet(f"{path}/p=1")

    # a finished legacy swap: manifest lists basenames that no longer
    # exist anywhere (retired), and no staged parquet remains (installed)
    legacy_stage = str(tmp_path / "_compact_stage_t" / "p=1")
    os.makedirs(legacy_stage)
    with open(os.path.join(legacy_stage, "_SWAP_MANIFEST"), "w") as fh:
        fh.write("part-gone-1.parquet\npart-gone-2.parquet")

    before = spark.read.parquet(f"{path}/p=1").count()
    compact_parquet(spark, path, target_bytes=512 * 1024)
    assert not os.path.isdir(legacy_stage), "finished stage not reaped"
    assert spark.read.parquet(f"{path}/p=1").count() == before


def test_half_finished_legacy_stage_for_other_leaf_stays_inert(
    spark, tmp_path
):
    """The reap must NOT fire while the rightful owner still needs the
    manifest: a legacy stage whose install completed but whose retire
    did not (its originals still exist in the COLLIDING leaf) stays on
    disk when probed from the non-owning leaf, and is then finished by
    its owner in the same pass — never rmtree'd out from under it."""
    import shutil as _sh

    path = str(tmp_path / "t")
    df = spark.range(1_000).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(6).write.parquet(f"{path}/a=1/b=2")
    df.repartition(6).write.parquet(f"{path}/a=1__b=2")
    literal = f"{path}/a=1__b=2"

    legacy_stage = str(tmp_path / "_compact_stage_t" / "a=1__b=2")
    os.makedirs(legacy_stage)
    originals = [f for f in os.listdir(literal) if f.endswith(".parquet")]
    spark.read.parquet(literal).coalesce(1).write.parquet(str(tmp_path / "rw"))
    rewritten = [
        f for f in os.listdir(str(tmp_path / "rw")) if f.endswith(".parquet")
    ]
    _sh.copy(
        os.path.join(str(tmp_path / "rw"), rewritten[0]),
        os.path.join(literal, "part-legacy-rewrite.parquet"),
    )
    with open(os.path.join(legacy_stage, "_SWAP_MANIFEST"), "w") as fh:
        fh.write("\n".join(originals))

    # the nested leaf sorts FIRST (a=1/b=2 < a=1__b=2 in leaf order),
    # so its probe sees the stage before the owner finishes it — the
    # serial pass exercises exactly the wrong-leaf-probe window
    compact_parquet(spark, path, target_bytes=512 * 1024)
    assert spark.read.parquet(literal).count() == 1_000  # owner finished
    assert not os.path.isdir(legacy_stage)


def _dup_corpus(spark, tmp_path, name="corpus"):
    """A gate-corpus replica with replay duplicates: batch1 appended
    twice (the crash-between-corpus-and-index window), batch2 once."""
    path = str(tmp_path / name)
    b1 = spark.range(500).select(
        F.col("id").alias("vec_id"), (F.col("id") * 2.0).alias("v")
    )
    b2 = spark.range(500, 800).select(
        F.col("id").alias("vec_id"), (F.col("id") * 2.0).alias("v")
    )
    b1.write.mode("append").parquet(path)
    b1.write.mode("append").parquet(path)  # at-least-once replay
    b2.write.mode("append").parquet(path)
    return path


def test_vacuum_collapses_replay_duplicates(spark, tmp_path):
    """The ingest-gate cleanup move: one row per key afterwards, values
    intact, duplicate count reported, and a second vacuum is a no-op
    (idempotence via the duplicate-free fast path)."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = _dup_corpus(spark, tmp_path)
    assert spark.read.parquet(path).count() == 1300  # 500 dup rows

    rep = vacuum_parquet(spark, path, ["vec_id"], target_bytes=1 << 30)
    assert rep["rows_before"] == 1300 and rep["rows_after"] == 800
    assert rep["n_dup_rows"] == 500 and rep["rewritten"]
    got = spark.read.parquet(path)
    assert got.count() == 800
    assert got.select("vec_id").distinct().count() == 800
    # values intact: every key keeps its (identical) payload
    assert got.where(F.col("v") != F.col("vec_id") * 2.0).count() == 0

    rep2 = vacuum_parquet(spark, path, ["vec_id"], target_bytes=1 << 30)
    assert not rep2["rewritten"] and rep2["n_dup_rows"] == 0
    assert rep2["n_files_after"] == rep2["n_files_before"]


def test_vacuum_crash_windows_lose_no_key(spark, tmp_path, monkeypatch):
    """Two-phase contract inherited from compaction, re-proven for the
    semantic rewrite: (a) crash at the commit point leaves the corpus
    byte-identical; (b) crash mid-install leaves every key present
    (extra duplicates allowed, loss not) and the re-run finishes to
    the exact deduped table."""
    from yodel_etl_spark.io import compact as compact_mod
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = _dup_corpus(spark, tmp_path, "c1")

    def boom(fs, stage, leaf):
        raise RuntimeError("crash at vacuum commit")

    monkeypatch.setattr(compact_mod, "_finish_swap", boom)
    with pytest.raises(RuntimeError, match="vacuum commit"):
        vacuum_parquet(spark, path, ["vec_id"], target_bytes=1 << 30)
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == 1300  # byte-identical

    rep = vacuum_parquet(spark, path, ["vec_id"], target_bytes=1 << 30)
    assert rep["recovered"] or rep["rewritten"]
    assert spark.read.parquet(path).count() == 800

    # (b) mid-retire: staged files installed, SOME originals deleted
    # (the duplicate-visible window) — every key present, loss never
    path2 = _dup_corpus(spark, tmp_path, "c2")
    removed = {"n": 0}
    real_remove = compact_mod._remove

    def remove_once_then_crash(p):
        if removed["n"] >= 1:
            raise RuntimeError("crash mid-vacuum-retire")
        removed["n"] += 1
        return real_remove(p)

    monkeypatch.setattr(compact_mod, "_remove", remove_once_then_crash)
    with pytest.raises(RuntimeError, match="mid-vacuum-retire"):
        vacuum_parquet(spark, path2, ["vec_id"], target_bytes=1 << 30)
    monkeypatch.undo()
    # crash window: every key still present (dupes allowed, loss not)
    assert spark.read.parquet(path2).select("vec_id").distinct().count() == 800
    assert spark.read.parquet(path2).count() > 800  # the visible window

    rep = vacuum_parquet(spark, path2, ["vec_id"], target_bytes=1 << 30)
    assert rep["recovered"]
    assert spark.read.parquet(path2).count() == 800


def test_vacuum_refuses_partitioned_tables_and_handles_empty(
    spark, tmp_path
):
    from yodel_etl_spark.io.compact import vacuum_parquet

    nested = str(tmp_path / "t")
    spark.range(10).withColumn("p", F.col("id") % 2).write.partitionBy(
        "p"
    ).parquet(nested)
    with pytest.raises(ValueError, match="FLAT"):
        vacuum_parquet(spark, nested, ["id"])
    empty = str(tmp_path / "nothing")
    rep = vacuum_parquet(spark, empty, ["id"])
    assert rep["rows_before"] == 0 and not rep["rewritten"]


def test_vacuum_then_gate_probe_still_gates(spark, tmp_path):
    """End-to-end with the embedding gate: replay-duplicate the corpus
    via a crash between corpus append and extend, vacuum it, and show
    the INDEX (which never duplicated decisions) still gates a twin
    batch — vacuum touches the corpus only, the gate machinery is
    oblivious."""
    import pytest as _pytest

    from yodel_etl_spark.io.compact import vacuum_parquet
    from yodel_etl_spark.scale import dedup as D
    from yodel_etl_spark.scale import similarity as S

    corpus = str(tmp_path / "corp")
    index = str(tmp_path / "idx")
    land = D.embedding_dedup_ingest(index, corpus, centroid_every=1)

    def onehot(d, n=8):
        v = [0.0] * n
        v[d] = 1.0
        return v

    schema = "vec_id long, embedding array<double>"
    b1 = spark.createDataFrame([(i, onehot(i)) for i in range(4)], schema)
    land(b1, 0)
    b2 = spark.createDataFrame([(10, onehot(4)), (11, onehot(5))], schema)
    real_extend = S.extend_ivf_index

    def boom(*a, **k):
        raise RuntimeError("crash between corpus append and extend")

    import unittest.mock as mock

    with mock.patch.object(S, "extend_ivf_index", boom):
        with _pytest.raises(RuntimeError, match="crash between"):
            land(b2, 1)
    land(b2, 1)  # replay: duplicate corpus append by contract
    assert spark.read.parquet(corpus).count() == 8  # 10,11 duplicated

    rep = vacuum_parquet(spark, corpus, ["vec_id"], target_bytes=1 << 30)
    assert rep["rows_after"] == 6 and rep["n_dup_rows"] == 2
    assert spark.read.parquet(corpus).count() == 6

    # the gate still gates: a twin of a landed vector is dropped
    b3 = spark.createDataFrame(
        [(20, [0.0, 0.0, 0.0, 0.0, 0.98, 0.02, 0.0, 0.0])], schema
    )
    land(b3, 2)
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(corpus).select("vec_id").distinct().collect()
    }
    assert 20 not in ids  # gated against the vacuumed corpus's index


def test_index_vacuums_collapse_replayed_extends(spark, tmp_path):
    """The index-side vacuum twins: a replayed extend duplicates
    posting rows in every index family (benign for decisions, costly
    for probe work); each family's vacuum collapses them and the
    probe results are IDENTICAL before and after."""
    from yodel_etl_spark.scale.dedup import (
        extend_minhash_index,
        probe_minhash_index,
        release,
        vacuum_minhash_index,
        write_minhash_index,
    )
    from yodel_etl_spark.scale.similarity import (
        extend_ivf_index,
        ivf_index_write,
        probe_ivf_index,
        vacuum_ivf_index,
    )

    # ------------------------------------------------------- minhash
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i} body") for i in range(30)],
        "doc_id long, text string",
    )
    mh = str(tmp_path / "mh")
    write_minhash_index(docs, mh, num_hashes=16, bands=8)
    delta = spark.createDataFrame(
        [(100 + i, f"alpha beta gamma delta epsilon zeta doc {i} body x") for i in range(5)],
        "doc_id long, text string",
    )
    extend_minhash_index(delta, mh)
    extend_minhash_index(delta, mh)  # the at-least-once replay
    probe = spark.createDataFrame(
        [(999, "alpha beta gamma delta epsilon zeta doc 3 body")],
        "doc_id long, text string",
    )
    before = probe_minhash_index(spark, mh, probe, threshold=0.3)
    hits_before = {(r["doc_inc"], r["doc_idx"]) for r in before.collect()}
    release(before)
    n_banded = spark.read.parquet(f"{mh}/banded").count()
    rep = vacuum_minhash_index(spark, mh)
    assert rep["banded"]["n_dup_rows"] == 5 * 8  # 5 docs x 8 bands
    assert rep["sets"]["n_dup_rows"] == 5
    assert spark.read.parquet(f"{mh}/banded").count() == n_banded - 40
    after = probe_minhash_index(spark, mh, probe, threshold=0.3)
    assert {(r["doc_inc"], r["doc_idx"]) for r in after.collect()} == hits_before
    release(after)

    # ----------------------------------------------------------- ivf
    vecs = spark.createDataFrame(
        [(i, [float(i % 7 + 1), float(i % 3 + 1)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    ivf = str(tmp_path / "ivf")
    ivf_index_write(vecs, "vec_id", "embedding", ivf, centroid_every=5)
    d2 = spark.createDataFrame(
        [(200, [2.0, 1.0]), (201, [3.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    extend_ivf_index(d2, ivf, "vec_id", "embedding")
    extend_ivf_index(d2, ivf, "vec_id", "embedding")  # replay
    q = spark.createDataFrame(
        [(900, [2.0, 1.0])], "vec_id long, embedding array<double>"
    )
    hb = {
        (r["id_inc"], r["id_idx"])
        for r in probe_ivf_index(
            spark, ivf, q, "vec_id", "embedding", threshold=0.99
        ).collect()
    }
    rep = vacuum_ivf_index(spark, ivf)
    assert rep["assignments"]["n_dup_rows"] == 2
    ha = {
        (r["id_inc"], r["id_idx"])
        for r in probe_ivf_index(
            spark, ivf, q, "vec_id", "embedding", threshold=0.99
        ).collect()
    }
    assert ha == hb and (900, 200) in ha


def test_hamming_index_vacuum(spark, tmp_path):
    from yodel_etl_spark.scale.dedup import (
        extend_hamming_index,
        probe_hamming_index,
        vacuum_hamming_index,
        write_hamming_index,
    )

    sk = spark.createDataFrame(
        [(i, (i * 0x9E3779B97F4A7C15) % (1 << 63)) for i in range(40)],
        "doc long, sim long",
    )
    hm = str(tmp_path / "hm")
    write_hamming_index(sk, hm, blocks=8)
    d = spark.createDataFrame([(100, 12345), (101, 99999)], "doc long, sim long")
    extend_hamming_index(d, hm)
    extend_hamming_index(d, hm)  # replay
    probe = spark.createDataFrame([(900, 12345)], "doc long, sim long")
    hb = {
        (r["doc_inc"], r["doc_idx"])
        for r in probe_hamming_index(spark, hm, probe, max_distance=2).collect()
    }
    rep = vacuum_hamming_index(spark, hm)
    assert rep["banded"]["n_dup_rows"] == 2 * 8
    ha = {
        (r["doc_inc"], r["doc_idx"])
        for r in probe_hamming_index(spark, hm, probe, max_distance=2).collect()
    }
    assert ha == hb and (900, 100) in ha


def test_vacuum_null_key_rows_converge(spark, tmp_path):
    """A NULL-key row must count as its own key group (count_distinct
    would ignore it): the report matches what dropDuplicates keeps and
    the second vacuum is a no-op — no forever-rewrite drift."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = str(tmp_path / "nullc")
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (None, "n"), (None, "n"), (2, "b")],
        "k int, v string",
    )
    df.write.mode("append").parquet(path)
    rep = vacuum_parquet(spark, path, ["k"], target_bytes=1 << 30)
    assert rep["rows_before"] == 5 and rep["rows_after"] == 3
    assert spark.read.parquet(path).count() == 3
    rep2 = vacuum_parquet(spark, path, ["k"], target_bytes=1 << 30)
    assert not rep2["rewritten"] and rep2["n_dup_rows"] == 0


def test_vacuum_concurrent_append_survives(spark, tmp_path, monkeypatch):
    """The docstring's concurrency claim, pinned: a gate append landing
    AFTER the vacuum's scan (simulated at the commit point, the latest
    possible moment) is not in the retire manifest and survives the
    swap untouched — only scan-time files retire."""
    from yodel_etl_spark.io import compact as compact_mod
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = _dup_corpus(spark, tmp_path, "conc")
    late = spark.range(9000, 9010).select(
        F.col("id").alias("vec_id"), (F.col("id") * 2.0).alias("v")
    )
    real_finish = compact_mod._finish_swap
    fired = {"n": 0}

    def append_then_finish(fs, stage, leaf):
        if fired["n"] == 0:
            fired["n"] += 1
            late.write.mode("append").parquet(leaf)  # the mid-vacuum gate append
        return real_finish(fs, stage, leaf)

    monkeypatch.setattr(compact_mod, "_finish_swap", append_then_finish)
    rep = vacuum_parquet(spark, path, ["vec_id"], target_bytes=1 << 30)
    monkeypatch.undo()
    assert rep["rows_after"] == 800  # the scan-time dedup result
    got = spark.read.parquet(path)
    assert got.count() == 810  # late batch survived alongside it
    assert got.where(F.col("vec_id") >= 9000).count() == 10


def test_vacuum_sizes_output_from_survivor_bytes(spark, tmp_path):
    """ADVICE r12: vacuum output file count scales with SURVIVOR
    bytes, not pre-dedup bytes — a heavily replayed corpus (here the
    same batch appended 8×) must collapse to the file count its
    deduplicated size implies, not 8× that, or the corpus stays
    fragmented until a later compaction pass."""
    import os

    from yodel_etl_spark.io.compact import vacuum_parquet

    path = str(tmp_path / "corpus")
    batch = spark.range(0, 2000).selectExpr(
        "id AS k", "repeat(uuid(), 8) AS payload"
    ).coalesce(1)
    batch = batch.localCheckpoint(eager=True)  # same bytes every append
    for _ in range(8):
        batch.write.mode("append").parquet(path)

    files = [
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    total = sum(files)
    assert len(files) == 8
    # pick a target where the OLD formula (pre-dedup bytes) would emit
    # >= 4 files but survivor sizing emits exactly 1: survivors are
    # 1/8 of the rows, so survivor bytes ≈ total/8
    target = total // 4
    rep = vacuum_parquet(spark, path, ["k"], target_bytes=target)
    assert rep["rows_before"] == 16000 and rep["rows_after"] == 2000
    assert rep["rewritten"] and rep["n_files_after"] == 1
    assert spark.read.parquet(path).count() == 2000


def test_vacuum_bench_verified_detects_a_failed_collapse(spark, monkeypatch):
    """ADVICE r12: the `vac` bench row's `verified` column is a PLAIN
    post-vacuum row count — if the collapse silently no-ops, verified
    disagrees with rows_after (the old distinct() recount could not
    tell).  Pinned by stubbing vacuum_parquet to lie: the fabricated
    report claims a collapse, and verified exposes it."""
    from yodel_etl_spark.io import compact as IC
    from yodel_etl_spark.queries import infra_q

    def lying_vacuum(spark_, path, keys, **kw):
        n = spark_.read.parquet(path).count()
        return {
            "rows_before": n,
            "rows_after": n // 2,  # claims it collapsed; touched nothing
            "n_dup_rows": n - n // 2,
            "n_files_before": 3,
            "n_files_after": 1,
        }

    monkeypatch.setattr(IC, "vacuum_parquet", lying_vacuum)
    row = infra_q.vacuum_bench(spark, "/root/testdata/sf0.001").first()
    assert row["verified"] == row["rows_before"]  # duplicates still there
    assert row["verified"] != row["rows_after"]  # the lie is visible


def test_vacuum_per_leaf_collapses_partitioned_replay(spark, tmp_path):
    """r13: partitioned directories vacuum with per_leaf=True — each
    leaf collapses to one row per key WITHIN the leaf through its own
    staged swap.  Replay duplicates are byte-identical rows, so they
    always recur inside one partition path: per-leaf collapse removes
    exactly them.  Cross-leaf same-key rows (different partition
    values) survive — the documented non-goal; the default still
    refuses with the per_leaf pointer."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = str(tmp_path / "events")
    batch = spark.range(0, 300).selectExpr(
        "id AS k", "id % 3 AS day", "uuid() AS payload"
    ).localCheckpoint(eager=True)
    batch.write.partitionBy("day").mode("append").parquet(path)
    batch.write.partitionBy("day").mode("append").parquet(path)  # replay
    # plus a cross-leaf key recurrence: k=0 also lands under day=7
    spark.createDataFrame([(0, 7, "x")], "k long, day long, payload string") \
        .write.partitionBy("day").mode("append").parquet(path)

    with pytest.raises(ValueError, match="per_leaf"):
        vacuum_parquet(spark, path, ["k"])

    rep = vacuum_parquet(spark, path, ["k"], per_leaf=True)
    assert rep["n_leaves"] == 4  # day=0,1,2,7
    assert rep["rows_before"] == 601 and rep["rows_after"] == 301
    assert rep["n_dup_rows"] == 300 and rep["rewritten"]
    got = spark.read.parquet(path)
    assert got.count() == 301  # per-leaf collapse actually landed
    # the cross-leaf recurrence SURVIVED (different partition value)
    assert got.where("k = 0").count() == 2
    # partition column still discoverable after the swap
    assert sorted(r["day"] for r in got.select("day").distinct().collect()) \
        == [0, 1, 2, 7]
    # idempotence: second pass is counts-only, byte-identical
    rep2 = vacuum_parquet(spark, path, ["k"], per_leaf=True)
    assert not rep2["rewritten"] and rep2["rows_before"] == 301


def test_vacuum_per_leaf_crash_recovers_leaf_independently(
    spark, tmp_path, monkeypatch
):
    """Per-leaf vacuum inherits the two-phase contract leaf-by-leaf: a
    crash at the FIRST leaf's commit point leaves every leaf's corpus
    intact (duplicates included), and the re-run finishes the
    committed leaf and completes the rest."""
    from yodel_etl_spark.io import compact as compact_mod
    from yodel_etl_spark.io.compact import vacuum_parquet

    path = str(tmp_path / "events")
    batch = spark.range(0, 200).selectExpr(
        "id AS k", "id % 2 AS day", "uuid() AS payload"
    ).localCheckpoint(eager=True)
    batch.write.partitionBy("day").mode("append").parquet(path)
    batch.write.partitionBy("day").mode("append").parquet(path)

    real_finish = compact_mod._finish_swap
    calls = {"n": 0}

    def crash_first(fs, stage, leaf):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("crash at first-leaf vacuum commit")
        return real_finish(fs, stage, leaf)

    monkeypatch.setattr(compact_mod, "_finish_swap", crash_first)
    with pytest.raises(RuntimeError, match="first-leaf"):
        vacuum_parquet(spark, path, ["k"], per_leaf=True)
    monkeypatch.undo()
    # nothing lost anywhere; the crashed leaf still shows its replays
    assert spark.read.parquet(path).select("k").distinct().count() == 200
    assert spark.read.parquet(path).count() == 400

    rep = vacuum_parquet(spark, path, ["k"], per_leaf=True)
    assert rep["recovered"]  # the committed first leaf was finished
    assert spark.read.parquet(path).count() == 200
    assert rep["rows_after"] == 200


def test_vacuum_per_leaf_concurrent_matches_serial(spark, tmp_path):
    """max_concurrency > 1 vacuums leaves from a driver thread pool —
    same results as serial (leaf independence: own stage, own files),
    the compact_parquet concurrency contract mirrored."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    def build(name):
        p = str(tmp_path / name)
        b = spark.range(0, 240).selectExpr(
            "id AS k", "id % 4 AS day", "uuid() AS payload"
        ).localCheckpoint(eager=True)
        b.write.partitionBy("day").mode("append").parquet(p)
        b.write.partitionBy("day").mode("append").parquet(p)
        return p

    serial = vacuum_parquet(spark, build("s"), ["k"], per_leaf=True)
    conc = vacuum_parquet(
        spark, build("c"), ["k"], per_leaf=True, max_concurrency=4
    )
    for key in ("rows_before", "rows_after", "n_dup_rows", "n_leaves"):
        assert serial[key] == conc[key], key
    assert conc["rows_after"] == 240
    assert spark.read.parquet(str(tmp_path / "c")).count() == 240
    # leaf order preserved in the concurrent report
    assert [r["dir"] for r in conc["leaves"]] == sorted(
        r["dir"] for r in conc["leaves"]
    )


def test_delete_where_flat_and_partitioned(spark, tmp_path):
    """r13 delete_parquet_where: the retention/compliance DELETE as a
    leaf-grain staged rewrite.  Flat dir: matching rows gone, survivors
    exact; NULL predicate rows SURVIVE (a delete removes only rows the
    predicate affirmatively selects).  Partitioned dir: only leaves
    holding matches rewrite — zero-match leaves stay byte-identical
    (no write amplification), verified by file listing."""
    import os

    from yodel_etl_spark.io.compact import delete_parquet_where

    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(i, "bad" if i % 10 == 0 else ("unknown" if i % 7 == 0 else "ok"))
         for i in range(100)],
        "k long, status string",
    ).withColumn(
        "status",
        F.when(F.col("status") == "unknown", F.lit(None)).otherwise(
            F.col("status")
        ),
    ).write.parquet(flat)
    rep = delete_parquet_where(spark, flat, "status = 'bad'")
    assert rep["n_deleted"] == 10 and rep["rows_after"] == 90
    left = spark.read.parquet(flat)
    assert left.count() == 90
    assert left.where("status = 'bad'").count() == 0
    # NULL-status rows survived (13 of them: k%7==0 minus k%70==0 overlap)
    assert left.where("status IS NULL").count() == 13
    # idempotence: re-run is a count-only no-op
    rep2 = delete_parquet_where(spark, flat, "status = 'bad'")
    assert not rep2["rewritten"] and rep2["rows_before"] == 90

    part = str(tmp_path / "part")
    spark.range(0, 400).selectExpr(
        "id AS k", "id % 4 AS day"
    ).write.partitionBy("day").parquet(part)
    before_files = {
        d: sorted(os.listdir(os.path.join(part, d)))
        for d in os.listdir(part)
        if d.startswith("day=")
    }
    # matches live ONLY in day=1 (k % 4 == 1 and k < 40)
    rep = delete_parquet_where(spark, part, "k < 40 AND k % 4 = 1")
    assert rep["n_deleted"] == 10 and rep["n_leaves_rewritten"] == 1
    after = spark.read.parquet(part)
    assert after.count() == 390
    assert after.where("k < 40 AND k % 4 = 1").count() == 0
    # untouched leaves byte-identical (same file names)
    for d, files in before_files.items():
        if d != "day=1":
            assert sorted(os.listdir(os.path.join(part, d))) == files, d


def test_delete_where_crash_cannot_lose_kept_rows(spark, tmp_path, monkeypatch):
    """Two-phase contract for the delete: a crash at the commit point
    leaves the leaf byte-identical (the delete is DELAYED, never
    half-applied); the re-run finishes the committed swap and applies
    the delete exactly."""
    from yodel_etl_spark.io import compact as compact_mod
    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, i % 5 == 0) for i in range(200)], "k long, purge boolean"
    ).write.parquet(path)

    def boom(fs, stage, leaf):
        raise RuntimeError("crash at delete commit")

    monkeypatch.setattr(compact_mod, "_finish_swap", boom)
    with pytest.raises(RuntimeError, match="delete commit"):
        delete_parquet_where(spark, path, "purge")
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == 200  # delete delayed

    rep = delete_parquet_where(spark, path, F.col("purge"))
    assert rep["recovered"]
    got = spark.read.parquet(path)
    assert got.count() == 160
    assert got.where("purge").count() == 0


def test_delete_where_removes_all_replay_copies_and_matches_filter_oracle(
    spark, tmp_path
):
    """Compliance pin: an opted-out row that was replay-duplicated by a
    gate crash has MULTIPLE byte-identical copies — the delete must
    remove every copy (they all match the predicate), with or without
    a prior vacuum.  Plus a filter-oracle parity sweep: for a set of
    predicates the post-delete table equals the pre-delete
    ``where(NOT coalesce(pred, false))`` result exactly."""
    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "c")
    batch = spark.createDataFrame(
        [(i, f"user{i % 9}", float(i)) for i in range(120)],
        "k long, owner string, score double",
    ).localCheckpoint(eager=True)
    batch.write.mode("append").parquet(path)
    batch.write.mode("append").parquet(path)  # the at-least-once replay

    rep = delete_parquet_where(spark, path, "owner = 'user3'")
    # ids with i%9==3 in range(120): 13 rows, duplicated -> 26 copies
    assert rep["n_deleted"] == 26
    left = spark.read.parquet(path)
    assert left.where("owner = 'user3'").count() == 0
    assert left.count() == 2 * 120 - 26  # non-matching replays remain

    for pred in ("score > 100", "k % 2 = 0 AND score < 50", "k < 0"):
        p2 = str(tmp_path / f"p_{abs(hash(pred))}")
        batch.write.parquet(p2)
        import pyspark.sql.functions as F2

        want = sorted(
            batch.where(
                ~F2.coalesce(F2.expr(pred), F2.lit(False))
            ).collect()
        )
        delete_parquet_where(spark, p2, pred)
        got = sorted(spark.read.parquet(p2).collect())
        assert got == want, pred


def test_delete_where_partition_column_ttl_drop(spark, tmp_path):
    """The TTL shape: the predicate references the PARTITION column
    (reconstructed via basePath per leaf).  Aged partitions drop
    whole-leaf through the manifest-only fast path (no Spark rewrite,
    no write amplification); a mixed predicate (partition col + data
    col) rewrites only the intersecting leaf, dropping the partition
    column from the rewritten files (schema preserved)."""
    import os

    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "ttl")
    spark.range(0, 400).selectExpr(
        "id AS k", "id % 4 AS day"
    ).write.partitionBy("day").parquet(path)

    rep = delete_parquet_where(spark, path, "day < 2")
    assert rep["n_deleted"] == 200 and rep["n_leaves_rewritten"] == 2
    # dropped leaves hold no parquet (manifest-only retire)
    for d in ("day=0", "day=1"):
        leaf = os.path.join(path, d)
        assert not [
            f for f in os.listdir(leaf) if f.endswith(".parquet")
        ] if os.path.isdir(leaf) else True
    got = spark.read.parquet(path)
    assert got.count() == 200
    assert sorted(r["day"] for r in got.select("day").distinct().collect()) == [2, 3]

    # mixed predicate: partition col AND data col — one leaf rewrites,
    # survivors keep the partitioned schema (day still readable)
    rep = delete_parquet_where(spark, path, "day = 2 AND k < 100")
    assert rep["n_leaves_rewritten"] == 1 and rep["n_deleted"] == 25
    got = spark.read.parquet(path)
    assert got.count() == 175
    assert got.where("day = 2").count() == 75
    assert "day" in got.columns and "k" in got.columns


def test_delete_where_partition_only_predicate_runs_no_leaf_scans(
    spark, tmp_path, monkeypatch
):
    """r14 fast path (VERDICT r13 #3): a predicate referencing only
    PARTITION columns decides leaf membership driver-side from the path
    segments (one local-relation job for all leaves) and prices the
    report from parquet FOOTER metadata — zero per-leaf Spark scan
    jobs, matched or not.  Pinned by making every DataFrameReader
    parquet read raise during the delete: the op must complete, drop
    exactly the matched leaves, and report exact footer-true counts."""
    import pyspark.sql.readwriter as rw

    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "fast")
    spark.range(0, 400).selectExpr(
        "id AS k", "id % 4 AS day"
    ).write.partitionBy("day").parquet(path)

    def no_scan(self, *a, **kw):
        raise AssertionError("partition-only delete must not scan a leaf")

    monkeypatch.setattr(rw.DataFrameReader, "parquet", no_scan)
    rep = delete_parquet_where(spark, path, "day < 2", max_concurrency=4)
    monkeypatch.undo()
    assert rep["n_deleted"] == 200 and rep["rows_after"] == 200
    assert rep["n_leaves_rewritten"] == 2
    # footer-priced rows_before is exact, per leaf and in total
    assert rep["rows_before"] == 400
    assert {r["dir"].split("day=")[1]: r["rows_before"] for r in rep["leaves"]} == {
        "0": 100, "1": 100, "2": 100, "3": 100
    }
    got = spark.read.parquet(path)
    assert got.count() == 200
    assert sorted(r["day"] for r in got.select("day").distinct().collect()) == [2, 3]
    # idempotent re-run: still scan-free, still byte-identical
    monkeypatch.setattr(rw.DataFrameReader, "parquet", no_scan)
    rep2 = delete_parquet_where(spark, path, "day < 2")
    monkeypatch.undo()
    assert not rep2["rewritten"] and rep2["rows_before"] == 200


def test_delete_where_partition_inference_is_typed_not_lexicographic(
    spark, tmp_path
):
    """The fast path mirrors Spark's partition-value TYPE inference:
    `month < 10` over month=9/10/11 must drop month=9 only (numeric
    compare) — a string-typed probe would compare '9' < '10'
    lexicographically (false) and delete nothing.  Date partitions
    get the same treatment via date inference."""
    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "months")
    spark.createDataFrame(
        [(i, m) for m in (9, 10, 11) for i in range(10)], "k long, month long"
    ).write.partitionBy("month").parquet(path)
    rep = delete_parquet_where(spark, path, "month < 10")
    assert rep["n_deleted"] == 10
    got = spark.read.parquet(path)
    assert sorted(
        r["month"] for r in got.select("month").distinct().collect()
    ) == [10, 11]

    dpath = str(tmp_path / "days")
    spark.createDataFrame(
        [(i, d) for d in ("2024-01-05", "2024-02-01") for i in range(10)],
        "k long, day string",
    ).selectExpr("k", "CAST(day AS DATE) AS day").write.partitionBy(
        "day"
    ).parquet(dpath)
    rep = delete_parquet_where(spark, dpath, "day < DATE '2024-02-01'")
    assert rep["n_deleted"] == 10
    assert spark.read.parquet(dpath).count() == 10


def test_delete_where_null_partition_survives_fast_path(spark, tmp_path):
    """__HIVE_DEFAULT_PARTITION__ (NULL partition value) under the fast
    path: the NULL-predicate row is not a match, so the leaf SURVIVES a
    non-IS-NULL predicate — the row-level NULL-survival rule holds at
    leaf grain — and an explicit IS NULL predicate drops exactly it."""
    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, tag string"
    ).write.partitionBy("tag").parquet(path)
    rep = delete_parquet_where(spark, path, "tag = 'a'")
    assert rep["n_deleted"] == 1
    left = spark.read.parquet(path)
    assert left.count() == 2
    assert left.where("tag IS NULL").count() == 1
    rep = delete_parquet_where(spark, path, "tag IS NULL")
    assert rep["n_deleted"] == 1 and spark.read.parquet(path).count() == 1


def test_delete_where_data_predicate_counts_in_one_scan_job(
    spark, tmp_path, monkeypatch
):
    """r14 batched counting: a DATA-column predicate over an N-leaf
    table pays ONE whole-snapshot scan job for every leaf's
    (rows_before, n_match) — grouped by input_file_name, folded to
    leaf grain driver-side by full scheme-stripped path (basenames are
    NOT unique across leaves: one dynamic-partition write task emits
    the same part-file name into every partition it touches) — plus
    one read per leaf that actually rewrites.  Pinned by counting
    DataFrameReader.parquet calls: 4 leaves, matches in 2 ⇒ exactly
    1 + 2 reads, with exact per-leaf reports."""
    import pyspark.sql.readwriter as rw

    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "batch")
    spark.range(0, 400).selectExpr(
        "id AS k", "id % 4 AS day"
    ).write.partitionBy("day").parquet(path)

    calls = {"n": 0}
    real = rw.DataFrameReader.parquet

    def counting(self, *a, **kw):
        calls["n"] += 1
        return real(self, *a, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", counting)
    rep = delete_parquet_where(
        spark, path, "k < 100 AND k % 4 < 2", max_concurrency=2
    )
    monkeypatch.undo()
    assert calls["n"] == 3, calls  # 1 global count + 2 leaf rewrites
    assert rep["n_deleted"] == 50 and rep["n_leaves_rewritten"] == 2
    per_leaf = {
        r["dir"].rsplit("day=", 1)[1]: (r["rows_before"], r["n_deleted"])
        for r in rep["leaves"]
    }
    assert per_leaf == {
        "0": (100, 25), "1": (100, 25), "2": (100, 0), "3": (100, 0)
    }
    got = spark.read.parquet(path)
    assert got.count() == 350
    assert got.where("k < 100 AND k % 4 < 2").count() == 0
    # zero-match leaves stayed byte-identical is pinned by the sibling
    # tests; idempotent re-run costs exactly the one count job
    monkeypatch.setattr(rw.DataFrameReader, "parquet", counting)
    calls["n"] = 0
    rep2 = delete_parquet_where(spark, path, "k < 100 AND k % 4 < 2")
    monkeypatch.undo()
    assert calls["n"] == 1 and not rep2["rewritten"]


def test_vacuum_per_leaf_counts_in_one_scan_job(spark, tmp_path, monkeypatch):
    """r14 batched counting, vacuum twin: per-leaf vacuum over an
    N-leaf corpus pays ONE (dir, key)-grouped scan job for every
    leaf's (rows_before, n_keys) — the same (leaf, key) shuffle grain
    the N per-leaf aggregates carried in total, one job submission —
    plus one read per leaf that actually rewrites; the idempotent
    re-run costs exactly the one count job."""
    import pyspark.sql.readwriter as rw

    from yodel_etl_spark.io.compact import vacuum_parquet

    path = str(tmp_path / "vbatch")
    b = (
        spark.range(600)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("part"),
            (F.col("id") * 11).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    b.write.mode("append").partitionBy("part").parquet(path)
    b.where("k % 2 = 0").write.mode("append").partitionBy("part").parquet(path)

    calls = {"n": 0}
    real = rw.DataFrameReader.parquet

    def counting(self, *a, **kw):
        calls["n"] += 1
        return real(self, *a, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", counting)
    rep = vacuum_parquet(spark, path, ["k"], per_leaf=True, max_concurrency=3)
    monkeypatch.undo()
    assert calls["n"] == 1 + 3, calls  # one batched count + 3 rewrites
    assert rep["rows_before"] == 900 and rep["rows_after"] == 600
    assert rep["n_dup_rows"] == 300 and rep["n_leaves"] == 3
    assert spark.read.parquet(path).count() == 600

    monkeypatch.setattr(rw.DataFrameReader, "parquet", counting)
    calls["n"] = 0
    rep2 = vacuum_parquet(spark, path, ["k"], per_leaf=True)
    monkeypatch.undo()
    assert calls["n"] == 1 and not rep2["rewritten"]


def test_delete_where_jvm_lax_partition_values_fall_back_exactly(spark, tmp_path):
    """r14 review fix: Python's parsers are laxer than the JVM's —
    int('1_0') == 10, int(' 7') == 7, float('nan') parses — so a
    string-typed partition (by Spark's inference) could be typed
    numeric by a naive probe and `day < 15` would SILENTLY
    manifest-drop the WHOLE day=1_0 leaf (Python int('1_0') == 10 <
    15) while Spark's exact semantics under ANSI mode raise
    CAST_INVALID_INPUT on that value.  The strict inference must
    refuse such columns (fast path disabled) so the delete lands on
    the scan path: the ambiguous numeric predicate fails LOUDLY with
    zero rows touched — never a silent divergent drop — and a
    string-compare predicate works exactly."""
    import pytest as _pytest

    from yodel_etl_spark.io.compact import (
        _infer_partition_converter,
        delete_parquet_where,
    )

    assert _infer_partition_converter(["1_0", "5"]) == (None, None)

    path = str(tmp_path / "lax")
    spark.createDataFrame(
        [(i, d) for d in ("1_0", "5") for i in range(10)],
        "k long, day string",
    ).write.partitionBy("day").parquet(path)
    # Spark's own inference keeps day STRING ('1_0' fails parseLong)
    assert dict(spark.read.parquet(path).dtypes)["day"] == "string"
    with _pytest.raises(Exception, match="CAST_INVALID_INPUT|cannot be cast"):
        delete_parquet_where(spark, path, "day < 15")
    assert spark.read.parquet(path).count() == 20  # nothing touched
    # the well-typed spelling of the same intent works on the scan path
    rep = delete_parquet_where(spark, path, "day = '5'")
    assert rep["n_deleted"] == 10 and rep["rows_after"] == 10
    left = spark.read.parquet(path)
    assert left.count() == 10
    assert {r["day"] for r in left.select("day").distinct().collect()} == {"1_0"}


def test_fs_for_accepts_both_uri_spellings(spark, tmp_path):
    """r14 review fix: Hadoop Path.toString renders the authority-less
    `file:/x` form, which the reports' `dir` fields carry — feeding a
    report path back into an op must route to the Hadoop arm, not
    silently no-op through os.walk on the local arm."""
    import yodel_etl_spark.io.compact as C

    assert isinstance(C._fs_for(spark, f"file://{tmp_path}"), C._HadoopFS)
    assert isinstance(C._fs_for(spark, f"file:{tmp_path}"), C._HadoopFS)
    assert isinstance(C._fs_for(spark, str(tmp_path)), C._LocalFS)


def test_batched_counts_degrade_to_per_leaf_on_unreadable_union(
    spark, tmp_path
):
    """r14 review fix: the one-read batched count can fail where
    per-leaf reads succeed (cross-leaf physical type drift without
    mergeSchema) — the batched helpers must degrade to the exact
    per-leaf fallback instead of aborting the maintenance pass."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "drift")
    spark.createDataFrame(
        [(i,) for i in range(10)],
        StructType([StructField("v", IntegerType())]),
    ).selectExpr("v", "CAST(0 AS LONG) AS part").write.partitionBy(
        "part"
    ).parquet(path)
    spark.createDataFrame(
        [(int(i),) for i in range(10, 20)],
        StructType([StructField("v", LongType())]),
    ).selectExpr("v", "CAST(1 AS LONG) AS part").write.mode(
        "append"
    ).partitionBy("part").parquet(path)
    # predicate references the DATA column so the batched path engages;
    # whether the union read throws or not, the op must return exact
    # results (the fallback per-leaf reads are schema-uniform — even
    # mergeSchema=true cannot reconcile INT with BIGINT, so this drift
    # is exactly the shape the one-read job cannot handle)
    rep = delete_parquet_where(spark, path, "v >= 15")
    assert rep["n_deleted"] == 5 and rep["rows_after"] == 15
    import os as _os

    for part, want_rows in (("part=0", 10), ("part=1", 5)):
        leaf_df = spark.read.parquet(_os.path.join(path, part))
        assert leaf_df.count() == want_rows, part
        assert leaf_df.where("v >= 15").count() == 0, part
