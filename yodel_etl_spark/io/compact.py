"""Small-files compaction — the table-maintenance job every streaming
or incremental-ingest pipeline schedules: micro-batches (foreachBatch
appends, per-trigger sinks, CDC merges) leave partitions holding
hundreds of KB-sized parquet files, and scan cost then goes to task
scheduling and footer reads instead of data.  Compaction rewrites each
fragmented leaf directory into ~target-sized files and leaves healthy
directories untouched.

Scale shape: the unit of work is ONE LEAF DIRECTORY — each rewrite
reads only that directory's files and ``coalesce``s them (coalesce, not
repartition: merging small files needs no shuffle and no row movement
across the partition-key boundary, which directory grain already
guarantees).  Healthy directories are skipped by a listing-only check,
so a mostly-healthy 100 TB table costs a file listing plus the
fragmented tail.  The swap is staged: new files land in a staging tree
OUTSIDE the table root (a dir named ``x=y`` inside the root would be
parsed as a phantom partition column by discovery — ``_`` prefixes
shield files, not directories).  The swap itself is a two-phase
commit keyed on a manifest file: the rewrite completes in the stage,
an atomically-renamed ``_SWAP_MANIFEST`` (listing the originals to
retire) marks the commit point, and only then do staged files move
INTO the leaf, followed by deletion of the listed originals.  A crash
BEFORE the manifest leaves the original leaf byte-identical (the
stale stage is discarded on re-run); a crash AFTER the manifest is
FINISHED by the next run — remaining staged files install, listed
originals retire — so no crash point loses rows.  The only crash
window with a visible artifact is post-commit mid-swap, where a
reader can briefly see duplicate rows (originals + installed copies)
until the re-run completes the swap; loss is impossible because an
original is never removed while any staged file is still pending.

Filesystem access is routed through a two-arm shim selected by the
path itself: plain paths use the local OS API directly (the measured
fast path — a py4j round-trip costs ~100× a syscall, and a maintenance
pass over thousands of healthy leaves is FS-op dominated between Spark
jobs), while URI-scheme paths (``hdfs://``, ``s3a://``, ``file://``)
run the IDENTICAL walk through the Hadoop FileSystem client — the
py4j pattern the component-map claim markers (scale/cluster.py) and
the IVF params publish (scale/similarity.py) already use.  The
decision logic (fragmentation test, output-file count, staged swap,
manifest commit point) is byte-for-byte the same in both arms and is
what the tests pin; ``file://`` is the test scheme for the Hadoop arm
(tests/test_compact_hadoopfs.py re-runs the crash-window assertions
with the FS API underneath).

Object-store rename semantics (the honest caveat, mirroring the
claim-marker note in scale/cluster.py): on HDFS ``rename`` is atomic;
on S3A it is COPY-THEN-DELETE, where the copy half lands atomically (a
single PUT) but a crash BETWEEN the two leaves the object at BOTH
paths.  Every commit point here tolerates that dual-file state.  The
manifest rename (``write_text_atomic``): a dual manifest just means
the swap is committed (the stage copy is cleared with the stage).  The
install moves (``_install_staged``): recovery recognizes its own
staged basename already present at the destination at the same length
and discards the staged source instead of double-installing — a second
install under a fresh name would duplicate the leaf's rows forever.
The retire step is plain deletes (idempotent).  What S3A does NOT give
this module is mutual exclusion between two CONCURRENT maintenance
passes on the same table root — ``fs.create(overwrite=false)`` there
is check-then-create, the same boundary the component-map claim
markers document; run one maintenance pass per table at a time (the
ops themselves are single-writer by convention, not by lock).
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil

from pyspark.sql import SparkSession

#: files smaller than this fraction of target are "fragments"
_FRAG_FRACTION = 0.5

#: commit marker inside a stage dir: present ⇒ the rewrite succeeded and
#: the swap MUST be finished (its lines are the original basenames to
#: retire); absent ⇒ the rewrite never completed and the stage is junk
_MANIFEST = "_SWAP_MANIFEST"

# fault-injection seams (tests monkeypatch these to simulate crashes at
# exact points inside the swap); same-filesystem move is an atomic
# rename.  This pair is the LOCAL arm's; the Hadoop arm routes through
# the `_hadoop_move`/`_hadoop_remove` twins below, so the crash-window
# tests can inject identical faults into either plumbing.
_move = shutil.move
_remove = os.remove


def _arrow_field_paths(schema) -> set[str]:
    """Dotted field paths of an Arrow schema, descending STRUCTS only:
    list/map elements are not addressable by Spark's dotted attribute
    syntax (``m.key`` on a map resolves to GetMapValue, whose key may
    legitimately be absent from any footer), so the walk stops at them
    and a dotted reference crossing one routes callers to their exact
    fallback rather than a false "missing" verdict."""
    import pyarrow as pa

    out: set[str] = set()

    def walk(prefix: str, field) -> None:
        name = prefix + field.name
        out.add(name)
        if pa.types.is_struct(field.type):
            for i in range(field.type.num_fields):
                walk(name + ".", field.type.field(i))

    for field in schema:
        walk("", field)
    return out


class _LocalFS:
    """Plain-path arm: direct OS calls (see the module docstring for
    why this stays the default — per-op cost, thousands of leaves)."""

    def normalize(self, p: str) -> str:
        return p

    def local_path(self, p: str) -> str | None:
        """Local-readable form of ``p``, or None when the bytes are
        not reachable through the OS API — a diagnostic utility for
        callers/tests that need to cross from FS-arm paths to OS
        paths; the maintenance ops themselves stay arm-pure (footer
        reads go through each arm's own ``footer_num_rows``)."""
        return p

    def footer_num_rows(self, files: list[tuple[str, int]]) -> int:
        """Total row count from parquet FOOTER metadata only (no data
        pages read, no Spark job) — what prices the delete fast path's
        report fields."""
        import pyarrow.parquet as pq

        return sum(int(pq.ParquetFile(p).metadata.num_rows) for p, _ in files)

    def leaf_dirs(self, root: str) -> list[str]:
        out = []
        for dirpath, _dirnames, filenames in os.walk(root):
            if any(f.endswith(".parquet") for f in filenames):
                out.append(dirpath)
        return sorted(out)

    def parquet_files(self, d: str) -> list[tuple[str, int]]:
        return sorted(
            (os.path.join(d, f), os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    def listdir(self, d: str) -> list[str]:
        return os.listdir(d)

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def size(self, p: str) -> int:
        return os.path.getsize(p)

    def move(self, src: str, dst: str) -> None:
        _move(src, dst)

    def remove(self, p: str) -> None:
        _remove(p)

    def rmtree(self, d: str) -> None:
        shutil.rmtree(d, ignore_errors=True)

    def rmdir_if_empty(self, d: str) -> None:
        try:
            os.rmdir(d)
        except OSError:
            pass

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def write_text_atomic(self, p: str, text: str) -> None:
        with open(p + ".tmp", "w") as fh:
            fh.write(text)
        os.replace(p + ".tmp", p)

    def basenames_exist_under(self, root: str, basenames: set[str]) -> bool:
        for _, _, files in os.walk(root):
            if basenames.intersection(files):
                return True
        return False

    def footer_column_names(self, p: str, size: int) -> set[str]:
        """Top-level column names from ONE file's parquet footer (no
        data pages read) — what the batched counters use to verify a
        leaf actually carries the predicate/key columns before trusting
        a single-schema union read over it."""
        import pyarrow.parquet as pq

        return set(pq.ParquetFile(p).schema_arrow.names)

    def footer_field_paths(self, p: str, size: int) -> set[str]:
        """Dotted field paths (structs descended) from ONE file's
        parquet footer — the nested twin of
        :meth:`footer_column_names`, for predicates that reference
        struct fields (``s.x``)."""
        import pyarrow.parquet as pq

        return _arrow_field_paths(pq.ParquetFile(p).schema_arrow)


class _HadoopFS:
    """URI-scheme arm: the same operations through the Hadoop
    FileSystem client via py4j, so compact/vacuum/delete run against
    ``hdfs://``/``s3a://`` table roots on a real cluster.  Missing-path
    errors are mapped to FileNotFoundError so the concurrency-tolerant
    probes (legacy-stage reap) behave identically to the local arm."""

    def __init__(self, spark: SparkSession, path: str):
        jvm = spark._jvm
        self._P = jvm.org.apache.hadoop.fs.Path
        self._fs = self._P(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        self._file_scheme = self._fs.getUri().getScheme() == "file"

    def _map_missing(self, exc: Exception, p: str):
        if "FileNotFoundException" in str(exc):
            raise FileNotFoundError(p) from None
        raise exc

    def normalize(self, p: str) -> str:
        # one canonical textual form (Hadoop renders file:/x, not
        # file:///x) so os.path relpath/dirname arithmetic against
        # listing results stays exact
        return self._P(p).toString()

    def local_path(self, p: str) -> str | None:
        if self._file_scheme:
            from urllib.parse import urlparse

            return urlparse(p).path or p
        return None

    def footer_num_rows(self, files: list[tuple[str, int]]) -> int:
        """Total row count from parquet FOOTER metadata through the
        Hadoop stream: seek to the tail, one ``readNBytes`` RPC per
        file (py4j converts a RETURNED byte[] to Python bytes in one
        hop — never iterate a Java array element-wise), and parse the
        footer thrift with pyarrow from the in-memory tail.  ~2 ranged
        reads per file worst-case (a footer larger than the 64 KiB
        first guess re-reads at exact length) — the same access shape
        a remote parquet reader uses, so the delete fast path prices
        its reports without Spark jobs on ``hdfs://``/``s3a://`` too.
        Runs the stream path for ``file://`` as well, so the test arm
        exercises exactly the remote code."""
        import pyarrow.parquet as pq

        return sum(
            int(self._footer_metadata(p, size).num_rows) for p, size in files
        )

    def _footer_metadata(self, p: str, size: int):
        """Parquet footer metadata parsed from ranged tail reads over
        the Hadoop stream (shared by row counting and schema probing)."""
        import struct

        import pyarrow as pa
        import pyarrow.parquet as pq

        stream = self._fs.open(self._P(p))
        try:
            n = min(64 * 1024, size)
            stream.seek(size - n)
            tail = bytes(stream.readNBytes(n))
            footer_len = struct.unpack("<I", tail[-8:-4])[0]
            if footer_len + 8 > n:
                stream.seek(size - footer_len - 8)
                tail = bytes(stream.readNBytes(footer_len + 8))
            else:
                tail = tail[-(footer_len + 8):]
        finally:
            stream.close()
        return pq.read_metadata(pa.BufferReader(tail))

    def footer_column_names(self, p: str, size: int) -> set[str]:
        """Hadoop-arm twin of the local footer schema probe (same
        ranged tail reads as :meth:`footer_num_rows`)."""
        return set(
            self._footer_metadata(p, size).schema.to_arrow_schema().names
        )

    def footer_field_paths(self, p: str, size: int) -> set[str]:
        """Hadoop-arm twin of the local nested footer schema probe."""
        return _arrow_field_paths(
            self._footer_metadata(p, size).schema.to_arrow_schema()
        )

    def leaf_dirs(self, root: str) -> list[str]:
        if not self._fs.exists(self._P(root)):
            return []
        it = self._fs.listFiles(self._P(root), True)
        dirs: set[str] = set()
        while it.hasNext():
            fp = it.next().getPath()
            if fp.getName().endswith(".parquet"):
                dirs.add(fp.getParent().toString())
        return sorted(dirs)

    def parquet_files(self, d: str) -> list[tuple[str, int]]:
        try:
            sts = self._fs.listStatus(self._P(d))
        except Exception as exc:
            self._map_missing(exc, d)
        return sorted(
            (st.getPath().toString(), int(st.getLen()))
            for st in sts
            if st.getPath().getName().endswith(".parquet")
        )

    def listdir(self, d: str) -> list[str]:
        try:
            return [
                st.getPath().getName() for st in self._fs.listStatus(self._P(d))
            ]
        except Exception as exc:
            self._map_missing(exc, d)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._P(p)))

    def isdir(self, p: str) -> bool:
        return bool(self._fs.isDirectory(self._P(p)))

    def size(self, p: str) -> int:
        return int(self._fs.getFileStatus(self._P(p)).getLen())

    def move(self, src: str, dst: str) -> None:
        _hadoop_move(self._fs, self._P, src, dst)

    def remove(self, p: str) -> None:
        _hadoop_remove(self._fs, self._P, p)

    def rmtree(self, d: str) -> None:
        try:
            self._fs.delete(self._P(d), True)
        except Exception:
            pass  # ignore_errors semantics of the local arm

    def rmdir_if_empty(self, d: str) -> None:
        try:
            if len(self._fs.listStatus(self._P(d))) == 0:
                self._fs.delete(self._P(d), False)
        except Exception:
            pass

    def makedirs(self, p: str) -> None:
        self._fs.mkdirs(self._P(p))

    def read_text(self, p: str) -> str:
        try:
            stream = self._fs.open(self._P(p))
        except Exception as exc:
            self._map_missing(exc, p)
        try:
            return bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()

    def write_text_atomic(self, p: str, text: str) -> None:
        tmp, dst = self._P(p + ".tmp"), self._P(p)
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        # the manifest lives inside THIS op's private stage dir (single
        # writer by construction), so delete-then-rename is race-free
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        if not self._fs.rename(tmp, dst):
            raise OSError(f"atomic manifest rename failed: {p}")

    def basenames_exist_under(self, root: str, basenames: set[str]) -> bool:
        try:
            it = self._fs.listFiles(self._P(root), True)
            while it.hasNext():
                if it.next().getPath().getName() in basenames:
                    return True
        except Exception:
            pass
        return False


def _hadoop_move(fs, P, src: str, dst: str) -> None:
    """Hadoop-arm move/remove live behind their own module seams (the
    `_move`/`_remove` twins) so the crash-window tests can inject
    faults into the FS-API arm exactly as they do into the local one."""
    if not fs.rename(P(src), P(dst)):
        raise OSError(f"rename failed: {src} -> {dst}")


def _hadoop_remove(fs, P, p: str) -> None:
    if not fs.delete(P(p), False):
        raise OSError(f"delete failed: {p}")


def _fs_for(spark: SparkSession, path: str):
    """Select the FS arm from the path itself: URI scheme ⇒ Hadoop
    client, plain path ⇒ local OS API (the fast default).  The scheme
    test accepts BOTH spellings — ``file:///x`` and the authority-less
    ``file:/x`` that Hadoop Path.toString (and therefore this module's
    own report ``dir`` fields) renders — so a path read out of one
    op's report routes back to the same arm instead of silently
    no-opping through os.walk."""
    import re

    return (
        _HadoopFS(spark, path)
        if re.match(r"[A-Za-z][A-Za-z0-9+.-]+:/", path)
        else _LocalFS()
    )


def _fanout(fn, items, max_concurrency: int = 1) -> list:
    """Run ``fn`` over ``items`` from a driver-side thread pool of
    ``max_concurrency`` workers (serial when <= 1 or a single item),
    returning results in item order.  The maintenance family's per-leaf
    work is py4j/RPC-latency bound, not CPU bound, so one shared pool
    primitive serves every pass — compact/vacuum/delete leaf loops, the
    relayout finish phase, and the footer schema probes — and a pool-
    policy fix lands everywhere at once instead of in four copies."""
    items = list(items)
    if max_concurrency <= 1 or len(items) <= 1:
        return [fn(it) for it in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        return [f.result() for f in [pool.submit(fn, it) for it in items]]


def _leaf_footer_names(
    fs, files: list[tuple[str, int]], max_concurrency: int = 1
) -> list[set[str] | None]:
    """Top-level footer column-name set per file (None where the
    footer fails to parse) — what lets a rewrite decide DRIVER-side
    whether it needs a ``mergeSchema`` read: merged reads launch a
    distributed footer-merge job per read, which is pure overhead on
    the uniform-schema corpus every healthy table is, while a
    name-set drift means a sampled single-schema read would silently
    DROP the drifted column from the rewrite.  Metadata-grain, fanned
    out."""

    def one(f: tuple[str, int]) -> set[str] | None:
        try:
            return fs.footer_column_names(*f)
        except Exception:
            return None

    return _fanout(one, files, max_concurrency)


def _names_drift(names: list[set[str] | None]) -> bool:
    """True when the footers disagree on column names (or any footer
    is unreadable — the merged read lets Spark surface the real
    error instead of guessing)."""
    seen = {frozenset(n) if n is not None else None for n in names}
    return None in seen or len(seen) > 1


def _name_fold(spark: SparkSession):
    """THE column-name folding rule (honors ``spark.sql.caseSensitive``)
    — single source shared by the vacuum count precheck and the footer
    guard so the two can never disagree about what 'lacks a key column'
    means."""
    case_sensitive = (
        spark.conf.get("spark.sql.caseSensitive", "false").lower() == "true"
    )
    if case_sensitive:
        return lambda ns: set(ns)
    return lambda ns: {n.lower() for n in ns}


def _require_key_footers(
    spark: SparkSession, fs, files: list[tuple[str, int]], key_cols
) -> list[set[str] | None]:
    """Vacuum's key-drift refusal: EVERY file handed in must carry
    every key column in its own footer — a file whose footer lacks one
    would NULL-key its rows under a merged read and dropDuplicates
    would collapse them into one survivor (silent row loss; a
    destructive rewrite has no exact fallback, so refuse).  Raises
    ``ValueError`` naming the first offending file; returns the
    per-file footer name sets so the rewrite can reuse them for drift
    detection.  Metadata-grain — callers keep it off the healthy
    no-op path."""
    _fold = _name_fold(spark)
    names = _leaf_footer_names(fs, files)
    want_keys = _fold(key_cols)
    for (p, _sz), have in zip(files, names):
        if have is None:
            raise ValueError(
                f"vacuum_parquet cannot prove {p!r} carries the key "
                f"column(s): unreadable footer"
            )
        lack = want_keys - _fold(have)
        if lack:
            raise ValueError(
                f"vacuum_parquet would destroy rows: {p!r} lacks key "
                f"column(s) {sorted(lack)} — its rows would NULL-key "
                f"and collapse into one survivor (schema_report(spark, "
                f"path, per_file=True) inventories the drift)."
            )
    return names


def _install_staged(fs, stage: str, leaf: str) -> None:
    """Move every staged parquet file into the leaf.  Staged basenames
    carry a fresh Spark job UUID so they never collide with originals.
    A destination that ALREADY holds this exact staged basename at the
    same length is the dual-file artifact of a NON-ATOMIC rename (S3A
    renames are copy-then-delete; a crash between the two leaves the
    object at BOTH paths, and the copy half is a single atomic PUT) —
    the copy at the destination IS the staged file, so recovery
    completes by discarding the staged source: installing it again
    under a fresh name would duplicate the leaf's rows FOREVER (both
    copies survive the retire).  On any length mismatch the name is
    owned by something else entirely and the loss-proof c_-prefixed
    install keeps both (an original is NEVER overwritten — it is only
    ever removed by :func:`_finish_swap` after every install
    completed)."""
    for f in sorted(fs.listdir(stage)):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(stage, f)
        dst = os.path.join(leaf, f)
        if fs.exists(dst):
            if fs.size(dst) == fs.size(src):
                fs.remove(src)  # the rename's copy half already landed
                continue
            while fs.exists(dst):
                dst = os.path.join(leaf, "c_" + os.path.basename(dst))
        fs.move(src, dst)


def _finish_swap(fs, stage: str, leaf: str) -> None:
    """Complete a COMMITTED swap (manifest present): install whatever
    staged files remain, retire the originals the manifest lists, drop
    the stage.  Idempotent — safe to re-run from any crash point after
    the commit marker: already-installed files are no longer in the
    stage, already-retired originals fail the exists check."""
    originals = [
        line
        for line in fs.read_text(os.path.join(stage, _MANIFEST)).splitlines()
        if line
    ]
    _install_staged(fs, stage, leaf)
    for f in originals:
        p = os.path.join(leaf, f)
        if fs.exists(p):
            fs.remove(p)
    fs.rmtree(stage)
    # the (shared) stage ROOT is dropped ONCE at the end of the pass by
    # the public op, never here: a per-leaf rmdir races a concurrent
    # sibling's makedirs under max_concurrency > 1 — the sibling's
    # parent dir vanishes between its creation and its child mkdir


def compact_stage_root(path: str) -> str:
    """The sibling directory compaction stages its swaps under — the
    SINGLE definition of the naming scheme, exposed so callers (bench
    fixtures, external cleanup jobs) can wipe/register it without
    duplicating the convention."""
    return os.path.join(
        os.path.dirname(path.rstrip("/")) or ".",
        "_compact_stage_" + os.path.basename(path.rstrip("/")),
    )


def vacuum_stage_root(path: str) -> str:
    """Vacuum's staging sibling (see :func:`compact_stage_root`)."""
    return os.path.join(
        os.path.dirname(path.rstrip("/")) or ".",
        "_vacuum_stage_" + os.path.basename(path.rstrip("/")),
    )


def _compact_leaf(
    spark: SparkSession,
    fs,
    path: str,
    leaf: str,
    target_bytes: int,
    min_files: int,
) -> dict:
    """Recover/inspect/rewrite ONE leaf directory — the unit of work,
    fully independent of every other leaf (own stage dir, own files),
    which is what makes leaf-level concurrency safe."""
    # staging lives OUTSIDE the table root (a sibling tree keyed by
    # the leaf's relative path): a dir named `x=y` inside the root
    # would be parsed as a phantom partition column by discovery —
    # underscore prefixes shield files, not directories — and any
    # extra dir breaks same-level partition inference
    rel = os.path.relpath(leaf, path)
    if rel == ".":
        rel = legacy_rel = "_root"
    else:
        # the flattened name alone is NOT injective (a literal dir
        # `a=1__b=2` collides with nested `a=1/b=2`); under
        # max_concurrency > 1 two colliding leaves would share a stage
        # and the later rewrite could delete the earlier's committed
        # staged files — suffix a digest of the raw path to disambiguate
        legacy_rel = rel.replace(os.sep, "__")
        digest = hashlib.md5(rel.encode("utf-8")).hexdigest()[:8]
        rel = legacy_rel + "-" + digest
    stage_root = compact_stage_root(path)
    stage = os.path.join(stage_root, rel)
    legacy_stage = os.path.join(stage_root, legacy_rel)
    recovered = False
    # recovery probes the pre-digest stage name too: a committed swap
    # staged by an older version must still FINISH after an upgrade —
    # orphaning it would leave the leaf with duplicate rows forever.
    # The legacy name is NOT leaf-unique (`a=1__b=2` vs `a=1/b=2`), so
    # a legacy stage is finished only when its manifest provably names
    # THIS leaf's files (part-file basenames are UUID-unique) —
    # finishing into the wrong leaf would install foreign rows under
    # the wrong partition path.  A committed legacy stage that holds no
    # staged parquet (install complete) and whose manifest basenames
    # exist NOWHERE under the table root (retire complete — basenames
    # are UUID-unique) is provably finished end-to-end: reap it, so it
    # stops being re-probed by every colliding leaf forever.  If either
    # check fails the stage stays inert (rows are complete everywhere:
    # install precedes retire), which beats either wrong outcome.
    probes = (
        ((stage, False),)
        if legacy_stage == stage
        else ((legacy_stage, True), (stage, False))
    )
    for st, need_ownership in probes:
        if not fs.isdir(st):
            continue
        mf = os.path.join(st, _MANIFEST)
        if fs.exists(mf):
            if need_ownership:
                # a FINISHED legacy stage may be reaped by a colliding
                # leaf's concurrent probe (max_concurrency > 1) between
                # any two reads here — a vanished manifest/stage just
                # means the other thread proved it done; never crash
                # the pass over it.  basenames_exist_under is the
                # cross-leaf retire-completeness probe: part-file
                # basenames carry Spark job UUIDs, so a hit can only be
                # the file the manifest meant; walk cost is paid only on
                # the rare colliding-legacy-stage probe, never per leaf.
                try:
                    listed = {
                        ln for ln in fs.read_text(mf).splitlines() if ln
                    }
                    stage_files = fs.listdir(st)
                except FileNotFoundError:
                    continue
                if not (listed & set(fs.listdir(leaf))):
                    if not any(
                        f.endswith(".parquet") for f in stage_files
                    ) and not fs.basenames_exist_under(path, listed):
                        fs.rmtree(st)  # root cleanup is end-of-pass
                    continue
            # committed swap interrupted mid-flight: FINISH it (the
            # stage may hold the only complete copy of some rows —
            # discarding it here is exactly the data-loss bug)
            _finish_swap(fs, st, leaf)
            recovered = True
        else:
            # uncommitted rewrite leftovers: originals are intact
            # and complete, the stage is junk (for a shared legacy
            # name, junk for every candidate owner alike; concurrent
            # double-rmtree is tolerated by ignore_errors)
            fs.rmtree(st)
    files = fs.parquet_files(leaf)
    total = sum(sz for _, sz in files)
    frag = (
        len(files) >= min_files
        and total / len(files) < target_bytes * _FRAG_FRACTION
    )
    report = {
        "dir": leaf,
        "n_files_before": len(files),
        "bytes": total,
        "rewritten": bool(frag),
        "recovered": recovered,
    }
    if not frag:
        report["n_files_after"] = len(files)
        return report
    n_out = max(1, math.ceil(total / target_bytes))
    # merge schemas only when the footers actually drift: a column
    # present in only SOME of the leaf's files must survive the
    # rewrite NULL-filled (a single-schema read sampled from the wrong
    # file would silently drop it — schema_report(per_file=True) names
    # this), but the merged read costs a footer-merge job the uniform
    # corpus never needs
    reader = spark.read
    if _names_drift(_leaf_footer_names(fs, files)):
        reader = reader.option("mergeSchema", "true")
    (
        reader.parquet(*[p for p, _ in files])
        .coalesce(n_out)
        .write.mode("overwrite")
        .parquet(stage)
    )
    # commit point: the manifest is written ATOMICALLY (tmp +
    # rename) after the rewrite succeeded; from here the swap must
    # complete — any crash is finished by the recovery branch above
    fs.write_text_atomic(
        os.path.join(stage, _MANIFEST),
        "\n".join(os.path.basename(p) for p, _ in files),
    )
    # swap order is install-then-retire: staged files enter the leaf
    # FIRST, originals are removed only after every install landed —
    # no crash point leaves the leaf missing rows
    _finish_swap(fs, stage, leaf)
    report["n_files_after"] = len(fs.parquet_files(leaf))
    return report


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    max_concurrency: int = 1,
) -> list[dict]:
    """Compact fragmented leaf directories under ``path``; returns one
    report dict per leaf (``dir, n_files_before, n_files_after, bytes,
    rewritten``), in leaf order.  A leaf rewrites when it holds ≥
    ``min_files`` parquet files whose MEAN size is under half of
    ``target_bytes`` — the steady-state signature of micro-batch
    appends; directories already at healthy file sizes are left
    byte-identical (idempotence: a second run is a listing-only no-op).

    ``max_concurrency`` > 1 rewrites that many leaves at once from a
    driver-side thread pool — safe because the leaf is a fully
    independent unit (own stage dir, own file set; the Spark scheduler
    accepts concurrent job submission), and the difference between a
    serial and a concurrent nightly pass over thousands of fragmented
    partitions is the whole maintenance window at 100 TB.  Each leaf's
    two-phase crash contract is unchanged: concurrency never interleaves
    WITHIN a leaf, and a crash mid-pass leaves every touched leaf in a
    state the next run recovers independently.

    Row contents are preserved exactly (the tests pin count and value
    equality); file-internal row order is not part of the contract —
    re-run ``write_clustered``/``write_zordered`` when ordering is the
    point, compaction when file COUNT is."""
    fs = _fs_for(spark, path)
    path = fs.normalize(path)
    leaves = fs.leaf_dirs(path)
    reports = _fanout(
        lambda leaf: _compact_leaf(spark, fs, path, leaf, target_bytes, min_files),
        leaves,
        max_concurrency,
    )  # leaf order preserved
    # single end-of-pass cleanup of the shared stage root (see
    # _finish_swap for why this cannot run per leaf)
    fs.rmdir_if_empty(compact_stage_root(path))
    return reports


def _recover_stage(fs, stage: str, leaf: str) -> bool:
    """Finish or discard ONE stage dir left by a crashed pass: a
    committed stage (manifest present) is finished into ``leaf``; an
    uncommitted one is junk (originals intact) and is dropped.
    Returns True when a committed swap was finished."""
    if not fs.isdir(stage):
        return False
    if fs.exists(os.path.join(stage, _MANIFEST)):
        _finish_swap(fs, stage, leaf)
        return True
    fs.rmtree(stage)
    return False


def _vacuum_stage_for_leaf(path: str, leaf: str) -> str:
    """Stage dir for ONE leaf under :func:`vacuum_stage_root` — the
    flat root keeps its shipped ``_root`` name (crashed stages from
    earlier versions must still recover); nested leaves get the
    digest-suffixed flattened name compaction uses (the flattened name
    alone is not injective: a literal dir ``a=1__b=2`` collides with
    nested ``a=1/b=2``).  No legacy probe is needed — per-leaf vacuum
    never shipped under another naming."""
    rel = os.path.relpath(leaf, path)
    if rel == ".":
        rel = "_root"
    else:
        rel = (
            rel.replace(os.sep, "__")
            + "-"
            + hashlib.md5(rel.encode("utf-8")).hexdigest()[:8]
        )
    return os.path.join(vacuum_stage_root(path), rel)


def vacuum_parquet(
    spark: SparkSession,
    path: str,
    key_cols: list[str] | tuple[str, ...],
    target_bytes: int = 128 * 1024 * 1024,
    per_leaf: bool = False,
    max_concurrency: int = 1,
) -> dict:
    """Collapse duplicate-key rows in a parquet directory — the
    maintenance sibling of :func:`compact_parquet` and the documented
    closing move of the ingest-gate family's at-least-once contract:
    a crash between a gate's corpus append and its index extend
    replays into a duplicate corpus append (never loss), and every
    gate docstring defers the cleanup "until vacuum".  This is that
    vacuum: one row per ``key_cols``, rewritten to ~``target_bytes``
    files.

    Same two-phase commit as compaction (stage OUTSIDE the root,
    atomically-renamed ``_SWAP_MANIFEST`` as the commit point,
    install-then-retire): a crash before the manifest leaves the
    corpus byte-identical; a crash after it is finished by the next
    run; the only visible mid-swap artifact is MORE duplicates
    (originals + installed copies) — which downstream already
    tolerates, since probe decisions are ``distinct``-ed.  No crash
    point loses a key.

    Duplicate rows born of replay are byte-identical, so which copy
    survives is immaterial; for corpora where same-key rows can
    DIFFER, note that the keeper is whichever copy
    ``dropDuplicates`` retains (Spark's contract: unspecified) — run
    a CDC fold (:func:`~yodel_etl_spark.ops.cdc.apply_changes`) when
    latest-wins semantics are the point.  A concurrent gate append
    during the vacuum survives (only the files listed at scan time
    retire); its replay-duplicates, if any, wait for the next pass.

    No-duplicates fast path: one aggregate decides, and a corpus that
    is both duplicate-free and healthily sized is left byte-identical
    (idempotence — a second vacuum is a listing plus one count).

    PARTITIONED directories need ``per_leaf=True`` (default: refuse):
    each leaf collapses independently to one row per ``key_cols``
    WITHIN that leaf, with its own stage and two-phase swap — exactly
    right for replay duplicates, which are byte-identical rows and so
    always land in the SAME partition path, and the unit-of-work shape
    that scales (a mostly-clean 100 TB table costs a listing plus one
    count per leaf; no cross-leaf shuffle).  What per-leaf vacuum does
    NOT do is global dedup: rows sharing ``key_cols`` across DIFFERENT
    partition values survive — if keys can recur across partitions,
    that is a re-layout (one shuffle on the keys), not a maintenance
    pass, and the default refusal keeps the distinction loud.  The
    per-leaf report aggregates the totals and carries the individual
    reports under ``"leaves"``.  ``max_concurrency`` > 1 vacuums that
    many leaves at once from a driver-side thread pool — the same
    leaf-independence argument as :func:`compact_parquet` (own stage,
    own files, per-leaf two-phase contract unchanged), and the same
    maintenance-window lever over thousands of partitions."""
    fs = _fs_for(spark, path)
    path = fs.normalize(path)
    leaves = fs.leaf_dirs(path)
    recovered_empty = False
    if not leaves:
        # nothing landed yet (a stream that has not triggered) — or a
        # crashed vacuum whose committed stage holds every file: finish
        # it, then re-list
        stage0 = os.path.join(vacuum_stage_root(path), "_root")
        fs.makedirs(path)
        recovered_empty = _recover_stage(fs, stage0, path.rstrip("/"))
        if recovered_empty:
            leaves = fs.leaf_dirs(path)
        if not leaves:
            return {
                "dir": path,
                "rows_before": 0,
                "rows_after": 0,
                "n_dup_rows": 0,
                "n_files_before": 0,
                "n_files_after": 0,
                "recovered": recovered_empty,
                "rewritten": False,
            }
    flat = leaves == [path.rstrip("/")] or leaves == [path]
    if not flat and not per_leaf:
        raise ValueError(
            f"vacuum_parquet expects a FLAT parquet directory; {path!r} "
            f"has leaves {leaves!r} — gate corpora are flat.  Pass "
            "per_leaf=True for within-leaf collapse (correct for replay "
            "duplicates, which always recur inside one partition path); "
            "global dedup across partition leaves needs a shuffle "
            "re-layout this maintenance op does not impose — that is "
            "relayout_parquet()"
        )
    if not flat:
        # batched phases (the delete_parquet_where shape): ONE
        # stage-root listing decides which leaves need recovery, file
        # lists are snapshotted once, and every leaf's (rows, keys)
        # comes from ONE (dir, key)-grouped scan job — a mostly-clean
        # corpus pays one job submission, not one per leaf; only
        # leaves that actually rewrite submit further jobs
        stage_root = vacuum_stage_root(path)
        pending = (
            set(fs.listdir(stage_root)) if fs.isdir(stage_root) else set()
        )
        recovered_map: dict[str, bool] = {}
        for leaf in leaves:
            st = _vacuum_stage_for_leaf(path, leaf)
            recovered_map[leaf] = os.path.basename(
                st
            ) in pending and _recover_stage(fs, st, leaf)
        files_map = {leaf: fs.parquet_files(leaf) for leaf in leaves}
        counts_map = _batched_vacuum_counts(
            spark, path, leaves, files_map, key_cols, fs, max_concurrency
        )

        def leaf_args(leaf: str) -> dict:
            return dict(
                files=files_map[leaf],
                counts=None if counts_map is None else counts_map[leaf],
                recovered=recovered_map[leaf],
            )

        reports = _fanout(
            lambda leaf: _vacuum_leaf(
                spark,
                fs,
                leaf,
                _vacuum_stage_for_leaf(path, leaf),
                key_cols,
                target_bytes,
                **leaf_args(leaf),
            ),
            leaves,
            max_concurrency,
        )  # leaf order kept
        agg = {
            "dir": path,
            "rows_before": sum(r["rows_before"] for r in reports),
            "rows_after": sum(r["rows_after"] for r in reports),
            "n_dup_rows": sum(r["n_dup_rows"] for r in reports),
            "n_files_before": sum(r["n_files_before"] for r in reports),
            "n_files_after": sum(r["n_files_after"] for r in reports),
            "recovered": any(r["recovered"] for r in reports),
            "rewritten": any(r["rewritten"] for r in reports),
            "n_leaves": len(reports),
            "leaves": reports,
        }
        fs.rmdir_if_empty(vacuum_stage_root(path))  # end-of-pass cleanup
        return agg
    report = _vacuum_leaf(
        spark,
        fs,
        leaves[0],
        os.path.join(vacuum_stage_root(path), "_root"),
        key_cols,
        target_bytes,
        recovered_empty=recovered_empty,
    )
    fs.rmdir_if_empty(vacuum_stage_root(path))  # end-of-pass cleanup
    return report


def _batched_vacuum_counts(
    spark: SparkSession,
    path: str,
    leaves: list[str],
    files_map: dict[str, list[tuple[str, int]]],
    key_cols: list[str] | tuple[str, ...],
    fs,
    max_concurrency: int = 1,
) -> dict[str, tuple[int, int]] | None:
    """Per-leaf ``(rows_before, n_within_leaf_keys)`` for per-leaf
    vacuum in ONE scan job: group by (file's directory, key columns) —
    the same (leaf, key) grain the N per-leaf aggregates shuffle in
    total — then fold to leaf grain INSIDE Spark, collecting one short
    row per leaf.  A mostly-clean 10k-leaf corpus pays one job
    submission instead of 10k.  Null-safe key grouping as in the
    per-leaf form (null-key groups count).  Ragged non-hive layouts,
    unmapped directories, and leaves whose own footer schema lacks a
    key column (the union read would NULL it and silently merge
    distinct keys where the per-leaf read raises and surfaces the
    drift) return None → exact per-leaf fallback."""
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    for leaf in leaves:
        rel = os.path.relpath(leaf, path.rstrip("/"))
        if rel == "." or any("=" not in seg for seg in rel.split(os.sep)):
            return None  # ragged layout: per-leaf fallback is exact
    if not _leaf_carries_columns(
        spark, path, leaves, files_map, fs, set(key_cols), max_concurrency
    ):
        return None  # schema drift: let the per-leaf read surface it
    dir2leaf = {_scheme_stripped(leaf): leaf for leaf in leaves}
    all_files = [p for files in files_map.values() for p, _ in files]
    if not all_files:
        return {leaf: (0, 0) for leaf in leaves}
    try:
        rows = (
            spark.read.option("basePath", path)
            .parquet(*all_files)
            .groupBy(
                F.expr(
                    "regexp_replace(input_file_name(), '/[^/]+$', '')"
                ).alias("__dir"),
                *[F.col(c) for c in key_cols],
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("__dir")
            .agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("nk"))
            .collect()
        )
    except Exception:
        # same degradation contract as _batched_leaf_counts: the
        # per-leaf fallback is exact where the one-read shape fails
        return None
    counts: dict[str, tuple[int, int]] = {leaf: (0, 0) for leaf in leaves}
    for r in rows:
        leaf = dir2leaf.get(unquote(urlparse(r["__dir"]).path))
        if leaf is None:
            return None  # unmapped dir (layout drift): exact fallback
        counts[leaf] = (int(r["n"] or 0), int(r["nk"]))
    return counts


def _vacuum_leaf(
    spark: SparkSession,
    fs,
    leaf: str,
    stage: str,
    key_cols: list[str] | tuple[str, ...],
    target_bytes: int,
    recovered_empty: bool = False,
    files: list[tuple[str, int]] | None = None,
    counts: tuple[int, int] | None = None,
    recovered: bool | None = None,
) -> dict:
    """Recover/count/collapse ONE leaf — vacuum's unit of work (see
    :func:`vacuum_parquet` for the contract; leaf independence is what
    makes the per-leaf mode scale and crash-recover leaf-by-leaf).
    ``files``/``counts``/``recovered`` arrive precomputed from the
    per-leaf driver's batched phases (one stage-root listing, one
    whole-snapshot count job) — when absent, this leaf computes its
    own (the flat-corpus path and the ragged-layout fallback)."""
    if recovered is None:
        recovered = _recover_stage(fs, stage, leaf)
    recovered = recovered or recovered_empty

    if files is None:
        files = fs.parquet_files(leaf)
    total = sum(sz for _, sz in files)
    from pyspark.sql import functions as F

    df = None
    if counts is not None:
        rows_before, n_keys = counts
    else:
        # plain read is exact for COUNTING: the aggregate touches only
        # key columns, and key-column drift cannot hide duplicates
        # (missing-key rows merge into the null-key group, which only
        # ever inflates the dup count — and the rewrite guard below
        # refuses before any damage); footer probes stay off the
        # healthy no-op path this way
        df = spark.read.parquet(*[p for p, _ in files])
        # ... unless the SAMPLED schema itself lacks a key column
        # (Spark samples one footer with mergeSchema off): the groupBy
        # below would fail analysis with an unresolved-column error
        # instead of the refusal contract — and a sampled schema
        # missing the key proves the sampled FILE misses it, so the
        # footer guard raises the contractual ValueError here
        _fold = _name_fold(spark)
        if _fold(key_cols) - _fold(df.columns):
            _require_key_footers(spark, fs, files, key_cols)
        # null-safe key grouping (count_distinct would IGNORE null-key
        # groups — dropDuplicates keeps them, so the report would drift
        # and the fast path would re-rewrite forever on a null-key
        # corpus)
        row = (
            df.groupBy(*[F.col(c) for c in key_cols])
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("nk"))
            .first()
        )
        rows_before = int(row["n"] or 0)
        n_keys = int(row["nk"])
    frag = (
        len(files) >= 2 and total / len(files) < target_bytes * _FRAG_FRACTION
    )
    report = {
        "dir": leaf,
        "rows_before": rows_before,
        "rows_after": n_keys,
        "n_dup_rows": rows_before - n_keys,
        "n_files_before": len(files),
        "recovered": recovered,
        "rewritten": rows_before != n_keys or frag,
    }
    if not report["rewritten"]:
        report["n_files_after"] = len(files)
        return report
    # size the output from SURVIVOR bytes, not pre-dedup bytes: a
    # heavily replayed corpus (10× duplicate rows) would otherwise get
    # ~10× more files than target_bytes implies and stay fragmented
    # until a later pass; scaling by the survivor fraction keeps file
    # sizes on target whatever the duplication factor (compressed
    # bytes scale ~linearly with surviving rows for replay duplicates,
    # which are byte-identical copies)
    n_out = max(
        1, math.ceil(total * n_keys / max(rows_before, 1) / target_bytes)
    )
    # rewrite guard (relayout's, at leaf grain; see
    # _require_key_footers): footer reads are metadata-grain and paid
    # only by leaves that actually rewrite; the same name sets decide
    # whether the rewrite read needs mergeSchema (drifted extra
    # columns survive NULL-filled instead of being dropped by a
    # sampled schema).
    names = _require_key_footers(spark, fs, files, key_cols)
    drift = _names_drift(names)
    if df is None or drift:
        # the count frame (plain read) cannot serve a DRIFTED rewrite:
        # its sampled schema would drop the drifted column
        reader = spark.read
        if drift:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[p for p, _ in files])
    df.dropDuplicates(list(key_cols)).coalesce(n_out).write.mode(
        "overwrite"
    ).parquet(stage)
    fs.write_text_atomic(
        os.path.join(stage, _MANIFEST),
        "\n".join(os.path.basename(p) for p, _ in files),
    )
    _finish_swap(fs, stage, leaf)
    report["n_files_after"] = len(fs.parquet_files(leaf))
    return report


def delete_stage_root(path: str) -> str:
    """Predicate-delete's staging sibling (see
    :func:`compact_stage_root`; each maintenance op owns its stage
    family — a crashed delete swap is finished by the next DELETE on
    the path, a crashed vacuum by the next vacuum)."""
    return os.path.join(
        os.path.dirname(path.rstrip("/")) or ".",
        "_delete_stage_" + os.path.basename(path.rstrip("/")),
    )


def _delete_stage_for_leaf(path: str, leaf: str) -> str:
    """Leaf-keyed stage under :func:`delete_stage_root` (the
    digest-suffixed scheme of :func:`_vacuum_stage_for_leaf`)."""
    rel = os.path.relpath(leaf, path)
    if rel == ".":
        rel = "_root"
    else:
        rel = (
            rel.replace(os.sep, "__")
            + "-"
            + hashlib.md5(rel.encode("utf-8")).hexdigest()[:8]
        )
    return os.path.join(delete_stage_root(path), rel)


def _infer_partition_converter(vals: list):
    """Mimic Spark partition-value type inference over one column's
    observed path-segment strings, so driver-side predicate evaluation
    sees the same column types a whole-table read would reconstruct —
    without it, ``month < 10`` would compare lexicographically
    ('9' < '10' is false) and the fast path would delete the wrong
    leaves.  Two layers, both mirroring the JVM
    (``PartitioningUtils``):

    - PER VALUE: int → long → scale-0 decimal → double → date, gated
      by STRICT regexes, not Python's own parsers (which are laxer
      than the JVM's: ``int('1_0')`` == 10, ``int(' 7')`` == 7,
      ``float('nan')`` parses — each would type a column numeric where
      Spark keeps it string, and the fast path would then
      manifest-drop whole leaves the exact scan path would keep).
    - ACROSS VALUES: Spark widens per-value types with
      ``findWiderTypeForPartitionColumn``, whose partition-specific
      rules are double + decimal → STRING and double + long → STRING
      (precision-loss guards), while double + int → double and
      int/long/decimal mixes widen numerically.  A gate that typed
      every double-parseable set ``double`` would answer numerically
      where the scan compares raw spellings — ``{'0.5', '.5', '5.'}``
      types STRING table-wide, so ``part == '0.5'`` misses leaf
      ``part=.5`` in the scan but would hit it under a double probe: a
      wrong delete.  (Found by the exhaustive spelling-lattice sweep,
      tests/test_membership_sweep.py.)

    Returns (python_converter, spark_type_name); the converter
    VALIDATES only — the probe feeds Spark the raw strings and casts
    them JVM-side, so cast semantics (notably the session timezone for
    timestamps) match the scan path exactly.  int-vs-bigint and
    decimal-vs-double differences from the real inference are
    verdict-safe: string pivots coerce through the same casts, and
    values past double's 15 significant digits bail.  (None, None)
    disables the fast path for values whose JVM typing is ambiguous
    from here — a string-typed column still holding digit-leading /
    whitespace-padded / NaN-Infinity values (Spark may type those
    date/decimal/double).  Falling back to the scan is always exact."""
    import datetime as _dt
    import re
    from decimal import Decimal as _Dec
    from decimal import InvalidOperation

    nn = [v for v in vals if v is not None]

    _INT_RE = re.compile(r"[+-]?\d+")
    _DEC_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
    _DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}")
    _TS_RE = re.compile(
        r"\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d{1,6})?"
    )

    def _sig_digits(v: str) -> int:
        # digit count the double-safety cap uses (exponent digits
        # included — conservative: only ever bails MORE)
        return len(re.sub(r"[^0-9]", "", v).lstrip("0"))

    def _cls(v: str) -> str:
        """Spark's per-value partition type (class-grained)."""
        if _INT_RE.fullmatch(v):
            i = int(v)
            if -(2**31) <= i < 2**31:
                return "int"
            if -(2**63) <= i < 2**63:
                return "long"
            return "dec"  # JVM: BigDecimal, scale 0
        if _DEC_RE.fullmatch(v):
            try:
                d = _Dec(v).as_tuple()
            except InvalidOperation:
                return "str"
            scale = -d.exponent
            if scale <= 0 and len(d.digits) <= 38:
                return "dec"  # '5.', '1e2': scale-0 JVM BigDecimal
            return "dbl"
        if _DATE_RE.fullmatch(v):
            try:
                _dt.date.fromisoformat(v)
                return "date"
            except ValueError:
                return "str"
        if _TS_RE.fullmatch(v):
            try:
                _dt.datetime.fromisoformat(v.replace(" ", "T"))
                return "ts"
            except ValueError:
                return "str"
        return "str"

    ident = lambda v: v  # noqa: E731 — converters validate only
    if not nn:
        # all-null column: every probe row is NULL and NULL evaluates
        # identically under any typing — string is as exact as any
        return ident, "string"
    if nn:
        classes = {_cls(v) for v in nn}
        if classes <= {"int", "long", "dec", "dbl"}:
            if "dbl" in classes and classes & {"long", "dec"}:
                # Spark's findWiderTypeForPartitionColumn: STRING —
                # raw spellings compare lexicographically either way
                return ident, "string"
            if classes & {"dbl", "dec"}:
                if any(_sig_digits(v) > 15 for v in nn):
                    # past double precision the scan's decimal-exact
                    # compare can differ from a double probe — bail
                    return None, None
                return ident, "double"
            return ident, "bigint"
        if classes == {"date"}:
            return ident, "date"
        if classes == {"ts"}:
            return ident, "timestamp"
        if classes == {"str"}:
            for v in nn:
                if (
                    v != v.strip()
                    or (v and (v[0].isdigit() or v[0] in "+-."))
                    or v.strip()
                    in ("NaN", "Infinity", "+Infinity", "-Infinity")
                ):
                    # JVM might still type this string (Double.parseDouble
                    # trims whitespace and accepts NaN/Infinity) — bail
                    return None, None
            return ident, "string"
    # mixed date/timestamp/string-with-numeric sets widen by rules not
    # modeled here (usually to string, date+ts to ts) — scan is exact
    return None, None


#: function names (Column API and SQL spellings both arrive as
#: UnresolvedFunction pre-resolution) that must NEVER reach the
#: partition-only membership probe: file-context expressions evaluate
#: AGAINST THE PROBE's empty context (input_file_name() = '') while
#: analyzing fine, and random ones are not meaningful for a delete
#: under either evaluation grain.  This is the fast bail; the analyzed
#: -plan determinism check below is the comprehensive gate (Catalyst
#: marks every one of these Nondeterministic after resolution).
_PROBE_BLOCKED_FNS = frozenset(
    {
        "input_file_name",
        "input_file_block_start",
        "input_file_block_length",
        "spark_partition_id",
        "monotonically_increasing_id",
        "rand",
        "randn",
        "random",
        "randstr",
        "uniform",
        "uuid",
        "shuffle",
    }
)

#: resolved expression classes that smuggle an inner plan whose column
#: references the driver-side walk cannot see (a correlated subquery's
#: data-column refs live in the subplan) — opaque to the fast paths
_PROBE_BLOCKED_CLASSES = frozenset(
    {
        "ScalarSubquery",
        "Exists",
        "InSubquery",
        "ListQuery",
        "LateralSubquery",
        "UnresolvedStar",
        "UnresolvedRegex",
    }
)


def _predicate_tree_info(spark: SparkSession, cond) -> dict | None:
    """Walk ``cond``'s UNRESOLVED Catalyst tree driver-side (classic
    py4j; the converter is how Spark itself turns a ColumnNode into an
    expression) and report what the maintenance fast paths need to
    decide eligibility WITHOUT ever letting the JVM analyzer fail —
    analysis failure was the old discovery mechanism for data-column
    predicates, and it stack-traced an ERROR into driver logs on every
    routine opt-out delete.  Returns::

        {"cols":        set of single-part attribute names referenced,
         "first_parts": leading name of every multi-part reference
                        (struct access / qualified ref),
         "multi":       full DOTTED form of every multi-part reference
                        (``s.x``) — what the batched counters verify
                        against per-leaf footer FIELD paths, so nested
                        struct drift routes to the exact fallback just
                        like top-level column drift,
         "multipart":   any multi-part reference present,
         "blocked":     a file-context / random function, star
                        expansion, or subquery is present}

    or None when the tree is unavailable (API drift, Connect) — the
    callers treat None as "cannot prove anything" and take their exact
    fallback."""
    try:
        conv = getattr(
            getattr(
                spark._jvm,
                "org.apache.spark.sql.classic."
                "ColumnNodeToExpressionConverter$",
            ),
            "MODULE$",
        )
        cols: set[str] = set()
        first_parts: set[str] = set()
        multi: set[str] = set()
        multipart = blocked = False
        stack = [conv.apply(cond._jc.node())]
        while stack:
            e = stack.pop()
            cls = e.getClass().getSimpleName()
            if cls in _PROBE_BLOCKED_CLASSES:
                blocked = True
            elif cls == "UnresolvedAttribute":
                np = e.nameParts()
                if np.size() == 1:
                    cols.add(np.apply(0))
                else:
                    multipart = True
                    first_parts.add(np.apply(0))
                    multi.add(
                        ".".join(np.apply(i) for i in range(np.size()))
                    )
            elif cls == "UnresolvedFunction":
                np = e.nameParts()
                if np.apply(np.size() - 1).lower() in _PROBE_BLOCKED_FNS:
                    blocked = True
            elif cls == "UnresolvedNamedLambdaVariable":
                pass  # lambda-bound name, not a column reference
            elif cls.startswith("Unresolved"):
                blocked = True  # anything else unresolved is opaque
            ch = e.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return {
            "cols": cols,
            "first_parts": first_parts,
            "multi": multi,
            "multipart": multipart,
            "blocked": blocked,
        }
    except Exception:
        return None


def _analyzed_plan_deterministic(df) -> bool:
    """True iff every expression in ``df``'s ANALYZED plan is
    deterministic — the comprehensive nondeterminism gate for the
    membership probe: after resolution Catalyst marks InputFileName /
    SparkPartitionID / MonotonicallyIncreasingID / Rand / Uuid /
    nondeterministic UDFs all ``Nondeterministic``, so anything the
    name blocklist misses (an alias, a UDF) is caught here.  False on
    any walk failure — the callers fall back to the exact scan path."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            exprs = node.expressions()
            for i in range(exprs.size()):
                if not exprs.apply(i).deterministic():
                    return False
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return True
    except Exception:
        return False


def _leaf_part_values(
    path: str, leaves: list[str]
) -> dict[str, dict[str, str | None]] | None:
    """``{leaf: {col: raw_value_or_None}}`` parsed from a regular hive
    layout's path segments (``__HIVE_DEFAULT_PARTITION__`` → None,
    percent-escapes decoded), or None for flat/ragged layouts.  Shared
    by the membership probe and the rewrite frame's typed-literal
    partition attach — both must see the SAME raw spellings."""
    from urllib.parse import unquote

    out: dict[str, dict[str, str | None]] = {}
    cols0: list[str] | None = None
    for leaf in leaves:
        rel = os.path.relpath(leaf, path.rstrip("/"))
        if rel == ".":
            return None  # flat table: no partition columns at all
        vals: dict[str, str | None] = {}
        for seg in rel.split(os.sep):
            if "=" not in seg:
                return None  # not a hive-layout leaf
            k, v = seg.split("=", 1)
            vals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
        if cols0 is None:
            cols0 = sorted(vals)
        elif sorted(vals) != cols0:
            return None  # ragged layout
        out[leaf] = vals
    return out


def _partition_only_membership(
    spark: SparkSession, path: str, leaves: list[str], cond
) -> dict[str, bool] | None:
    """Decide per-leaf predicate membership DRIVER-SIDE when the
    predicate references only partition columns: the leaf's path
    segments carry every referenced value, so one tiny local-relation
    job over one row per leaf replaces one scan job per leaf — the
    difference between O(1) and O(n_leaves) Spark jobs for the headline
    TTL shape (``day < cutoff`` over a 10k-leaf table).  Returns
    ``{leaf: matched}`` (partition-only ⇒ a leaf's rows all match or
    none do), or None when the fast path does not apply: a flat table,
    irregular partition paths, or a predicate that references any
    data column.  Data-column references are detected by walking the
    predicate's own expression tree BEFORE any JVM analysis (the old
    let-analysis-fail discovery stack-traced an ERROR into driver logs
    on every routine opt-out delete); the same walk rejects
    file-context expressions (input_file_name() analyzes fine against
    the probe but evaluates against an EMPTY file name there — a
    ``input_file_name() NOT LIKE '%bad%'`` delete would manifest-drop
    whole leaves the scan path keeps), and an analyzed-plan
    determinism check rejects anything Catalyst marks
    ``Nondeterministic`` that the name walk missed (a rand() delete is
    not meaningful under either path and is unsupported).  Probe
    values are typed by CASTING STRINGS INSIDE SPARK, never by
    converting driver-side: TimestampType.toInternal interprets naive
    datetimes in the driver OS timezone while the scan path casts
    partition strings under ``spark.sql.session.timeZone`` — on a
    UTC-pinned session over a non-UTC driver the two diverge by the tz
    offset and leaves near a cutoff boundary flip.  When
    ``spark.sql.sources.partitionColumnTypeInference.enabled`` is
    false every probe column stays STRING (lexicographic compares),
    mirroring what the scan path sees under that configuration."""
    from pyspark.sql import functions as F

    by_leaf = _leaf_part_values(path, leaves)
    if by_leaf is None:
        return None  # flat or ragged layout
    rows = [by_leaf[leaf] for leaf in leaves]
    cols = sorted(rows[0])
    if "__leaf__" in cols:
        return None  # pathological column name
    # eligibility is proven from the predicate's OWN tree, silently:
    # every reference must be a single-part name naming a partition
    # column, and no file-context / random / star / subquery construct
    # may appear — otherwise the scan path takes over without the JVM
    # analyzer ever seeing (and error-logging) a failed probe
    info = _predicate_tree_info(spark, cond)
    if info is None or info["blocked"] or info["multipart"]:
        return None
    case_sensitive = (
        spark.conf.get("spark.sql.caseSensitive", "false").lower() == "true"
    )
    part_names = set(cols) if case_sensitive else {c.lower() for c in cols}
    refs = (
        info["cols"]
        if case_sensitive
        else {c.lower() for c in info["cols"]}
    )
    if not refs <= part_names:
        return None  # references a data column: the scan path is exact
    if (
        spark.conf.get(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "true"
        ).lower()
        == "false"
    ):
        # inference disabled ⇒ Spark types EVERY partition column
        # string and compares lexicographically; the probe must too
        # (month < '10' flips for '9' between the typings)
        types = {c: "string" for c in cols}
    else:
        types = {
            c: _infer_partition_converter([r[c] for r in rows])[1]
            for c in cols
        }
        if any(t is None for t in types.values()):
            return None  # ambiguous JVM typing: the scan path is exact
    data = [
        tuple([leaf] + [r[c] for c in cols])
        for leaf, r in zip(leaves, rows)
    ]
    schema = ", ".join(["__leaf__ string"] + [f"{c} string" for c in cols])
    try:
        probe = spark.createDataFrame(data, schema).select(
            "__leaf__",
            # cast INSIDE Spark so the session timezone (and cast
            # semantics generally) govern the probe exactly as they
            # govern the scan path; strict regex validation above
            # guarantees every cast succeeds under ANSI
            *[
                F.col(c)
                if types[c] == "string"
                else F.col(c).cast(types[c]).alias(c)
                for c in cols
            ],
        )
        wdf = probe.where(cond)
        if not _analyzed_plan_deterministic(wdf):
            return None  # nondeterministic construct the walk missed
        hits = {r["__leaf__"] for r in wdf.select("__leaf__").collect()}
    except Exception:
        # probe construction/evaluation failed (pathological column
        # names, exotic casts) — the per-leaf scan path is exact
        return None
    return {leaf: (leaf in hits) for leaf in leaves}


def _scheme_stripped(p: str) -> str:
    """One spelling for path identity across the local arm's plain
    paths, the Hadoop arm's ``scheme:/...`` forms and
    ``input_file_name``'s percent-encoded URIs (shared by both batched
    counters)."""
    from urllib.parse import urlparse

    return urlparse(p).path or p


def _leaf_carries_columns(
    spark: SparkSession,
    path: str,
    leaves: list[str],
    files_map: dict[str, list[tuple[str, int]]],
    fs,
    needed: set[str],
    max_concurrency: int = 1,
) -> bool:
    """True iff every non-empty leaf's own footer schema (one sample
    file per leaf — the same single-schema pick a per-leaf read makes)
    carries every ``needed`` data column, partition-path columns
    excluded.  ``needed`` names may be DOTTED (``s.x``, from a nested
    struct-field predicate): those are verified against the footer's
    full field paths, so a leaf whose struct lacks the referenced field
    routes to the fallback exactly like a missing top-level column.
    The batched counters read ALL leaves in one union whose schema
    comes from ONE file (mergeSchema off): a leaf whose files lack a
    predicate/key column OR field would yield NULLs and be SILENTLY
    counted as zero-match, where the per-leaf fallback raises an
    AnalysisException and surfaces the schema drift — so a failing
    check here must route to that fallback.  Footer reads are
    driver-side metadata ops (pyarrow locally, ranged Hadoop tail
    reads remotely), one per leaf, fanned out over ``max_concurrency``
    (a 10k-leaf remote store would otherwise pay 10k sequential RPC
    round-trips before its single count job), paid only on paths that
    are about to scan the whole snapshot anyway."""
    if not needed:
        return True
    case_sensitive = (
        spark.conf.get("spark.sql.caseSensitive", "false").lower() == "true"
    )

    def fold(names):
        return set(names) if case_sensitive else {n.lower() for n in names}

    want = fold(needed)
    nested = any("." in n for n in want)
    todo: list[tuple[str, set[str]]] = []
    for leaf in leaves:
        files = files_map[leaf]
        if not files:
            continue
        rel = os.path.relpath(leaf, path.rstrip("/"))
        pcols = fold(
            seg.split("=", 1)[0]
            for seg in (rel.split(os.sep) if rel != "." else [])
            if "=" in seg
        )
        need = want - pcols
        if need:
            todo.append((leaf, need))

    def check(args: tuple[str, set[str]]) -> bool:
        leaf, need = args
        try:
            probe = (
                fs.footer_field_paths if nested else fs.footer_column_names
            )
            return need <= fold(probe(*files_map[leaf][0]))
        except Exception:
            return False  # unreadable footer: the fallback is exact

    return all(_fanout(check, todo, max_concurrency))


def _batched_leaf_counts(
    spark: SparkSession,
    path: str,
    leaves: list[str],
    files_map: dict[str, list[tuple[str, int]]],
    cond,
    fs,
    max_concurrency: int = 1,
) -> dict[str, tuple[int, int]] | None:
    """Per-leaf ``(rows_before, n_match)`` for a data-column predicate
    in ONE map-side-combined scan job over the whole file-list
    snapshot, grouped by ``input_file_name`` and folded to leaf grain
    driver-side — the lever that makes an N-leaf opt-out delete cost
    one count job instead of N.  Files map back to leaves by FULL
    scheme-stripped path (basenames are NOT unique across leaves: one
    dynamic-partition write task emits the same ``part-NNNNN-uuid``
    name into every partition it touches); an unmapped file falls back
    to exact per-leaf counting by returning None, as does a ragged
    non-hive layout where one ``basePath`` read cannot span the
    leaves, and a leaf whose own footer schema LACKS a referenced data
    column — or, for a nested ``s.x`` predicate, the referenced STRUCT
    FIELD (verified against full footer field paths; a struct present
    everywhere but missing the field in one leaf would NULL-fill and
    silently zero-match just like a missing column, where the per-leaf
    read raises FIELD_NOT_FOUND and surfaces the drift).  The collect
    is file-grain — control-plane sized (one short row per file, never
    data)."""
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    flat = len(leaves) == 1 and leaves[0].rstrip("/") == path.rstrip("/")
    if not flat:
        for leaf in leaves:
            rel = os.path.relpath(leaf, path.rstrip("/"))
            if rel == "." or any(
                "=" not in seg for seg in rel.split(os.sep)
            ):
                return None  # ragged layout: per-leaf fallback is exact
    info = _predicate_tree_info(spark, cond)
    if info is not None:
        if info["blocked"]:
            # star expansion / subquery / file-context construct: the
            # reference set is opaque to the walk — per-leaf fallback
            return None
        if not _leaf_carries_columns(
            spark,
            path,
            leaves,
            files_map,
            fs,
            info["cols"] | info["first_parts"] | info["multi"],
            max_concurrency,
        ):
            return None  # schema drift: let the per-leaf read surface it
    # keys are scheme-stripped (urlparse path) so the local arm's plain
    # paths, the Hadoop arm's `scheme:/...` forms, and input_file_name's
    # percent-encoded URIs all meet on one spelling
    path2leaf: dict[str, str] = {}
    all_files: list[str] = []
    for leaf, files in files_map.items():
        for p, _ in files:
            path2leaf[_scheme_stripped(p)] = leaf
            all_files.append(p)
    if not all_files:
        return {leaf: (0, 0) for leaf in leaves}
    try:
        reader = spark.read
        if not flat:
            reader = reader.option("basePath", path)
        rows = (
            reader.parquet(*all_files)
            .groupBy(F.input_file_name().alias("__file"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cond.cast("long")).alias("nm"),
            )
            .collect()
        )
    except Exception:
        # the one-read shape can fail where per-leaf reads succeed
        # (cross-leaf physical type drift without mergeSchema,
        # conflicting directory structures): the per-leaf fallback is
        # exact, so degrade instead of aborting the maintenance pass
        return None
    counts = {leaf: [0, 0] for leaf in leaves}
    for r in rows:
        leaf = path2leaf.get(unquote(urlparse(r["__file"]).path))
        if leaf is None:
            return None  # unmapped file (renamed mid-flight): fallback
        counts[leaf][0] += int(r["n"])
        counts[leaf][1] += int(r["nm"] or 0)
    return {leaf: (n, nm) for leaf, (n, nm) in counts.items()}


def delete_parquet_where(
    spark: SparkSession,
    path: str,
    predicate,
    target_bytes: int = 128 * 1024 * 1024,
    max_concurrency: int = 1,
) -> dict:
    """Delete every row matching ``predicate`` (a SQL string or a
    Column) from a parquet directory, flat or partitioned — the
    retention/compliance maintenance op of the family (opt-out and
    takedown removal, poisoned-document purges, TTL enforcement): the
    lakehouse ``DELETE WHERE`` expressed as a leaf-grain rewrite, with
    the same staged two-phase swap as vacuum/compaction.

    Scale shape: the unit of work is one leaf.  A predicate that
    references ONLY partition columns (the headline shapes: TTL by
    ``day < cutoff``, tenant removal by ``owner = X``) never scans a
    leaf at all — membership is decided driver-side from the path
    segments in ONE local-relation job for every leaf at once (with
    Spark's partition-value type inference mirrored, so ``month < 10``
    compares numerically), and row counts come from parquet footer
    metadata: a 10k-leaf TTL delete runs zero per-leaf Spark jobs.
    A predicate touching data columns pays ONE map-side-combined scan
    job over the WHOLE snapshot of file lists, grouped by file and
    folded to leaf grain driver-side (mapped by full scheme-stripped
    path — basenames are NOT leaf-unique under dynamic-partition
    writes) — never a count job per leaf: the N-leaf opt-out
    delete costs 1 + matching-leaf-rewrites job submissions, not
    N + rewrites.  (Ragged non-hive layouts keep an exact per-leaf
    counting fallback.)  Under every path a leaf with zero matches is left
    BYTE-IDENTICAL (no rewrite, no write amplification — the dominant
    case for a targeted delete over a 100 TB table), and only matching
    leaves rewrite their survivors to ~``target_bytes`` files.
    ``max_concurrency`` > 1 processes that many leaves at once (leaf
    independence, the compact/vacuum argument).  Delete predicates
    must be deterministic (a ``rand()`` delete is meaningless under
    either evaluation grain).

    Crash contract (per leaf): before the manifest the leaf is
    byte-identical — the delete simply has not happened and the re-run
    redoes it; after the manifest the swap is finished by the next
    delete call on the path (install-then-retire).  The only mid-swap
    visible artifact is survivors duplicated AND deleted rows still
    present (originals not yet retired) — a delete can be DELAYED by a
    crash, never half-applied in a way that loses a kept row.
    Readers needing delete-is-durable semantics should key on this
    call returning, not on a concurrent scan.

    Predicates may MIX partition and data columns (each leaf then
    reads with ``basePath`` so path-segment columns land on the rows
    alongside the file columns).  A leaf whose every row matches (the
    TTL partition drop) skips the Spark rewrite entirely: a manifest
    listing all originals IS a complete committed swap (install
    nothing, retire all), so dropping aged partitions costs only file
    deletes — no write amplification at all.  Returns totals plus
    per-leaf reports: ``rows_before`` /
    ``n_deleted`` / ``rows_after`` / ``n_files_before`` /
    ``n_files_after`` / ``n_leaves_rewritten``."""
    from pyspark.sql import functions as F

    cond = F.expr(predicate) if isinstance(predicate, str) else predicate

    def _leaf_part_cols(leaf: str) -> list[str]:
        rel = os.path.relpath(leaf, path.rstrip("/"))
        return [
            seg.split("=", 1)[0]
            for seg in (rel.split(os.sep) if rel != "." else [])
            if "=" in seg
        ]

    def _leaf_frame(leaf: str, files: list[tuple[str, int]], part_cols):
        # read the SNAPSHOT file list, never the directory: counts,
        # survivor filters and retire manifests must all see the same
        # files, so a concurrent append between snapshot and rewrite
        # is simply untouched (neither copied nor retired).  Partition
        # columns (path segments, not file columns) must land on the
        # rows so the predicate can reference them alongside data
        # columns (mixed shapes: `event_type = 'x' OR value < 0`).
        # They attach as TYPED LITERALS — the leaf's raw path value
        # cast inside Spark to the TABLE-WIDE inferred type (the
        # membership probe's exact machinery) — never via a per-leaf
        # ``basePath`` read: single-leaf partition inference types the
        # column leaf-LOCALLY, and when leaf spellings are
        # heterogeneous ({'0.5','1'}: double table-wide, int on leaf
        # part=1) the rewrite would evaluate the predicate under a
        # DIFFERENT typing than the batched count that ordered the
        # rewrite — under ANSI the pivot cast throws mid-delete, and
        # with ANSI off the survivor filter silently disagrees with
        # the count (r16; tests/test_r16_opt.py pins both).  When the
        # typing gate cannot prove the table-wide type the basePath
        # read remains (status quo: those spellings bail to the exact
        # scan paths before any rewrite is ordered).
        # mergeSchema only when the leaf's footers drift: survivor
        # rewrites must carry columns present in only SOME of the
        # leaf's files (NULL-filled elsewhere) instead of dropping
        # them with the sampled schema; for the predicate itself the
        # merged read keeps the documented NULL contract — rows from a
        # file lacking the predicate column evaluate NULL and SURVIVE
        # (a delete removes only affirmatively-selected rows), while a
        # whole-leaf missing column still raises.  The uniform corpus
        # pays footer probes only on leaves that count exactly or
        # rewrite — never on the zero-match fast path.
        reader = spark.read
        if _names_drift(_leaf_footer_names(fs, files)):
            reader = reader.option("mergeSchema", "true")
        if part_cols and part_types() is not None:
            df = reader.parquet(*[p for p, _ in files])
            types = part_types()
            for c in part_cols:  # path order, matching a basePath read
                lit = F.lit(part_vals()[leaf][c])
                if types[c] != "string":
                    lit = lit.cast(types[c])
                df = df.withColumn(c, lit)
            return df
        if part_cols:
            reader = reader.option("basePath", path)
        return reader.parquet(*[p for p, _ in files])

    def one_leaf(leaf: str) -> dict:
        stage = _delete_stage_for_leaf(path, leaf)
        recovered = recovered_map[leaf]
        files = files_map[leaf]
        if not files:
            return {
                "dir": leaf,
                "rows_before": 0,
                "n_deleted": 0,
                "rows_after": 0,
                "n_files_before": 0,
                "n_files_after": 0,
                "recovered": recovered,
                "rewritten": False,
            }
        total = sum(sz for _, sz in files)
        df = part_cols = None
        if membership is not None:
            # partition-only fast path: membership was decided driver-
            # side before the fan-out; this leaf's footer reads run
            # HERE so max_concurrency parallelizes them (they are FS
            # ops — the only per-leaf cost on this path)
            rows_before = fs.footer_num_rows(files)
            n_match = rows_before if membership[leaf] else 0
        elif counts_map is not None:
            # data-column predicate: counts came from the ONE whole-
            # snapshot scan job — this leaf submits a Spark job only
            # if it rewrites survivors below
            rows_before, n_match = counts_map[leaf]
        else:
            # ragged-layout fallback: exact per-leaf count
            part_cols = _leaf_part_cols(leaf)
            df = _leaf_frame(leaf, files, part_cols)
            counts = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cond.cast("long")).alias("nm"),
            ).first()
            rows_before = int(counts["n"] or 0)
            n_match = int(counts["nm"] or 0)
        report = {
            "dir": leaf,
            "rows_before": rows_before,
            "n_deleted": n_match,
            "rows_after": rows_before - n_match,
            "n_files_before": len(files),
            "recovered": recovered,
            "rewritten": n_match > 0,
        }
        if n_match == 0:
            # zero-match fast path: leaf byte-identical, listing+count
            # is the whole cost (and the idempotent re-run state)
            report["n_files_after"] = len(files)
            return report
        survivors = rows_before - n_match
        manifest = os.path.join(stage, _MANIFEST)
        if survivors == 0:
            # whole-leaf delete (the TTL partition drop): no survivors
            # to stage, so skip the Spark write entirely — a manifest
            # listing every original is a complete committed swap
            # (install nothing, retire all), and the crash contract is
            # identical from the commit point on
            fs.makedirs(stage)
            fs.write_text_atomic(
                manifest, "\n".join(os.path.basename(p) for p, _ in files)
            )
            _finish_swap(fs, stage, leaf)
            report["n_files_after"] = 0
            return report
        n_out = max(
            1,
            math.ceil(total * survivors / max(rows_before, 1) / target_bytes),
        )
        if df is None:  # batch-counted leaf: build its frame only now,
            part_cols = _leaf_part_cols(leaf)  # only rewriters pay it
            df = _leaf_frame(leaf, files, part_cols)
        # NOT(cond) with null-safe semantics: a NULL predicate row is
        # not a match, so it SURVIVES — deletes remove only rows the
        # predicate affirmatively selects
        df.where(~F.coalesce(cond, F.lit(False))).drop(*part_cols).coalesce(
            n_out
        ).write.mode("overwrite").parquet(stage)
        fs.write_text_atomic(
            manifest, "\n".join(os.path.basename(p) for p, _ in files)
        )
        _finish_swap(fs, stage, leaf)
        report["n_files_after"] = len(fs.parquet_files(leaf))
        return report

    fs = _fs_for(spark, path)
    path = fs.normalize(path)
    leaves = fs.leaf_dirs(path)
    if not leaves:
        return {
            "dir": path,
            "rows_before": 0,
            "n_deleted": 0,
            "rows_after": 0,
            "n_files_before": 0,
            "n_files_after": 0,
            "recovered": False,
            "rewritten": False,
            "n_leaves_rewritten": 0,
            "leaves": [],
        }
    # table-wide partition typing for the rewrite frames, computed ONCE
    # from the already-listed leaf paths (pure driver-side string work;
    # see _leaf_frame's typed-literal note).  None ⇒ flat/ragged layout
    # or a spelling set whose JVM typing the gate cannot prove — the
    # basePath read stays for those.
    _pv = _leaf_part_values(path, leaves)
    _pt: dict[str, str] | None = None
    if _pv is not None:
        pcols = sorted(next(iter(_pv.values())))
        if (
            spark.conf.get(
                "spark.sql.sources.partitionColumnTypeInference.enabled",
                "true",
            ).lower()
            == "false"
        ):
            _pt = {c: "string" for c in pcols}
        else:
            cand = {
                c: _infer_partition_converter(
                    [_pv[leaf][c] for leaf in leaves]
                )[1]
                for c in pcols
            }
            _pt = None if any(t is None for t in cand.values()) else cand

    def part_vals():
        return _pv

    def part_types():
        return _pt

    # one driver-side membership decision for ALL leaves when the
    # predicate is partition-only; None engages the scan paths below.
    # Report pricing comes from parquet footers on every scheme (the
    # OS API locally, ranged Hadoop-stream reads remotely)
    membership = _partition_only_membership(spark, path, leaves, cond)
    # phase 1 (FS ops only): finish crashed stages — ONE stage-root
    # listing decides which leaves even need a recovery probe — then
    # snapshot every leaf's file list.  Counts, survivor filters and
    # retire manifests all work from this single snapshot.
    stage_root = delete_stage_root(path)
    pending = set(fs.listdir(stage_root)) if fs.isdir(stage_root) else set()
    recovered_map: dict[str, bool] = {}
    for leaf in leaves:
        st = _delete_stage_for_leaf(path, leaf)
        recovered_map[leaf] = os.path.basename(st) in pending and _recover_stage(
            fs, st, leaf
        )
    files_map = {leaf: fs.parquet_files(leaf) for leaf in leaves}
    # phase 2: per-leaf (rows_before, n_match) without per-leaf jobs —
    # partition-only predicates price from footers inside one_leaf
    # (parallel FS ops), data-column predicates from ONE scan job here
    counts_map = (
        None
        if membership is not None
        else _batched_leaf_counts(
            spark, path, leaves, files_map, cond, fs, max_concurrency
        )
    )
    reports = _fanout(one_leaf, leaves, max_concurrency)
    fs.rmdir_if_empty(stage_root)  # end-of-pass cleanup (see _finish_swap)
    return {
        "dir": path,
        "rows_before": sum(r["rows_before"] for r in reports),
        "n_deleted": sum(r["n_deleted"] for r in reports),
        "rows_after": sum(r["rows_after"] for r in reports),
        "n_files_before": sum(r["n_files_before"] for r in reports),
        "n_files_after": sum(r["n_files_after"] for r in reports),
        "recovered": any(r["recovered"] for r in reports),
        "rewritten": any(r["rewritten"] for r in reports),
        "n_leaves_rewritten": sum(1 for r in reports if r["rewritten"]),
        "leaves": reports,
    }


def relayout_stage_root(path: str) -> str:
    """Re-layout's staging sibling (see :func:`compact_stage_root`;
    a crashed re-layout is finished by the next relayout call)."""
    return os.path.join(
        os.path.dirname(path.rstrip("/")) or ".",
        "_relayout_stage_" + os.path.basename(path.rstrip("/")),
    )


def _finish_relayout(
    fs, stage: str, root: str, max_concurrency: int = 1
) -> None:
    """Complete a COMMITTED re-layout swap (manifest present at the
    stage root): install every staged leaf into its table leaf,
    retire the originals the manifest lists (LEAF-RELATIVE paths —
    part-file basenames are not leaf-unique under dynamic-partition
    writes), drop leaf directories the retire emptied, drop the
    stage.  Idempotent from any crash point after the commit marker,
    with the same dual-file tolerance as every other swap
    (:func:`_install_staged`).  ``max_concurrency`` > 1 installs that
    many staged leaves (and retires that many leaf-grouped original
    sets) at once from a driver-side thread pool — distinct staged
    leaves map to distinct targets and distinct directories own
    distinct originals, so the parallelism never interleaves within a
    leaf; py4j FS ops over thousands of leaves are the whole finish
    cost on a remote store."""
    originals = [
        line
        for line in fs.read_text(os.path.join(stage, _MANIFEST)).splitlines()
        if line
    ]

    def install(staged_leaf: str) -> None:
        rel = os.path.relpath(staged_leaf, stage)
        target = root if rel == "." else os.path.join(root, rel)
        fs.makedirs(target)
        _install_staged(fs, staged_leaf, target)

    _fanout(install, fs.leaf_dirs(stage), max_concurrency)

    by_dir: dict[str, list[str]] = {}
    for rel in originals:
        by_dir.setdefault(os.path.dirname(rel), []).append(rel)

    def retire(rels: list[str]) -> None:
        for rel in rels:
            p = os.path.join(root, rel)
            if fs.exists(p):
                fs.remove(p)
            # the local OS arm leaves Hadoop checksum sidecars behind
            # (fs.delete through the Hadoop client drops them itself);
            # a dangling .crc would keep an emptied leaf dir alive
            crc = os.path.join(
                os.path.dirname(p), "." + os.path.basename(p) + ".crc"
            )
            if fs.exists(crc):
                fs.remove(crc)

    _fanout(retire, list(by_dir.values()), max_concurrency)
    # a leaf whose every original retired and that received no staged
    # files is now empty — remove it (and any emptied parents), so a
    # re-layout that MOVED all of a partition's keys elsewhere does not
    # leave phantom directories behind (serial: parents are shared)
    for d in sorted(by_dir, key=lambda s: -s.count(os.sep)):
        while d:
            fs.rmdir_if_empty(os.path.join(root, d))
            d = os.path.dirname(d)
    fs.rmtree(stage)


def relayout_parquet(
    spark: SparkSession,
    path: str,
    key_cols: list[str] | tuple[str, ...],
    target_bytes: int = 128 * 1024 * 1024,
    max_concurrency: int = 1,
    scope: str = "auto",
) -> dict:
    """Collapse duplicate-key rows ACROSS partition leaves — the
    re-layout that per-leaf :func:`vacuum_parquet` honestly refuses:
    when the partition column derives from mutable metadata (a crawl
    re-fetch that moved a document's language bucket, a re-scored
    quality tier), the same key can live in two leaves, and no
    within-leaf pass can collapse it.  One row per ``key_cols``
    GLOBALLY, each surviving row rewritten into the leaf its own
    partition values name.

    Scale shape: finding global duplicates is a global statement, so
    every pass pays ONE narrow key-column-pruned count scan (keys and
    partial counts only — the scheduled no-op case ends there); when
    that scan finds duplicates, a SECOND scan names the FILES that
    hold a duplicated key and the REWRITE is scoped to them (every
    copy of a duplicated key lives in one of them by construction; a
    file outside the set holds only keys that appear nowhere else, so
    deduplicating the affected files alone IS the global dedup).  A
    100 TB corpus with 0.1 % cross-leaf duplicates pays the two scans
    plus a rewrite of ~0.1 % of its files — everything else stays
    byte-identical.  ``scope``:
    ``"auto"`` (default) uses the file-grain path while at most half
    the files are affected and falls back to a full rewrite beyond
    that; ``"files"`` forces file grain; ``"full"`` forces the whole-
    corpus rewrite (also the path that re-renders every partition
    directory name canonically — scoped mode rewrites only affected
    files, so a non-canonical leaf spelling like ``day=01`` can
    coexist with a canonical ``day=1`` twin until a full pass; typed
    readers see one logical partition either way).  The clustered
    write is a RANGE shuffle keyed on (partition columns, hash(key)) —
    the lakehouse "range" write-distribution mode — so a hot partition
    value splits across ~size/``target_bytes`` tasks (that many
    ~``target_bytes`` files) while small leaves coalesce into shared
    tasks (one file each).  A corpus that only ever duplicates WITHIN
    leaves should still run per-leaf vacuum instead (listing + one
    count per pass); this op's no-duplicates fast path is one count
    job deciding the corpus is already collapsed, leaving it
    byte-identical.

    Same two-phase contract as the rest of the family, at TREE grain:
    survivors land in a staging tree outside the root, an atomically-
    renamed ``_SWAP_MANIFEST`` at the stage root (listing every
    original as a LEAF-RELATIVE path — basenames are not leaf-unique)
    is the commit point, then install-then-retire.  A crash before the
    manifest leaves the corpus byte-identical; after it, the next
    relayout call finishes the swap; mid-swap readers can see MORE
    duplicates (originals + installed survivors), never fewer rows —
    a crash can only ADD duplicates, exactly the vacuum promise.
    Which copy of a duplicate key survives is ``dropDuplicates``'s
    unspecified pick; run a CDC fold first when latest-wins is the
    point.  Partition directory names are re-rendered from the TYPED
    partition values (``day=01`` canonicalizes to ``day=1``), and a
    leaf whose keys all moved or collapsed away is removed.
    Concurrent appends between snapshot and swap survive untouched.
    Ragged non-hive layouts are refused (their layout cannot be
    reproduced by a partitioned write), and so is a corpus where ANY
    file's footer lacks a non-partition key column — those rows would
    NULL-key and collapse into one survivor, and a destructive global
    rewrite has no exact fallback to degrade to; other schema drift is
    handled by reading with ``mergeSchema`` (a column present in only
    some leaves survives NULL-filled, never silently dropped).
    ``max_concurrency`` > 1
    parallelizes the finish phase's FS ops (staged-leaf installs,
    per-directory retires) from a driver-side thread pool — the py4j
    round-trips over thousands of leaves, not the Spark jobs, dominate
    the swap on a remote store.  The manifest is O(n_files) text held
    driver-side for the atomic write — linear metadata, the same order
    a lakehouse table format's manifest list carries; a corpus with
    millions of files should re-layout partition-subtree by subtree."""
    from pyspark.sql import functions as F

    if scope not in ("auto", "files", "full"):
        raise ValueError(
            f"scope must be 'auto', 'files' or 'full', got {scope!r}"
        )
    _case_sensitive = (
        spark.conf.get("spark.sql.caseSensitive", "false").lower() == "true"
    )
    _reserved = {"__relayout_c", "__relayout_n", "__relayout_nk",
                 "__relayout_f", "__relayout_tot", "__relayout_fs"}
    _keyset = (
        set(key_cols) if _case_sensitive else {k.lower() for k in key_cols}
    )
    if _reserved & _keyset:
        # resolution is case-insensitive by default, so the fold above
        # matters; a collision would make the working aggregates
        # ambiguous, and the count job has no alternate path to force
        raise ValueError(
            f"key column collides with a relayout working name: "
            f"{sorted(_reserved & _keyset)}"
        )
    fs = _fs_for(spark, path)
    path = fs.normalize(path)
    root = path.rstrip("/")
    stage = relayout_stage_root(path)
    recovered = False
    if fs.isdir(stage):
        if fs.exists(os.path.join(stage, _MANIFEST)):
            # committed re-layout interrupted mid-swap: FINISH it (the
            # stage may hold the only complete copy of some rows)
            _finish_relayout(fs, stage, root, max_concurrency)
            recovered = True
        else:
            fs.rmtree(stage)  # uncommitted junk: originals are intact
    leaves = fs.leaf_dirs(path)
    report = {
        "dir": path,
        "rows_before": 0,
        "rows_after": 0,
        "n_dup_rows": 0,
        "n_files_before": 0,
        "n_files_after": 0,
        "n_leaves_before": len(leaves),
        "recovered": recovered,
        "rewritten": False,
        "n_files_rewritten": 0,
        "scoped": False,
    }
    if not leaves:
        report["n_leaves_after"] = 0
        return report
    part_cols: list[str] | None = None
    for leaf in leaves:
        rel = os.path.relpath(leaf, root)
        segs = [] if rel == "." else rel.split(os.sep)
        if any("=" not in s for s in segs):
            raise ValueError(
                f"relayout_parquet cannot reproduce the layout of "
                f"{leaf!r}: not a hive-style partition path"
            )
        cols = [s.split("=", 1)[0] for s in segs]
        if part_cols is None:
            part_cols = cols
        elif cols != part_cols:
            raise ValueError(
                f"relayout_parquet needs one uniform partition scheme; "
                f"{path!r} mixes {part_cols!r} and {cols!r}"
            )
    files_map = {leaf: fs.parquet_files(leaf) for leaf in leaves}
    sized_files = [f for files in files_map.values() for f in files]
    all_files = [p for p, _ in sized_files]
    report["n_files_before"] = len(all_files)
    if not all_files:
        report["n_leaves_after"] = len(leaves)
        return report
    # schema-drift guards — a global rewrite has NO exact fallback, so
    # unlike the batched counters these refuse instead of degrading:
    # (a) EVERY file must carry every non-partition key column; one
    # that lacks it would NULL the key for its rows and dropDuplicates
    # would collapse them into a single survivor — permanent row loss
    # (per-FILE footers, not a per-leaf sample, because the rewrite is
    # destructive; metadata-grain ranged reads, fanned out, against a
    # pass that is about to rewrite every data byte anyway), and
    # (b) the read below merges schemas, so a column absent from the
    # first file survives the rewrite NULL-filled elsewhere instead of
    # being silently dropped from the whole corpus.
    case_sensitive = (
        spark.conf.get("spark.sql.caseSensitive", "false").lower() == "true"
    )

    def fold(names):
        return set(names) if case_sensitive else {n.lower() for n in names}

    data_keys = fold(key_cols) - fold(part_cols or [])
    if data_keys:

        def missing_keys(file: tuple[str, int]) -> str | None:
            try:
                names = fold(fs.footer_column_names(*file))
            except Exception:
                return "<unreadable footer>"
            lack = data_keys - names
            return ", ".join(sorted(lack)) if lack else None

        for (p, _), lack in zip(
            sized_files, _fanout(missing_keys, sized_files, max_concurrency)
        ):
            if lack:
                raise ValueError(
                    f"relayout_parquet would destroy rows: {p!r} lacks "
                    f"key column(s) {lack} — its rows would NULL-key "
                    f"and collapse into one survivor.  Align schemas "
                    f"first, or re-layout partition subtrees that share "
                    f"a schema (schema_report(spark, path, "
                    f"per_file=True) inventories the drift)."
                )
    reader = spark.read.option("mergeSchema", "true")
    if part_cols:
        reader = reader.option("basePath", path)
    df = reader.parquet(*all_files)
    # job 1, every scope: CHEAP null-safe key counting (count_distinct
    # would ignore null-key groups; dropDuplicates keeps them — same
    # pattern as vacuum).  Narrow shuffle — keys and partial counts,
    # never file strings — so the common scheduled NO-OP pass still
    # costs exactly one count job.
    row = (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("__relayout_c"))
        .agg(
            F.sum("__relayout_c").alias("__relayout_n"),
            F.count(F.lit(1)).alias("__relayout_nk"),
        )
        .first()
    )
    rows_before = int(row["__relayout_n"] or 0)
    n_keys = int(row["__relayout_nk"] or 0)
    report.update(
        rows_before=rows_before,
        rows_after=rows_before,
        n_dup_rows=rows_before - n_keys,
    )
    if rows_before == n_keys:
        # already collapsed: one count job was the whole cost, the
        # corpus stays byte-identical (idempotent re-run state)
        report["n_files_after"] = len(all_files)
        report["n_leaves_after"] = len(leaves)
        return report
    rewrite = sized_files
    if scope != "full":
        # job 2, paid only when there ARE duplicates to collapse:
        # which FILES hold a duplicated key?  Every copy of a
        # duplicated key lives in one of them by construction, and a
        # file outside the set holds only keys that appear nowhere
        # else — so deduplicating the affected files alone IS the
        # global dedup, and everything else stays byte-identical.
        # Shape: dup keys from a NARROW count shuffle (keys + partial
        # counts), then a null-safe SEMI-join of the (keys, file)
        # probe against them — sparse dup sets broadcast (AQE), so
        # file-path strings never shuffle at all; dense sets degrade
        # to a sort-merge join, which is the fallback-to-full shape
        # anyway.  Only the distinct affected-file list (O(n_files),
        # the same order the manifest holds) reaches the driver.
        from urllib.parse import unquote, urlparse

        probe = df.select(
            *[F.col(c) for c in key_cols],
            F.input_file_name().alias("__relayout_f"),
        ).alias("__rl_probe")
        dup = (
            df.groupBy(*[F.col(c) for c in key_cols])
            .agg(F.count(F.lit(1)).alias("__relayout_tot"))
            .where(F.col("__relayout_tot") > 1)
            .drop("__relayout_tot")
            .alias("__rl_dup")
        )
        join_cond = None
        for c in key_cols:
            e = probe[c].eqNullSafe(dup[c])
            join_cond = e if join_cond is None else (join_cond & e)
        aff_rows = (
            probe.join(dup, join_cond, "leftsemi")
            .select("__relayout_f")
            .distinct()
            .collect()
        )
        path2file = {_scheme_stripped(p): (p, sz) for p, sz in sized_files}
        aff = {
            unquote(urlparse(r["__relayout_f"]).path) for r in aff_rows
        }
        hit = [path2file[a] for a in aff if a in path2file]
        if len(hit) == len(aff) and (
            scope == "files" or 2 * len(hit) <= len(all_files)
        ):
            # an unmapped file (renamed mid-flight) or a mostly-
            # affected corpus (auto mode: the detect bookkeeping stops
            # paying for itself around half the files) falls back to
            # the full rewrite above
            rewrite = sorted(hit)
            report["scoped"] = True
    total = sum(sz for files in files_map.values() for _, sz in files)
    rw_bytes = sum(sz for _, sz in rewrite)
    avg_row = total / max(rows_before, 1)
    n_out = max(
        1,
        math.ceil(
            max(rw_bytes - (rows_before - n_keys) * avg_row, avg_row)
            / target_bytes
        ),
    )
    # RANGE-keyed write distribution (the lakehouse "range" mode): keys
    # sort by (partition columns, hash(key)), so a hot partition value
    # spans ~size/target_bytes contiguous ranges (that many tasks, that
    # many ~target_bytes files) while small leaves share a range with
    # neighbors (one file each) — a plain hash repartition on the
    # partition columns would put EVERY row of a partition value in ONE
    # task: one arbitrarily-large file per leaf, no write parallelism
    # for the hottest leaf, and a leaf far above target_bytes that later
    # compaction passes skip as healthy.  The range sampling job reuses
    # the dedup stage's shuffle output, so the corpus is still scanned
    # once.
    shuffle_keys = [F.col(c) for c in (part_cols or [])] + [
        F.hash(*[F.col(c) for c in key_cols])
    ]
    rdf = (
        df
        if not report["scoped"]
        else reader.parquet(*[p for p, _ in rewrite])
    )
    survivors = rdf.dropDuplicates(list(key_cols)).repartitionByRange(
        n_out, *shuffle_keys
    )
    writer = survivors.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(stage)
    # commit point: manifest lists every REWRITTEN snapshot file
    # LEAF-RELATIVELY (scoped mode: only the affected files — the rest
    # were never read into the stage and must survive untouched)
    fs.write_text_atomic(
        os.path.join(stage, _MANIFEST),
        "\n".join(os.path.relpath(p, root) for p, _ in rewrite),
    )
    _finish_relayout(fs, stage, root, max_concurrency)
    leaves_after = fs.leaf_dirs(path)
    report.update(
        rows_after=n_keys,
        rewritten=True,
        n_files_rewritten=len(rewrite),
        n_files_after=sum(
            len(fs.parquet_files(leaf)) for leaf in leaves_after
        ),
        n_leaves_after=len(leaves_after),
    )
    return report


def schema_report(
    spark: SparkSession,
    path: str,
    per_file: bool = False,
    max_concurrency: int = 1,
) -> dict:
    """Inventory the corpus's per-leaf footer schemas and name the
    drift — the diagnostic for every honest refusal/fallback in this
    module (the batched counters route to the exact per-leaf path when
    a leaf's footer lacks a referenced column or struct field;
    ``relayout_parquet`` refuses outright when a file lacks a key
    column): run this to see WHICH leaves disagree and on WHAT before
    aligning schemas or re-laying-out subtree by subtree.

    Metadata-grain only — parquet footer reads (pyarrow locally,
    ranged Hadoop tail reads on ``hdfs://``/``s3a://``), no Spark
    jobs, fanned out over ``max_concurrency``.  Dotted field paths
    descend structs (list/map elements are not dot-addressable and are
    reported as their top-level column).  By default one file per leaf
    is sampled — the same single-schema pick a per-leaf read makes;
    ``per_file=True`` reads every footer and also surfaces
    WITHIN-leaf drift (the grain the re-layout guard checks).

    Returns::

        {"dir": path,
         "n_leaves": int, "n_files": int,
         "uniform": bool,               # every probed footer identical
         "union": sorted field paths over all probed footers,
         "missing": {leaf: sorted fields absent from that leaf
                     (vs the union; partition-path columns excluded)},
         "unreadable": [file paths whose footer failed to parse —
                     reported, never raised; forces uniform=False],
         "within_leaf_drift": {leaf: sorted fields present in some of
                     its files but not all}}   # per_file=True only
    """
    fs = _fs_for(spark, path)
    path = fs.normalize(path)
    leaves = fs.leaf_dirs(path)
    files_map = {leaf: fs.parquet_files(leaf) for leaf in leaves}
    probes: list[tuple[str, tuple[str, int]]] = []
    for leaf in leaves:
        files = files_map[leaf]
        if not files:
            continue
        for f in files if per_file else files[:1]:
            probes.append((leaf, f))

    def read_one(args: tuple[str, tuple[str, int]]) -> set[str] | None:
        try:
            return fs.footer_field_paths(*args[1])
        except Exception:
            return None  # reported, not raised — this is the diagnostic

    probed = _fanout(read_one, probes, max_concurrency)
    unreadable = [
        p for ((_leaf, (p, _sz)), s) in zip(probes, probed) if s is None
    ]
    by_leaf: dict[str, list[set[str]]] = {}
    schemas: list[set[str]] = []
    for (leaf, _f), fields in zip(probes, probed):
        if fields is not None:
            by_leaf.setdefault(leaf, []).append(fields)
            schemas.append(fields)
    union: set[str] = set().union(*schemas) if schemas else set()
    missing: dict[str, list[str]] = {}
    within: dict[str, list[str]] = {}
    for leaf, field_sets in by_leaf.items():
        rel = os.path.relpath(leaf, path.rstrip("/"))
        pcols = {
            seg.split("=", 1)[0]
            for seg in (rel.split(os.sep) if rel != "." else [])
            if "=" in seg
        }
        leaf_union = set().union(*field_sets)
        lack = sorted(union - leaf_union - pcols)
        if lack:
            missing[leaf] = lack
        drift = sorted(leaf_union - set.intersection(*field_sets))
        if per_file and drift:
            within[leaf] = drift
    report = {
        "dir": path,
        "n_leaves": len(leaves),
        "n_files": sum(len(f) for f in files_map.values()),
        "uniform": len({frozenset(s) for s in schemas}) <= 1
        and not unreadable,
        "union": sorted(union),
        "missing": missing,
        "unreadable": sorted(unreadable),
    }
    if per_file:
        report["within_leaf_drift"] = within
    return report
