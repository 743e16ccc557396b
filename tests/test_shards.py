"""Training-shard export: manifest integrity, byte-determinism across
re-runs, verified read-back (value roundtrip), tamper detection, and
the binary-column gate."""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest

from yodel_etl_spark.io.shards import (
    MANIFEST,
    read_training_shards,
    write_training_shards,
)


@pytest.fixture()
def docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )


def test_roundtrip_and_manifest(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    man = write_training_shards(docs, out, rows_per_shard=40, key_cols=["doc_id"])
    n = docs.count()
    assert man["n_rows"] == n
    assert man["n_shards"] == -(-n // 40)
    assert sum(s["rows"] for s in man["shards"]) == n
    # manifest digests are the files' real digests
    for s in man["shards"]:
        p = os.path.join(out, "data", s["file"])
        blob = open(p, "rb").read()
        assert len(blob) == s["bytes"]
        assert hashlib.sha256(blob).hexdigest() == s["sha256"]
        assert sum(1 for _ in open(p, "rb")) == s["rows"]  # JSONL lines
    back = read_training_shards(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    assert back.schema == docs.schema


def test_byte_deterministic_across_runs(spark, docs, tmp_path):
    m1 = write_training_shards(docs, str(tmp_path / "a"), rows_per_shard=50)
    m2 = write_training_shards(docs, str(tmp_path / "b"), rows_per_shard=50)
    d1 = [(s["shard"], s["rows"], s["sha256"]) for s in m1["shards"]]
    d2 = [(s["shard"], s["rows"], s["sha256"]) for s in m2["shards"]]
    assert d1 == d2  # identical bytes, not just identical row sets


def test_tamper_detection(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, rows_per_shard=100, key_cols=["doc_id"])
    victim = sorted(glob.glob(out + "/data/shard=*/part-*"))[0]
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    # drop Hadoop's local-FS .crc sidecar so OUR integrity check (the
    # one an object store relies on — S3/GCS have no sidecars) is what
    # sees the corruption, not the local filesystem shim
    crc = os.path.join(os.path.dirname(victim), f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="integrity"):
        read_training_shards(spark, out)
    # verify=False still reads (the escape hatch is explicit)
    assert read_training_shards(spark, out, verify=False).count() > 0


def test_manifest_row_drift_detection(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, rows_per_shard=100)
    man = json.load(open(os.path.join(out, MANIFEST)))
    man["n_rows"] += 1
    json.dump(man, open(os.path.join(out, MANIFEST), "w"))
    with pytest.raises(ValueError, match="row count drift"):
        read_training_shards(spark, out)


def test_binary_gate_and_parquet_mode(spark, tmp_path):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "blob": [b"a", b"bc", b"def"]})
    )
    with pytest.raises(ValueError, match="binary"):
        write_training_shards(df, str(tmp_path / "x"))
    out = str(tmp_path / "pq")
    man = write_training_shards(df, out, rows_per_shard=2, fmt="parquet", key_cols=["id"])
    assert man["format"] == "parquet"
    back = read_training_shards(spark, out)
    assert sorted(map(tuple, back.collect())) == [(1, b"a"), (2, b"bc"), (3, b"def")]


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark, tmp_path):
    """shuffle_seed: same seed -> bit-identical shards (manifest
    digests equal across two exports); different seed -> different
    layout bytes but the SAME row multiset on verified read-back —
    the epoch-reshuffle contract."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.io.shards import read_training_shards, write_training_shards

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )
    p1, p2, p3 = (str(tmp_path / d) for d in ("e1", "e1b", "e2"))
    m1 = write_training_shards(df, p1, n_shards=4, shuffle_seed=1)
    m1b = write_training_shards(df, p2, n_shards=4, shuffle_seed=1)
    m2 = write_training_shards(df, p3, n_shards=4, shuffle_seed=2)

    d1 = [s["sha256"] for s in m1["shards"]]
    assert d1 == [s["sha256"] for s in m1b["shards"]]   # reproducible
    assert d1 != [s["sha256"] for s in m2["shards"]]    # seed-sensitive
    assert m1["shuffle_seed"] == 1 and m2["shuffle_seed"] == 2
    # no helper column leaks into the shards
    back1 = read_training_shards(spark, p1)
    assert sorted(back1.columns) == ["doc_id", "text"]
    rows1 = sorted((r["doc_id"], r["text"]) for r in back1.collect())
    rows2 = sorted(
        (r["doc_id"], r["text"])
        for r in read_training_shards(spark, p3).collect()
    )
    assert rows1 == rows2 and len(rows1) == 500  # same corpus, new order
