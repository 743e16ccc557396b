"""Training-shard export — the last mile of a curation pipeline: write
the curated corpus as N deterministic shards plus a manifest with
per-shard row counts, byte sizes, and sha256 digests, then read it back
with integrity verification.

Why not plain ``df.write.json(path)``: a training loader wants (a)
shards of a KNOWN approximate size it can schedule across data-loader
workers, (b) BYTE-deterministic output so a re-run of the same pipeline
produces bit-identical shards (resumable training, cache keys,
auditability), and (c) a manifest it can trust without re-scanning the
data.  All three are properties of the WRITE PLAN, not the format:

  * shard assignment is ``pmod(xxhash64(key columns), n_shards)`` —
    content-keyed, so the same row lands in the same shard whatever the
    input partitioning; ``repartition(n_shards, shard)`` gives one
    writer task per shard and ``partitionBy`` one file per shard dir;
  * rows are ``sortWithinPartitions``-ordered by the same keys, so the
    shard FILE BYTES are reproducible, not just the row sets (pinned in
    tests: two runs → identical sha256s);
  * the manifest's counts come from a map-side-combined ``groupBy``
    over the shard column and its digests from a DISTRIBUTED
    ``binaryFile`` + ``sha2`` pass — the driver never reads data bytes,
    only the bounded (one-row-per-file) digest table.

Scale posture: one count() to size the shard plan (skippable by passing
``n_shards``), one shuffle on the shard id, digests in one extra
file-grain pass whose unit is a shard file (size rows_per_shard — the
same bound that makes loader scheduling work keeps the digest pass in
executor memory).  At 100 TB none of this touches the driver.

JSONL is the training-loader lingua franca; ``format="parquet"`` keeps
full fidelity (binary embeddings, nested types).  JSONL mode refuses
binary columns honestly rather than silently base64-ing them.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST = "manifest.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    n_shards: int | None = None,
    key_cols: list[str] | None = None,
    fmt: str = "jsonl",
    compression: str | None = None,
    shuffle_seed: int | None = None,
) -> dict:
    """Write ``df`` as deterministic shards + manifest; returns the
    manifest dict.

    ``key_cols`` drive both shard assignment and within-shard order
    (default: every column — fully content-keyed).  ``rows_per_shard``
    is approximate (hash sharding is multinomial-balanced); pass
    ``n_shards`` to skip the sizing ``count()`` when the caller already
    knows the cardinality.

    ``shuffle_seed`` switches to the EPOCH-SHUFFLE layout a training
    loader wants: shard assignment and within-shard order key on
    ``xxhash64(seed, *key columns)`` instead of the raw keys — a
    deterministic seeded global permutation (same seed ⇒ bit-identical
    shards; a different seed ⇒ a different, equally deterministic
    order over the same rows), so "reshuffle the corpus for epoch N"
    is one re-export with ``shuffle_seed=N`` and never a
    ``rand()``-ordered sort that a task retry could perturb."""
    if fmt not in ("jsonl", "parquet"):
        raise ValueError(f"fmt must be 'jsonl' or 'parquet', got {fmt!r}")
    if fmt == "jsonl":
        bin_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)]
        if bin_cols:
            raise ValueError(
                f"binary columns {bin_cols} do not survive JSONL round-trips; "
                "use fmt='parquet' for multimodal shards"
            )
    keys = key_cols or df.columns
    if n_shards is None:
        n_shards = max(1, math.ceil(df.count() / rows_per_shard))
    if shuffle_seed is not None:
        # xxhash64 handles column boundaries and nulls natively (a
        # string-concat key would collide on delimiter injection and
        # null-skipping, making same-seed exports non-deterministic);
        # the key columns join the sort AFTER the hash so even a
        # genuine 64-bit hash tie orders deterministically by content
        perm = F.xxhash64(F.lit(int(shuffle_seed)), *[F.col(c) for c in keys])
        staged = df.withColumn("_perm", perm)
        sharded = (
            staged.withColumn("shard", F.pmod(F.col("_perm"), F.lit(n_shards)))
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "_perm", *keys)
            .drop("_perm")
        )
    else:
        sharded = (
            df.withColumn(
                "shard",
                F.pmod(F.xxhash64(*[F.col(c) for c in keys]), F.lit(n_shards)),
            )
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", *keys)
        )
    data_dir = os.path.join(path, "data")
    counts = {
        r["shard"]: r["rows"]
        for r in sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("rows")).collect()
    }
    writer = sharded.write.mode("overwrite").partitionBy("shard")
    if fmt == "jsonl":
        writer.option("compression", compression or "none").json(data_dir)
    else:
        writer.option("compression", compression or "snappy").parquet(data_dir)
    spark = df.sparkSession
    # distributed digest pass: one row per shard file reaches the driver
    files = (
        spark.read.format("binaryFile")
        .load(data_dir + "/shard=*/part-*")
        .select(
            F.col("path"),
            F.length("content").alias("bytes"),
            F.lower(F.sha2("content", 256)).alias("sha256"),
        )
        .collect()
    )
    by_shard: dict[int, dict] = {}
    for r in files:
        local = r["path"].split(data_dir.rstrip("/") + "/", 1)[-1]
        shard = int(local.split("/", 1)[0].split("=", 1)[1])
        if shard in by_shard:  # one writer task per shard ⇒ one file
            raise AssertionError(f"shard {shard} produced multiple files")
        by_shard[shard] = {
            "shard": shard,
            "file": local,
            "rows": int(counts.get(shard, 0)),
            "bytes": int(r["bytes"]),
            "sha256": r["sha256"],
        }
    manifest = {
        "format": fmt,
        "compression": compression,
        "n_shards": int(n_shards),
        "n_rows": int(sum(counts.values())),
        "key_cols": keys,
        "shuffle_seed": shuffle_seed,
        "schema": json.loads(df.schema.json()),
        "shards": [by_shard[s] for s in sorted(by_shard)],
    }
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_training_shards(
    spark: SparkSession, path: str, verify: bool = True
) -> DataFrame:
    """Read a shard directory back under its manifest schema.

    ``verify=True`` re-digests every shard file (distributed) and
    re-counts rows, raising ``ValueError`` on any drift — the check a
    training job runs before burning GPU-hours on a corrupt corpus."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    schema = T.StructType.fromJson(manifest["schema"])
    data_dir = os.path.join(path, "data")
    if verify and manifest["shards"]:
        want = {s["file"]: (s["bytes"], s["sha256"]) for s in manifest["shards"]}
        got = (
            spark.read.format("binaryFile")
            .load(data_dir + "/shard=*/part-*")
            .select("path", F.length("content").alias("bytes"), F.lower(F.sha2("content", 256)).alias("sha256"))
            .collect()
        )
        seen = {}
        for r in got:
            local = r["path"].split(data_dir.rstrip("/") + "/", 1)[-1]
            seen[local] = (int(r["bytes"]), r["sha256"])
        if seen != want:
            bad = sorted(
                set(want.items()) ^ set(seen.items()), key=lambda kv: kv[0]
            )
            raise ValueError(f"shard integrity check failed: {bad[:4]}")
    reader = spark.read.schema(schema)
    if manifest["format"] == "jsonl":
        out = reader.json(data_dir)
    else:
        out = reader.parquet(data_dir)
    out = out.drop("shard")  # the discovered partition column
    if verify:
        n = out.count()
        if n != manifest["n_rows"]:
            raise ValueError(
                f"row count drift: manifest says {manifest['n_rows']}, read {n}"
            )
    return out
