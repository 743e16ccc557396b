"""S1 — JSON directory scan (normalize_parks_json.py:135-147;
convert_json_to_text.py:186-205).

The reference lists ``*.json`` in a directory, parses each file, and
accepts a file holding either ONE object or a LIST of objects; corrupt
files are logged and skipped (convert_json_to_text.py:112-117), never
fatal.

Spark-first: one multiLine ``spark.read.json`` over the whole directory
replaces the listing loop, the per-file parse, and the object-or-array
branch (Spark's JSON source handles both shapes natively).  Corrupt
inputs land in a ``_corrupt_record`` column under PERMISSIVE mode —
``split_corrupt`` gives the (good, bad) frames so callers can count /
log the bad side instead of throwing.  At 100 TB the directory scan is
file-partitioned by the source; no driver-side file loop exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = True,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Scan a directory of ``*.json`` files (object-or-array per file).

    With an explicit ``schema`` the corrupt column is appended to it so
    PERMISSIVE mode can capture unparseable file bodies; with inferred
    schema Spark adds the column only if corrupt files exist, so we
    normalize by ensuring it afterwards.
    """
    glob = path if path.endswith(".json") else f"{path.rstrip('/')}/*.json"
    reader = (
        spark.read.option("multiLine", multiline)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        if corrupt_col not in schema.fieldNames():
            schema = T.StructType(list(schema.fields) + [T.StructField(corrupt_col, T.StringType())])
        reader = reader.schema(schema)
    df = reader.json(glob)
    if corrupt_col not in df.columns:
        df = df.withColumn(corrupt_col, F.lit(None).cast("string"))
    return df


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL, cache: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): the reference's log-and-skip policy as two frames
    (convert_json_to_text.py:112-117 skips and counts failures; A2's
    success/failure tally is ``bad.count()``).

    Spark refuses scans whose pruned schema is ONLY the internal
    corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN); the supported pattern is materializing the parse once —
    hence ``cache=True`` by default.  For corpus-scale ingest pass
    ``cache=False`` and land ``good`` to parquet before touching
    ``bad`` (the standard bronze-layer move; the cache is then never
    needed)."""
    if cache:
        df = df.cache()
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(F.col(corrupt_col).alias("raw"))
    return good, bad
