"""K1/K2/K3 — delimited-file sinks.

K1 header CSV (normalize_parks_json.py:214), K2 tab-separated with
sanitized fields (extract_chat_qa_tsv.py:147-161), K3 incremental
DictWriter CSV (test_chat_assistant.py:196-255 — per-row flush so
partial results survive a crash; in Spark that semantic is a streaming
``foreachBatch`` + checkpoint, and batch parity is job-level retry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yodel_etl_spark.ops.cleanse import sanitize_delim


def sanitize_strings(df: DataFrame) -> DataFrame:
    """P8 over every string column: tab/CR/LF → space, trim, null → ''
    (extract_chat_qa_tsv.py:34-40)."""
    return df.select(
        *[
            sanitize_delim(c).alias(c) if isinstance(f.dataType, T.StringType) else F.col(c)
            for c, f in zip(df.columns, df.schema.fields)
        ]
    )


def write_delim(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    sanitize: bool = False,
    single_file: bool = False,
) -> None:
    """Write delimited output.

    ``single_file`` reproduces the reference's one-file-with-header
    shape (``coalesce(1)``) — byte-parity mode for small outputs only;
    leave False at scale so the write stays partition-parallel.
    """
    out = sanitize_strings(df) if sanitize else df
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def incremental_csv_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    sep: str = ",",
    sanitize: bool = False,
):
    """K3 — the reference's per-row-flush DictWriter semantics
    (test_chat_assistant.py:255: partial results survive a crash) as a
    streaming ``foreachBatch`` append with a checkpoint: every
    micro-batch lands atomically and restart resumes from the
    checkpoint instead of redoing finished work.  Returns the started
    ``StreamingQuery``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = sanitize_strings(batch_df) if sanitize else batch_df
        out.write.mode("append").option("header", True).option("sep", sep).csv(path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_csv(df: DataFrame, path: str, **kw) -> None:
    """K1: header CSV (utf-8 is Spark's default encoding)."""
    write_delim(df, path, sep=",", **kw)


def write_tsv(df: DataFrame, path: str, **kw) -> None:
    """K2: sanitized TSV (sanitize defaults ON — the reference always
    scrubs tab/CR/LF before writing TSV)."""
    kw.setdefault("sanitize", True)
    write_delim(df, path, sep="\t", **kw)
