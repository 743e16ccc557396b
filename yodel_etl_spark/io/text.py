"""S2 — line-oriented text source (test_chat_assistant.py:190-191) and
K4 — one text file per record sink (convert_json_to_text.py:150-168).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str, col: str = "question") -> DataFrame:
    """Non-blank trimmed lines (the reference strips blanks:
    ``[q.strip() for q in f if q.strip()]``)."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias(col))
        .where(F.length(col) > 0)
    )


def write_text_per_record(
    df: DataFrame, id_col: str, text_col: str, out_dir: str, ext: str = ".txt"
) -> int:
    """K4: one ``<id><ext>`` file per record (the reference writes
    ``stem.txt`` per input JSON, convert_json_to_text.py:150-168).

    Runs on the executors via ``foreachPartition`` — each partition
    writes its own records to the (shared) filesystem, so the sink
    scales with the cluster instead of funnelling through the driver.
    Returns the number of rows written, counted with an accumulator
    inside the SAME job — a separate ``count()`` action would re-run
    the whole upstream plan, i.e. pay every LLM call twice when this
    sink terminates an inference pipeline."""
    os.makedirs(out_dir, exist_ok=True)
    rows = df.select(F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text"))
    written = rows.sparkSession.sparkContext.accumulator(0)

    def write_partition(it) -> None:
        n = 0
        for row in it:
            with open(os.path.join(out_dir, f"{row['id']}{ext}"), "w", encoding="utf-8") as f:
                f.write(row["text"] if row["text"] is not None else "")
            n += 1
        written.add(n)

    rows.foreachPartition(write_partition)
    return written.value
