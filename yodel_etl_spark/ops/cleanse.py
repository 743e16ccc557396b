"""Cleansing / schema-alignment operators (SURVEY §2.2 P3/P4/P8/P9/P10).

All pure column expressions; applied across whole DataFrames they stay a
single narrow ``select`` (one codegen stage, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def trim_all(df: DataFrame, pandas_nan_literal: bool = False) -> DataFrame:
    """Whitespace-trim every string column (normalize_parks_json.py:159-161).

    ``pandas_nan_literal=True`` replicates the reference's
    ``astype(str)`` coercion, where a missing value becomes the literal
    string ``"nan"`` *before* classification — byte-parity mode for the
    parks pipeline (SURVEY §7.4).
    """
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            c = F.col(f"`{f.name}`")
            c = F.trim(F.coalesce(c, F.lit("nan"))) if pandas_nan_literal else F.trim(c)
            cols.append(c.alias(f.name))
        else:
            cols.append(F.col(f"`{f.name}`"))
    return df.select(cols)


def ensure_columns(df: DataFrame, required: list[str], dtype: str = "string") -> DataFrame:
    """Inject missing expected columns as nulls
    (normalize_parks_json.py:164-166).  With ``unionByName(
    allowMissingColumns=True)`` this is the engine's schema-alignment
    primitive for ragged multi-file ingest.
    """
    for name in required:
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None).cast(dtype))
    return df


def align_union(frames: list[DataFrame]) -> DataFrame:
    """Union frames with ragged schemas (pd.concat parity,
    normalize_parks_json.py:152): missing columns become nulls."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def sanitize_delim(col: Column | str, fill: str = " ") -> Column:
    """TSV-safe text (extract_chat_qa_tsv.py:34-40): tabs/CR/LF → space,
    trim, null → ''."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), "[\\t\\r\\n]", fill))


def truncate(col: Column | str, max_chars: int) -> Column:
    """Cap string length (judge raw-text cap,
    test_chat_assistant_with_judge.py:543)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_chars)


def null_safe_str(col: Column | str) -> Column:
    """``str(x or "")`` (test_chat_assistant.py:162-168)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(""))
