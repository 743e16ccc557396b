"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` at sf0.01 and compares it to
``oracle_sql()[name]`` via DuckDB: row count + schema + order-insensitive
value hash.  This module reproduces that gate locally (strictly: exact
value equality after sorting columns by name and rows by value) so every
query is verified before the driver ever sees it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from yodel_etl_spark.session import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the canonical tables registered as views (the
    driver pre-registers the same set)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def frame_sig(pdf: pd.DataFrame) -> str:
    """Order-insensitive value hash — the driver's weak gate, verbatim.

    Single shared implementation for BOTH local replicas of the driver's
    correctness check (tools/driver_sim.py and compare_frames below), so
    the two gates cannot drift: columns sorted by name, nulls normalized
    to a sentinel, rows stringified then sorted, md5 over the csv."""
    import hashlib

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # normalize null spellings (Spark None vs DuckDB NaN) before stringify
    pdf = pdf.astype(object).where(pdf.notna(), "<NULL>")
    csv = pdf.astype(str).to_csv(index=False, header=True)
    rows = csv.splitlines()
    body = sorted(rows[1:])
    return hashlib.md5(("\n".join([rows[0]] + body)).encode()).hexdigest()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)) or (
        isinstance(b, float) and math.isnan(b)
    ):
        a_null = a is None or (isinstance(a, float) and math.isnan(a))
        b_null = b is None or (isinstance(b, float) and math.isnan(b))
        return a_null == b_null
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> ParityResult:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return ParityResult(
            name, False, f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
    if len(spark_pdf) != len(duck_pdf):
        return ParityResult(name, False, f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not _values_equal(a, b):
                return ParityResult(
                    name, False, f"value mismatch col={c} row={i}: spark={a!r} duck={b!r}"
                )
    # Also run the driver's weaker stringify-hash through the shared
    # implementation, so the pytest gate subsumes driver_sim's check and
    # stringify-level divergences (e.g. float repr) surface here first.
    ss, ds = frame_sig(spark_pdf), frame_sig(duck_pdf)
    if ss != ds:
        return ParityResult(
            name, False, f"values equal but driver-style frame_sig differs: {ss} != {ds}"
        )
    return ParityResult(name, True)


def check_query(
    spark: SparkSession, name: str, sf_dir: str, con: duckdb.DuckDBPyConnection | None = None
) -> ParityResult:
    """Run one registered query against its oracle at ``sf_dir``."""
    from yodel_etl_spark.registry import load_all

    q = load_all()[name]
    if q.oracle is None:
        sdf = q.build(spark, sf_dir)
        n = sdf.count()
        return ParityResult(name, True, f"rows-only (no oracle): {n} rows")
    own_con = con is None
    if own_con:
        con = duckdb_connect(sf_dir)
    try:
        spark_pdf = q.build(spark, sf_dir).toPandas()
        duck_pdf = con.sql(q.oracle).df()
        return compare_frames(name, spark_pdf, duck_pdf)
    finally:
        if own_con:
            con.close()
