"""Driver simulation: vanilla SparkSession + DuckDB oracle compare at sf0.01.

Mirrors the graft driver's correctness gate: no yodel engine confs, every
queries() entry vs oracle_sql() via row count + schema + order-insensitive
value hash.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from yodel_etl_spark.testing import frame_sig  # single shared gate implementation

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("driver_sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    n = len(e.entry(spark).collect())
    print(f"ENTRY: {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for name, build in qs.items():
        try:
            sdf = build(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}")
            bad.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only {len(sdf)}")
            continue
        odf = con.sql(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(map(str.lower, sdf.columns)) == sorted(
            map(str.lower, odf.columns)
        )
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        ok_hash = ok_schema and frame_sig(sdf) == frame_sig(odf)
        status = "MATCH" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        if status == "MISMATCH":
            bad.append(name)
        print(f"{name}: {status} rows={len(sdf)}/{len(odf)} schema={ok_schema} hash={ok_hash}")
    print("ALL MATCH" if not bad else f"FAILURES: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
