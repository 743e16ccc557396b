"""Replicates the driver's DuckDB-oracle gate for every registered query.

Runs at sf0.001 by default (fast); set YODEL_TEST_ORACLE_SF=/root/testdata/sf0.01
to mirror the driver exactly.
"""

from __future__ import annotations

import pytest

from yodel_etl_spark.registry import load_all
from yodel_etl_spark.testing import check_query


def _names():
    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_small, name):
    res = check_query(spark, name, sf_small)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_contract_shapes(spark):
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
