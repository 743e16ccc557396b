"""URL canonicalization: rule-by-rule goldens AND byte-for-byte
DuckDB parity (the oracle discipline, run in-test since the operator
rides the warc query rather than its own registry slot)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.urlnorm import canonical_url, canonical_url_sql

CASES = [
    # (input, expected canonical)
    ("http://WWW.Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com:443/x", "http://example.com:443/x"),  # non-default kept
    ("http://example.com", "http://example.com/"),
    ("http://example.com/path/", "http://example.com/path"),
    ("http://example.com/?gclid=abc&fbclid=d&msclkid=e", "http://example.com/"),
    ("http://example.com/p?utm_campaign", "http://example.com/p"),
    ("http://example.com/p?z=1&y&x=3", "http://example.com/p?x=3&y&z=1"),
    ("http://example.com/a%20b?q=%C3%A9", "http://example.com/a%20b?q=%C3%A9"),
    ("HTTP://example.com/UPPER/Path", "http://example.com/UPPER/Path"),
    ("http://www.www.example.com/", "http://www.example.com/"),  # one www strip
    ("ftp://Host.com:80/file", "ftp://host.com:80/file"),  # non-http port kept
    ("relative/path?a=1", "relative/path?a=1"),  # no scheme -> pass through
    ("http://example.com/#only-frag", "http://example.com/"),
    ("http://example.com/x?utm_source=1&keep=2&utm_medium=3",
     "http://example.com/x?keep=2"),
]


@pytest.fixture(scope="module")
def spark_out(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    rows = df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    return {r["url"]: r["c"] for r in rows}


def test_goldens(spark_out):
    for url, want in CASES:
        assert spark_out[url] == want, url


def test_duckdb_parity(spark_out):
    con = duckdb.connect()
    expr = canonical_url_sql("url")
    for url, _ in CASES:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [url]).fetchone()[0]
        assert got == spark_out[url], url


def test_warc_query_carries_canonical_url(spark):
    from yodel_etl_spark.registry import load_all

    pdf = load_all()["warc"].build(spark, "/root/testdata/sf0.001").toPandas()
    assert "canon_url" in pdf.columns
    # fixture URLs are already canonical except nothing changes -> equal
    assert (pdf["canon_url"] == pdf["url"]).all()
