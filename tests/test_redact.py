"""PII redaction: planted-PII semantics, ordering, and cross-engine
(DuckDB) parity on data that actually contains PII — the synthetic
corpus has none, so the registered-query parity only pins the no-op
path."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from yodel_etl_spark.queries.scale_text import _pii_oracle
from yodel_etl_spark.scale.redact import redact_documents, redact_pii

PLANTED = [
    (1, "contact bob.smith+x@example.co.uk or 192.168.0.1 today"),
    (2, "ssn 123-45-6789 card 4111 1111 1111 1111 end"),
    (3, "plain 4111111111111111 and phone +1 (555) 123-4567"),
    (4, "call 555-123-4567 x9"),
    (5, "no pii here, just words and 42"),
    (6, "mail a@b.io twice a@b.io; ip 10.0.0.255."),
    (7, ""),
    (8, "digits 1234567890123 run"),  # 13-digit run -> card
]


def _spark_out(spark):
    df = spark.createDataFrame(PLANTED, "doc_id long, text string")
    return redact_documents(df, "doc_id", "text")


def test_redaction_semantics(spark):
    got = {r["doc_id"]: r.asDict() for r in _spark_out(spark).collect()}
    assert got[1]["redacted"] == "contact <EMAIL> or <IP> today"
    assert got[1]["n_email"] == 1 and got[1]["n_ipv4"] == 1 and got[1]["n_phone"] == 0
    assert got[2]["redacted"] == "ssn <SSN> card <CARD> end"
    assert got[3]["redacted"] == "plain <CARD> and phone <PHONE>"
    assert got[4]["redacted"] == "call <PHONE> x9"
    assert got[5]["redacted"] == PLANTED[4][1]  # untouched
    assert got[6]["n_email"] == 2 and got[6]["n_ipv4"] == 1
    assert got[7]["redacted"] == ""
    assert got[8]["redacted"] == "digits <CARD> run"
    # ordering: the SSN/card digit runs were consumed before the phone
    # pattern ran, so they are not double-redacted as phones
    assert got[2]["n_phone"] == 0 and got[3]["n_card"] == 1


def test_duckdb_parity_on_planted_pii(spark):
    from yodel_etl_spark.testing import compare_frames

    spark_pdf = (
        _spark_out(spark)
        .select(
            "doc_id", "n_email", "n_ssn", "n_card", "n_ipv4", "n_phone",
            F.md5("redacted").alias("redacted_md5"),
        )
        .toPandas()
    )
    con = duckdb.connect()
    con.register("pii_docs", pd.DataFrame(PLANTED, columns=["doc_id", "text"]))
    duck_pdf = con.sql(_pii_oracle("pii_docs")).df()
    res = compare_frames("planted_pii", spark_pdf, duck_pdf)
    assert res.ok, res.detail


def test_redact_pii_column_expression(spark):
    df = spark.createDataFrame([(1, "x 1.2.3.4 y")], "id long, text string")
    assert (
        df.select(redact_pii(F.col("text")).alias("r")).first()["r"] == "x <IP> y"
    )
