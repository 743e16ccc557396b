"""BM25 retrieval invariants: score ordering/limit, scoring math vs a
literal python reimplementation, and the no-shuffle-before-stats plan
shape.  Cross-engine value parity rides the registered-query oracle
gate (tests/test_oracle_parity.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.search import bm25_topk
from yodel_etl_spark.session import load_tables, release


TERMS = ["spark", "vector", "customer"]


@pytest.fixture(scope="module")
def topk(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    out = bm25_topk(docs, TERMS, top_n=10)
    pdf = out.toPandas()
    release(out)
    return docs, pdf


def test_bm25_ordering_and_limit(topk):
    _, pdf = topk
    assert len(pdf) == 10
    # sorted by score desc, ties by doc_id asc
    pairs = list(zip(pdf["score"], pdf["doc_id"]))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_bm25_matches_literal_python(topk):
    """Re-derive every returned score with plain-python BM25 over the
    same whitespace tokenization; 6 dp rounding must agree."""
    docs, pdf = topk
    rows = docs.select("doc_id", F.lower("text").alias("t")).collect()
    toks = {r["doc_id"]: [w for w in r["t"].split() if w] for r in rows}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in TERMS}

    def score(doc):
        tk = toks[doc]
        s = 0.0
        for t in TERMS:
            tf = tk.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        return round(s, 6)

    for _, row in pdf.iterrows():
        assert score(row["doc_id"]) == pytest.approx(row["score"], abs=1e-9)


def test_bm25_empty_terms_rejected(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_plan_no_explode_no_join_shuffle(spark, sf_small):
    """The scale contract: no Generate (explode) anywhere, the stats
    join is a broadcast (one-row side), and the top-k is
    TakeOrderedAndProject — never a global Sort+Exchange."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    out = bm25_topk(docs, TERMS, top_n=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    release(out)
    assert "Generate" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bm25_odd_terms_and_duplicates(spark, sf_small):
    """Terms with '.' must not break column resolution (internal names
    are positional; pretty tf_{term} names are output-only aliases),
    and duplicate terms are rejected instead of double-counted."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    out = bm25_topk(docs, ["u.s", "spark"], top_n=5)
    pdf = out.toPandas()
    release(out)
    assert list(pdf.columns) == ["doc_id", "dl", "tf_u.s", "tf_spark", "score"]
    assert (pdf["tf_u.s"] == 0).all()  # token absent from the corpus
    with pytest.raises(ValueError):
        bm25_topk(docs, ["spark", "spark"])


def test_bm25_cjk_tokenizer_retrieves_unigrams(spark):
    """tokenizer='cjk': a Chinese document (no spaces) must match a
    single-character query term — under the default whitespace split
    the whole doc is ONE token and tf would be 0 for every term."""
    rows = [
        (1, "深度学习模型需要大量训练数据"),
        (2, "自然言語処理のモデル"),
        (3, "plain english text about spark"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(docs, ["学", "spark"], top_n=3, tokenizer="cjk")
    pdf = out.toPandas().set_index("doc_id")
    release(out)
    assert pdf.loc[1, "tf_学"] == 1  # the 学 codepoint is one unigram token
    assert pdf.loc[2, "tf_学"] == 0  # 学習 absent; 学 not in doc 2's text
    assert pdf.loc[3, "tf_spark"] == 1
    assert pdf.loc[1, "dl"] == 14  # 14 CJK codepoints -> 14 unigram tokens
    # whitespace mode on the same corpus: the CJK doc is one giant token
    ws = bm25_topk(docs, ["学"], top_n=3)
    wpdf = ws.toPandas().set_index("doc_id")
    release(ws)
    assert wpdf.loc[1, "dl"] == 1
    assert (wpdf["tf_学"] == 0).all()
