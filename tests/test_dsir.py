"""DSIR importance-selection invariants: literal-python score parity,
ordering/limit, parameter validation, and the plan contract (scoring is
a narrow broadcast pass — the only explode feeds the 256-row count).
Cross-engine value parity rides the registered-query oracle gate."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.dsir import dsir_select
from yodel_etl_spark.session import load_tables, release

B = 256


def _bucket(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % m


@pytest.fixture(scope="module")
def sel(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    out = dsir_select(docs, "doc_id", "text", target_pct=5, n_buckets=B, top_n=20)
    pdf = out.toPandas()
    release(out)
    return docs, pdf


def test_dsir_ordering_and_limit(sel):
    _, pdf = sel
    assert len(pdf) == 20
    pairs = list(zip(pdf["score_micro"], pdf["doc_id"]))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_dsir_matches_literal_python(sel):
    """Re-derive every returned score with a plain-python DSIR over the
    same md5 bucketing: integer micro-nat weights must agree EXACTLY
    (the whole point of the fixed-point representation)."""
    docs, pdf = sel
    rows = docs.select("doc_id", F.lower("text").alias("t")).collect()
    toks = {r["doc_id"]: [w for w in r["t"].split() if w] for r in rows}
    tgt = {d for d in toks if _bucket(str(d), 100) >= 95}
    cnt_p = [0] * B
    cnt_q = [0] * B
    for d, tk in toks.items():
        cnt = cnt_p if d in tgt else cnt_q
        for t in tk:
            cnt[_bucket(t, B)] += 1
    np_, nq = sum(cnt_p), sum(cnt_q)
    w = [
        round(
            1e6
            * (
                math.log((cnt_p[b] + 1.0) / (np_ + float(B)))
                - math.log((cnt_q[b] + 1.0) / (nq + float(B)))
            )
        )
        for b in range(B)
    ]

    for _, row in pdf.iterrows():
        want = sum(w[_bucket(t, B)] for t in toks[row["doc_id"]])
        assert want == row["score_micro"], row["doc_id"]
    # and no returned doc is from the target slice
    assert not (set(pdf["doc_id"]) & tgt)


def test_dsir_rejects_bad_target_pct(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    for bad in (0, 100, -3):
        with pytest.raises(ValueError):
            dsir_select(docs, target_pct=bad)


def test_dsir_plan_scoring_is_broadcast_narrow(spark, sf_small):
    """The scoring branch must NOT explode or join per-gram: the weight
    array arrives via broadcast, and the top-k is TakeOrderedAndProject
    (never a global sort exchange)."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    out = dsir_select(docs, top_n=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    release(out)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the scoring branch (everything above the first broadcast build
    # side) must not explode — its input is the cached token table plus
    # the broadcast weight array
    scoring = plan.split("BroadcastExchange")[0]
    assert "Generate" not in scoring, scoring
    # and the explode that feeds the 256-row count pass runs over the
    # persisted base (every Generate rendering sits under a cached
    # subtree, so the corpus is tokenized once, not once per branch)
    assert "InMemoryRelation" in plan
    assert plan.index("InMemoryRelation") < plan.index("Generate"), plan


def test_dsir_cjk_tokenizer_scores_unigram_buckets(spark):
    """tokenizer='cjk': importance weights must see INSIDE no-space CJK
    text.  Target docs carry a marker character; raw docs that also
    carry it must outscore raw docs that don't — a signal the
    whitespace default cannot produce (each doc is ONE opaque token, so
    the marker never reaches its own hash bucket)."""
    from yodel_etl_spark.scale.dsir import hash_bucket

    base = "深度学习模型需要大量训练数据"
    ids = spark.createDataFrame([(i,) for i in range(60)], ["doc_id"])
    tgt_ids = {
        r["doc_id"]
        for r in ids.select(
            "doc_id", (hash_bucket(F.col("doc_id"), 100) >= 80).alias("t")
        ).collect()
        if r["t"]
    }
    rows = []
    for i in range(60):
        if i in tgt_ids:
            rows.append((i, base + "猫猫猫猫"))  # marker-rich target slice
        else:
            rows.append((i, base + ("猫猫" if i % 2 == 0 else "犬犬")))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dsir_select(docs, target_pct=20, top_n=10, tokenizer="cjk").toPandas()
    assert len(out) == 10
    assert all(did % 2 == 0 for did in out["doc_id"])  # marker-bearing raws win
