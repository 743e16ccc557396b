"""Quality-classifier training invariants: EXACT parity against a
literal single-process numpy twin of the same quantized-GD recipe
(which is also the bit-reproducibility proof — any shuffle-order
dependence would break it), learning actually happens (loss descends,
accuracy beats the base rate on the lang='en' task), and input
validation."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.classifier import train_quality_lr
from yodel_etl_spark.session import load_tables, release

B = 512
ROUNDS = 4  # must mirror the registered clf recipe


def _bucket(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % m


def _py_round_half_up(x: float) -> int:
    # Spark F.round on doubles is HALF_UP (away from zero); python
    # round() is banker's — mirror Spark exactly
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-max(min(z, 30.0), -30.0)))


def _z(w: list, tk: list) -> float:
    L = max(len(tk), 1)
    return w[B] + sum(w[_bucket(t, B)] for t in tk) / L


def _numpy_twin(toks: dict, ys: dict, rounds: int = ROUNDS, lr: float = 4.0):
    """Literal reimplementation of train_quality_lr's quantized
    mean-pooled GD."""
    n = len(toks)
    w = [0.0] * (B + 1)
    losses = []
    for _ in range(rounds):
        grad = [0] * (B + 1)
        loss = 0.0
        for d, tk in toks.items():
            p = _sigmoid(_z(w, tk))
            y = ys[d]
            eps = 1e-12
            loss -= y * math.log(p + eps) + (1 - y) * math.log(1 - p + eps)
            r = _py_round_half_up(1e6 * (p - y))
            rl = _py_round_half_up(r / max(len(tk), 1))
            for t in tk:
                grad[_bucket(t, B)] += rl
            grad[B] += r
        losses.append(loss / n)
        step = lr / (n * 1e6)
        for b in range(B + 1):
            w[b] -= step * grad[b]
    return w, losses


@pytest.fixture(scope="module")
def trained(spark, sf_small):
    """Train via the REGISTERED recipe (median-quality label), then
    collect tokens for the twin; labels come from the scored output
    itself so the twin never re-derives the median."""
    from yodel_etl_spark.registry import load_all

    scored = load_all()["clf"].build(spark, sf_small)
    pdf = scored.toPandas()
    release(scored)
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    rows = docs.select("doc_id", F.lower("text").alias("t")).collect()
    toks = {r["doc_id"]: [x for x in r["t"].split() if x] for r in rows}
    ys = {int(r.doc_id): int(r.y) for r in pdf.itertuples(index=False)}
    w, _ = _numpy_twin(toks, ys)
    return w, pdf, toks, ys


def test_scores_match_numpy_twin_exactly(trained):
    """The twin (trained independently from raw tokens + the output's
    labels) must reproduce every Spark score bit-for-bit — this is the
    shuffle-order-independence proof: any partition-order effect in the
    gradient sums would diverge the weights within a round."""
    w, pdf, toks, ys = trained
    for _, row in pdf.iterrows():
        p = _sigmoid(_z(w, toks[row["doc_id"]]))
        assert _py_round_half_up(1e6 * p) == row["score_micro"], row["doc_id"]
        assert int(p >= 0.5) == row["pred"]
        assert ys[row["doc_id"]] == row["y"]


def test_training_descends_and_beats_base_rate(trained):
    _, pdf, toks, ys = trained
    _, losses = _numpy_twin(toks, ys)
    assert losses[-1] < losses[0]  # full-batch GD on convex loss
    acc = (pdf["pred"] == pdf["y"]).mean()
    base = max(pdf["y"].mean(), 1 - pdf["y"].mean())
    assert acc > base, (acc, base)


def test_empty_corpus_rejected(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        train_quality_lr(empty, F.col("lang") == "en")


def _numpy_twin_minibatch(
    toks: dict, ys: dict, rounds: int, lr: float, n_slices: int
):
    """Literal twin of the n_slices > 1 mini-batch path: round t trains
    on md5 slice t % n_slices, step normalized by that slice's size."""
    slices = {d: _bucket(str(d), n_slices) for d in toks}
    counts: dict[int, int] = {}
    for s in slices.values():
        counts[s] = counts.get(s, 0) + 1
    w = [0.0] * (B + 1)
    for t in range(rounds):
        sl = t % n_slices
        if not counts.get(sl):
            continue
        grad = [0] * (B + 1)
        for d, tk in toks.items():
            if slices[d] != sl:
                continue
            p = _sigmoid(_z(w, tk))
            r = _py_round_half_up(1e6 * (p - ys[d]))
            rl = _py_round_half_up(r / max(len(tk), 1))
            for tok in tk:
                grad[_bucket(tok, B)] += rl
            grad[B] += r
        step = lr / (counts[sl] * 1e6)
        for b in range(B + 1):
            w[b] -= step * grad[b]
    return w


def _full_loss(w: list, toks: dict, ys: dict) -> float:
    eps = 1e-12
    loss = 0.0
    for d, tk in toks.items():
        p = _sigmoid(_z(w, tk))
        loss -= ys[d] * math.log(p + eps) + (1 - ys[d]) * math.log(1 - p + eps)
    return loss / len(toks)


def test_minibatch_matches_twin_and_descends(spark, sf_small):
    """The mini-batch scale path: bit-exact weight parity against the
    literal twin (= determinism: the md5 slice schedule and quantized
    gradients leave no shuffle-order freedom), and the full-corpus loss
    after the slice rounds descends from the zero-weight loss."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    w, scored = train_quality_lr(
        docs, F.col("lang") == "en", rounds=8, lr=4.0, n_slices=4
    )
    pdf = scored.toPandas()
    release(scored)
    rows = docs.select("doc_id", F.lower("text").alias("t"), "lang").collect()
    toks = {r["doc_id"]: [x for x in r["t"].split() if x] for r in rows}
    ys = {r["doc_id"]: int(r["lang"] == "en") for r in rows}
    tw = _numpy_twin_minibatch(toks, ys, rounds=8, lr=4.0, n_slices=4)
    assert w == tw  # exact float equality, element-wise
    # scored output is the final weights applied to the WHOLE corpus
    for _, row in pdf.iterrows():
        p = _sigmoid(_z(w, toks[row["doc_id"]]))
        assert _py_round_half_up(1e6 * p) == row["score_micro"]
    assert _full_loss(w, toks, ys) < _full_loss([0.0] * (B + 1), toks, ys)


def test_minibatch_empty_slices_skipped(spark):
    """A corpus smaller than the slice count leaves some rounds with an
    empty batch — those rounds are skipped, not a division by zero."""
    rows = [(1, "aa bb", "en"), (2, "cc dd", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w, scored = train_quality_lr(
        docs, F.col("lang") == "en", rounds=6, lr=1.0, n_slices=50
    )
    assert len(w) == B + 1 and scored.count() == 2
    release(scored)


def test_n_slices_validated(spark):
    docs = spark.createDataFrame([(1, "x y", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="n_slices"):
        train_quality_lr(docs, F.col("lang") == "en", n_slices=0)
