"""Gopher-rule quality gate: per-rule edge semantics on planted docs
(the synthetic corpus never trips the symbol/bullet/ellipsis rules, so
the registered-query parity alone would pin only their no-op path)."""

from __future__ import annotations

from yodel_etl_spark.scale.quality import gopher_rules

GOOD = (
    "the cat and the dog went to the house of friends that have been "
    "away with them for days " * 3
)  # 54 words, all alpha, >= 2 stopword hits, mean len in band

DOCS = [
    (1, GOOD),
    (2, "short doc the and"),  # fails word count (4 words)
    (3, GOOD.replace("cat", "c#t#ت#")),  # symbols planted on a passing doc
    (4, "- one\n- two\n- three\nplain"),  # 3/4 bullet lines < 0.9 -> ok
    (5, "- one\n- two\n- three"),  # 3/3 bullet lines -> fail
    (6, "first line...\nsecond...\nthird line"),  # 2/3 ellipsis -> fail
    (7, "the of " + "123 456 789 " * 20),  # alpha-word frac 2/62 -> fail
    (8, "the and " + "aaaaaaaaaaaaaaaaaaaaaaaa " * 60),  # mean len > 10 -> fail
    (9, ""),  # empty: every count 0, word rules fail closed
]


def _rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = gopher_rules(df, "doc_id", "text")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_rule_edges(spark):
    r = _rows(spark)
    assert r[1]["pass_gopher"] is True
    assert r[2]["ok_word_count"] is False and r[2]["pass_gopher"] is False
    # planted '#' symbols push the symbol/word ratio over 0.1
    assert r[3]["ok_symbol_ratio"] is False and r[1]["ok_symbol_ratio"] is True
    assert r[4]["ok_bullet_lines"] is True
    assert r[5]["ok_bullet_lines"] is False
    assert r[6]["ok_ellipsis_lines"] is False
    assert r[7]["ok_alpha_words"] is False
    assert r[8]["ok_mean_word_len"] is False
    # empty doc: ratio rules fail closed instead of dividing by zero
    e = r[9]
    assert e["n_words"] == 0 and e["mean_word_len"] == 0.0
    assert not e["ok_symbol_ratio"] and not e["ok_alpha_words"]
    assert e["pass_gopher"] is False


def test_stopword_floor(spark):
    r = _rows(spark)
    assert r[1]["n_stop_hits"] >= 2 and r[1]["ok_stopwords"] is True
    # doc 7 has exactly 'the' and 'of' -> 2 distinct hits, still ok
    assert r[7]["n_stop_hits"] == 2 and r[7]["ok_stopwords"] is True


def test_single_narrow_pass(spark):
    """The gate is one codegen pass: no Exchange anywhere in the plan."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        gopher_rules(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan



def test_ppl_buckets_golden(spark):
    """Fixture LM math by hand: corpus 'a b' x3 + 'a c' + 'x y z'.
    Bigrams: (a,b):3 (a,c):1 (x,y):1 (y,z):1; c1: a=4, x=1, y=1; V=3.
    p(b|a)=(3+1)/(4+3)=4/7, p(c|a)=2/7, p(y|x)=p(z|y)=2/4=0.5.
    Scores (avg ln p): doc1-3 = ln(4/7) = -0.559616, doc4 = ln(2/7)
    = -1.252763, doc5 = ln(.5) = -0.693147.  Rank desc: docs 1,2,3
    (tie -> id), then 5, then 4; head_n = tail_n = floor(5*0.3) = 1."""
    from yodel_etl_spark.scale.lm import perplexity_buckets
    from yodel_etl_spark.session import release

    rows = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "x y z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs, "doc_id", "text", head_pct=30, tail_pct=30)
    got = {r["doc_id"]: (r["n_grams"], r["score"], r["bucket"]) for r in out.collect()}
    release(out)
    assert got[1] == (1, -0.559616, "head")
    assert got[2] == (1, -0.559616, "middle")
    assert got[3] == (1, -0.559616, "middle")
    assert got[5] == (2, -0.693147, "middle")
    assert got[4] == (1, -1.252763, "tail")


def test_ppl_buckets_short_docs_excluded(spark):
    """Docs with <2 tokens have no bigrams and produce no row."""
    from yodel_etl_spark.scale.lm import perplexity_buckets
    from yodel_etl_spark.session import release

    docs = spark.createDataFrame(
        [(1, "only"), (2, "two words"), (3, "")], "doc_id long, text string"
    )
    out = perplexity_buckets(docs, "doc_id", "text")
    ids = {r["doc_id"] for r in out.collect()}
    release(out)
    assert ids == {2}


def test_html_extract_golden(spark):
    """Edge cases: uppercase tags, multi-line script with quotes and
    angle brackets, entity decode order (&amp;lt; must become the
    LITERAL '&lt;' i.e. decode &amp; last, not twice)."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.textstats import html_extract

    rows = [
        (1, '<P>hello</P>\n<SCRIPT lang="js">\nif (a<b) { x("</p>"); }\n</SCRIPT>world'),
        (2, "a &amp;lt; b &nbsp; c&#39;s &quot;q&quot;"),
        (3, "<style>body { margin: 0 }</style>plain"),
        (4, "no markup at all"),
    ]
    df = spark.createDataFrame(rows, "i long, h string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_extract(F.col("h")).alias("t")).collect()
    }
    assert got[1] == "hello world"
    assert got[2] == 'a &lt; b c\'s "q"'
    assert got[3] == "plain"
    assert got[4] == "no markup at all"


def test_ppl_threshold_agrees_with_rank_away_from_cuts(spark, sf_small):
    """The scale-safe threshold cut must agree with the exact rank cut
    everywhere except the documented tie band: with accuracy >> n the
    percentile sketch is exact, so any disagreement doc sits AT a
    cutpoint value or immediately adjacent to the rank boundary (the
    inclusive-side tie semantics lm.py documents)."""
    from yodel_etl_spark.scale.lm import perplexity_buckets
    from yodel_etl_spark.session import load_tables, release

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    rank = perplexity_buckets(docs, "doc_id", "text", method="rank")
    r = {row["doc_id"]: row for row in rank.collect()}
    release(rank)
    thr = perplexity_buckets(docs, "doc_id", "text", method="threshold")
    t = {row["doc_id"]: row for row in thr.collect()}
    release(thr)
    assert set(r) == set(t) and len(r) > 50
    for i in r:
        assert r[i]["score"] == t[i]["score"]
    # the boundary tie band: cutpoint scores on the threshold side plus
    # the two scores straddling each rank boundary
    n = len(r)
    desc = sorted(r.values(), key=lambda row: (-row["score"], row["doc_id"]))
    head_n, tail_n = (n * 30) // 100, (n * 30) // 100
    band = {
        min(row["score"] for row in t.values() if row["bucket"] == "head"),
        max(row["score"] for row in t.values() if row["bucket"] == "tail"),
        desc[head_n - 1]["score"], desc[head_n]["score"],
        desc[n - tail_n - 1]["score"], desc[n - tail_n]["score"],
    }
    disagree = [i for i in r if r[i]["bucket"] != t[i]["bucket"]]
    assert all(t[i]["score"] in band for i in disagree), (
        [(t[i]["score"], r[i]["bucket"], t[i]["bucket"]) for i in disagree],
        band,
    )
    assert len(disagree) / n < 0.1
    # both forms produce all three buckets at plausible proportions
    for res in (r, t):
        sizes = {b: sum(1 for row in res.values() if row["bucket"] == b)
                 for b in ("head", "middle", "tail")}
        assert all(sizes.values()), sizes
        assert abs(sizes["head"] - head_n) <= n // 10, sizes


def test_ppl_threshold_tie_band_is_inclusive(spark):
    """All docs TIED at a cutpoint land on the inclusive side (head at
    the head cut, tail at the tail cut) — the documented divergence
    from rank mode, which splits ties by id."""
    from yodel_etl_spark.scale.lm import perplexity_buckets
    from yodel_etl_spark.session import release

    # scores: docs 1-3 tie at ln(4/7), doc 5 = ln(.5), doc 4 = ln(2/7)
    rows = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "x y z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(
        docs, "doc_id", "text", head_pct=30, tail_pct=30, method="threshold"
    )
    got = {row["doc_id"]: row["bucket"] for row in out.collect()}
    release(out)
    # head cut = 0.7-quantile of 5 scores = the tied top score: ALL
    # three tied docs are head (rank mode heads only doc 1)
    assert got[1] == got[2] == got[3] == "head"
    assert got[4] == "tail"


def test_ppl_method_validated():
    import pytest as _pytest

    from yodel_etl_spark.scale.lm import perplexity_buckets

    with _pytest.raises(ValueError, match="method"):
        perplexity_buckets(None, method="nope")


def test_tokens_cjk_mode(spark):
    """CJK mode: no-space-script codepoints become unigram tokens, latin
    runs still split on whitespace; default mode is byte-unchanged."""
    import pytest
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.textstats import tokens

    df = spark.createDataFrame(
        [("hello 深度学习 world",), ("ปัญญา ai",), ("  plain   text ",)], ["t"]
    )
    out = df.select(
        tokens(F.col("t"), mode="cjk").alias("c"), tokens(F.col("t")).alias("w")
    ).collect()
    assert out[0]["c"] == ["hello", "深", "度", "学", "习", "world"]
    assert out[0]["w"] == ["hello", "深度学习", "world"]
    assert out[1]["c"] == ["ป", "ั", "ญ", "ญ", "า", "ai"]
    assert out[2]["c"] == ["plain", "text"] and out[2]["w"] == ["plain", "text"]
    with pytest.raises(ValueError, match="unknown tokenizer mode"):
        tokens(F.col("t"), mode="nope")


def test_ppl_buckets_cjk_tokenizer(spark):
    """tokenizer='cjk': CJK docs produce character bigrams; under the
    whitespace default the same docs have ONE token each and are
    excluded from the LM entirely (no bigram rows)."""
    from yodel_etl_spark.scale.lm import doc_bigrams, perplexity_buckets

    rows = [(i, "深度学习模型需要大量训练数据"[: 4 + (i % 8)]) for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    assert doc_bigrams(docs, "doc_id", "text").count() == 0  # ws collapse
    grams = doc_bigrams(docs, "doc_id", "text", tokenizer="cjk")
    assert grams.count() == sum(4 + (i % 8) - 1 for i in range(30))
    out = perplexity_buckets(
        docs, "doc_id", "text", method="threshold", tokenizer="cjk"
    ).toPandas()
    assert len(out) == 30
    assert set(out["bucket"]) <= {"head", "middle", "tail"}


def test_gopher_rules_cjk_tokenizer(spark):
    """tokenizer='cjk': the word-grain rules measure characters for
    no-space scripts; the whitespace default sees ONE giant word and
    fails the word-count band for any CJK doc."""
    from yodel_etl_spark.scale.quality import gopher_rules

    text = "深度学习模型需要大量训练数据" * 8  # 112 chars, no spaces
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    ws = gopher_rules(docs, "doc_id", "text").collect()[0]
    cjk = gopher_rules(docs, "doc_id", "text", tokenizer="cjk").collect()[0]
    assert ws["n_words"] == 1
    assert cjk["n_words"] == 112


def test_kn_trigram_literal_python_parity(spark):
    """The interpolated Kneser-Ney trigram LM against a literal
    single-process Python twin of the same formulas: per-doc integer
    micro-nat sums and gram counts must agree EXACTLY on a corpus with
    repeated multiword structure (the case where KN continuation counts
    differ visibly from raw counts)."""
    import math
    from collections import Counter, defaultdict

    from yodel_etl_spark.scale.lm import KN_DISCOUNT, perplexity_buckets
    from yodel_etl_spark.session import release

    phrases = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat sleeps under the warm sun",
        "a slow green turtle walks past the lazy dog",
        "data pipelines shuffle keys and join tables",
        "spark pipelines shuffle digests and join tables",
        "the lazy dog sleeps", "the quick brown fox returns",
    ]
    rows = [(i, phrases[i % len(phrases)] + f" tail{i % 5} end") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs, "doc_id", "text", order=3, method="threshold")
    got = {r["doc_id"]: (r["n_grams"], r["score"]) for r in out.collect()}
    release(out)

    # ---- literal twin -------------------------------------------------
    D = KN_DISCOUNT
    tri = Counter()
    doc_tris = {}
    for i, text in rows:
        tk = text.lower().split()
        ts = [(tk[j], tk[j + 1], tk[j + 2]) for j in range(len(tk) - 2)]
        doc_tris[i] = ts
        tri.update(ts)
    c12, n1p_12 = Counter(), Counter()
    mid, n1p_d2d, n1p_2d, uni = Counter(), Counter(), Counter(), Counter()
    for (w1, w2, w3), c in tri.items():
        c12[(w1, w2)] += c
        n1p_12[(w1, w2)] += 1
        mid[(w2, w3)] += 1
    for (w2, w3), c in mid.items():
        n1p_d2d[w2] += c
        n1p_2d[w2] += 1
        uni[w3] += 1
    n_pairs = len(mid)

    def nats(g):
        w1, w2, w3 = g
        p_uni = uni[w3] / n_pairs
        p_mid = (mid[(w2, w3)] - D) / n1p_d2d[w2] + D * n1p_2d[w2] / n1p_d2d[w2] * p_uni
        p = (tri[g] - D) / c12[(w1, w2)] + D * n1p_12[(w1, w2)] / c12[(w1, w2)] * p_mid
        return round(math.log(p) * 1_000_000)

    want = {}
    for i, ts in doc_tris.items():
        s = sum(nats(g) for g in ts)
        want[i] = (len(ts), round(s / 1_000_000 / len(ts), 6))
    assert got == want


def test_trigram_short_docs_excluded_and_order_validated(spark):
    from yodel_etl_spark.scale.lm import perplexity_buckets
    from yodel_etl_spark.session import release

    docs = spark.createDataFrame(
        [(1, "two words"), (2, "three word doc"), (3, "a longer document here")],
        "doc_id long, text string",
    )
    out = perplexity_buckets(docs, "doc_id", "text", order=3, method="threshold")
    ids = {r["doc_id"] for r in out.collect()}
    release(out)
    assert ids == {2, 3}  # <3 tokens -> no trigram row
    import pytest as _pytest

    with _pytest.raises(ValueError, match="order"):
        perplexity_buckets(docs, "doc_id", "text", order=4)
