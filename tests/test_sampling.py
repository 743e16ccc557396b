"""Hash-split invariants: partition of the corpus, append-stability,
fraction validation, and oracle parity via the registered queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.registry import load_all
from yodel_etl_spark.scale.sampling import hash_split
from yodel_etl_spark.session import load_tables


def test_split_is_a_partition(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    s = hash_split(docs, "doc_id")
    # every row gets exactly one label; no rows lost
    assert s.where(F.col("split").isNull()).count() == 0
    assert s.count() == docs.count()
    labels = {r["split"] for r in s.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}


def test_split_is_append_stable(spark, sf_small):
    """Membership of existing rows must not change when the corpus
    grows — the property randomSplit lacks."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    half = docs.where(F.col("doc_id") % 2 == 0)
    full_assign = {
        r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    half_assign = {
        r["doc_id"]: r["split"] for r in hash_split(half, "doc_id").select("doc_id", "split").collect()
    }
    assert all(full_assign[k] == v for k, v in half_assign.items())


def test_split_fractions_roughly_hold(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    n = docs.count()
    counts = {
        r["split"]: r["count"]
        for r in hash_split(docs, "doc_id").groupBy("split").count().collect()
    }
    assert 0.7 <= counts["train"] / n <= 0.9


def test_split_rejects_bad_fractions(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    with pytest.raises(ValueError, match="total 100"):
        hash_split(docs, "doc_id", {"train": 50, "test": 20})


def test_split_is_narrow_no_shuffle(spark, sf_small):
    """The split assignment itself must plan with zero exchanges."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    plan = (
        hash_split(docs, "doc_id")
        .select("doc_id", "split")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_registered_sampling_queries_build(spark, sf_small):
    qs = load_all()
    for name in ("split_docs", "ev_types"):
        assert qs[name].build(spark, sf_small).count() > 0


def test_domain_mix_caps_rare_and_downsamples_big(spark):
    """α=0.5 behavior on a skewed mix: the rare domain keeps every row
    (rate capped at 10000 bp), the dominant domain lands near its
    analytic rate, and the decision is deterministic across calls."""
    from yodel_etl_spark.scale.sampling import domain_mix_resample

    rows = [(i, "rare" if i < 16 else "big") for i in range(16 + 1600)]
    df = spark.createDataFrame(rows, "k long, dom string")
    out = domain_mix_resample(df, "k", "dom", budget_pct=50)
    got = {r["dom"]: r["n"] for r in out.groupBy("dom").count().withColumnRenamed("count", "n").collect()}
    rates = {r["dom"]: r["rate_bp"] for r in out.select("dom", "rate_bp").distinct().collect()}
    # rare: w=4e6, big: w=40e6; W=44e6, N=1616
    # rare rate = 5000*1616*4e6/(44e6*16) = 45,909bp -> capped 10000
    assert rates["rare"] == 10000 and got["rare"] == 16
    # big rate = 5000*1616*40e6/(44e6*1600) = 4590bp -> ~45.9% of 1600
    assert rates["big"] == 4590
    assert abs(got["big"] - 0.459 * 1600) < 0.05 * 1600
    again = {r["dom"]: r["n"] for r in domain_mix_resample(df, "k", "dom", budget_pct=50)
             .groupBy("dom").count().withColumnRenamed("count", "n").collect()}
    assert again == got


def test_domain_mix_null_domain_is_its_own_stratum(spark):
    """NULL-domain rows must be sampled at their own rate, not silently
    dropped by the rate equi-join (they also count in the totals)."""
    from yodel_etl_spark.scale.sampling import domain_mix_resample

    rows = [(i, None if i < 8 else "big") for i in range(8 + 800)]
    df = spark.createDataFrame(rows, "k long, dom string")
    out = domain_mix_resample(df, "k", "dom", budget_pct=50)
    by_dom = {r["dom"]: r["n"] for r in out.groupBy("dom").count()
              .withColumnRenamed("count", "n").collect()}
    # the rare NULL stratum caps at rate 1 -> all 8 rows survive
    assert by_dom.get(None) == 8
    assert 0 < by_dom["big"] < 800


# ----------------------------------------------- reservoir_per_key
def test_reservoir_exactly_k_per_key(spark, sf_small):
    from yodel_etl_spark.scale.sampling import reservoir_per_key

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    out = reservoir_per_key(docs, "source", "doc_id", k=3).toPandas()
    sizes = out.groupby("key").size()
    key_n = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes.index) == set(key_n)  # every key represented
    for key, n in key_n.items():
        assert sizes[key] == min(3, n), (key, n)
    # ranks are exactly 1..size per key
    for key, grp in out.groupby("key"):
        assert sorted(grp["rk"]) == list(range(1, len(grp) + 1))


def test_reservoir_deterministic_and_seed_sensitive(spark, sf_small):
    from yodel_etl_spark.scale.sampling import reservoir_per_key

    docs = load_tables(spark, sf_small, ("documents",))["documents"]

    def draw(seed):
        return set(
            map(
                tuple,
                reservoir_per_key(docs, "source", "doc_id", k=3, seed=seed)
                .select("key", "id")
                .toPandas()
                .itertuples(index=False),
            )
        )

    a1, a2, b = draw("s1"), draw("s1"), draw("s2")
    assert a1 == a2  # bit-for-bit reproducible
    assert a1 != b  # a different seed actually redraws


def test_reservoir_two_phase_equals_single_window(spark, sf_small):
    """The salted two-phase form must be EXACTLY the single-window
    top-k (the skew optimization may not change the sample)."""
    from pyspark.sql import Window

    from yodel_etl_spark.scale.sampling import reservoir_per_key

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    two = reservoir_per_key(docs, "source", "doc_id", k=3, salts=4)
    rnd = F.md5(F.concat_ws("|", F.lit("r5"), F.col("doc_id").cast("string")))
    one = (
        docs.select(F.col("source").alias("key"), F.col("doc_id").alias("id"), rnd.alias("_r"))
        .withColumn("rk", F.row_number().over(Window.partitionBy("key").orderBy("_r", "id")))
        .where(F.col("rk") <= 3)
        .select("key", "id", "rk")
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))


def test_reservoir_rejects_bad_k(spark, sf_small):
    from yodel_etl_spark.scale.sampling import reservoir_per_key

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    with pytest.raises(ValueError):
        reservoir_per_key(docs, "source", "doc_id", k=0)


def test_leakage_safe_split_no_edge_straddles(spark):
    """Near-dup cluster members must land in the SAME split — the
    train/test contamination hole id-keyed splits have."""
    import pandas as pd

    from yodel_etl_spark.scale.sampling import hash_split, leakage_safe_split

    # 300 docs; pairs chain docs into 3-doc clusters (0,1,2),(3,4,5)…
    # for the first half, second half singletons
    ids = list(range(300))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    edges = [(i, i + 1) for i in range(0, 150, 3)] + [
        (i + 1, i + 2) for i in range(0, 150, 3)
    ]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    )
    out = leakage_safe_split(df, "doc_id", pairs).persist()
    rows = {r["doc_id"]: (r["component"], r["split"]) for r in out.collect()}
    assert len(rows) == 300
    # invariant: both ends of every edge share component AND split
    for a, b in edges:
        assert rows[a] == rows[b], (a, b, rows[a], rows[b])
    # singletons get their own id as component
    for i in range(151, 300):
        assert rows[i][0] == i
    # every configured split is populated and the id-keyed split DOES
    # straddle at least one edge on the same data (the hole is real)
    assert {s for _, s in rows.values()} == {"train", "val", "test"}
    naive = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id").collect()
    }
    assert any(naive[a] != naive[b] for a, b in edges)
    out.unpersist()


# ---------------------------------------------------------- priority sampling


def _ps_corpus(spark, n=400):
    # weights 1..8 by id arithmetic — deterministic, skewed enough that
    # weight sensitivity is measurable
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 8 + 1).cast("long").alias("w")
    )


def test_priority_sample_deterministic_and_seed_redraws(spark):
    from yodel_etl_spark.scale.sampling import priority_sample

    df = _ps_corpus(spark)
    a1 = {r["id"] for r in priority_sample(df, "id", "w", 50).collect()}
    a2 = {r["id"] for r in priority_sample(df, "id", "w", 50).collect()}
    b = {r["id"] for r in priority_sample(df, "id", "w", 50, seed="other").collect()}
    assert a1 == a2 and len(a1) == 50
    assert a1 != b  # a redraw that matched would be astronomically unlucky


def test_priority_sample_weight_sensitivity(spark):
    """Across many independent draws the mean sampled weight must
    exceed the corpus mean — heavy rows win more often (the point of
    weighted sampling).  Deterministic: fixed seed list."""
    from yodel_etl_spark.scale.sampling import priority_sample

    df = _ps_corpus(spark).persist()
    corpus_mean = 4.5  # weights 1..8 uniform
    means = []
    for s in ("s0", "s1", "s2"):
        rows = priority_sample(df, "id", "w", 40, seed=s).collect()
        means.append(sum(r["w"] for r in rows) / len(rows))
    df.unpersist()
    assert all(m > corpus_mean for m in means), means


def test_priority_sample_estimator_tracks_total(spark):
    """sum(est) over the sample is the DLT unbiased estimator of the
    corpus total weight — at k=100 of 400 rows it should land within
    25% for each of these fixed seeds (values are deterministic; the
    bound has slack on purpose)."""
    from yodel_etl_spark.scale.sampling import priority_sample

    df = _ps_corpus(spark).persist()
    total = 400 / 8 * sum(range(1, 9))  # 1800
    for s in ("e0", "e1", "e2"):
        est = sum(
            r["est"] for r in priority_sample(df, "id", "w", 100, seed=s).collect()
        )
        assert abs(est - total) / total < 0.25, (s, est)
    df.unpersist()


def test_priority_sample_exhaustive_when_k_exceeds_n(spark):
    from yodel_etl_spark.scale.sampling import priority_sample

    df = spark.range(5).select(F.col("id"), F.lit(3).cast("long").alias("w"))
    rows = priority_sample(df, "id", "w", 50).collect()
    assert len(rows) == 5
    # tau = 0 → est = w exactly (the sample is the population)
    assert all(r["est"] == 3.0 for r in rows)


def test_priority_sample_plan_has_no_global_sort_or_window(spark):
    from yodel_etl_spark.scale.sampling import priority_sample

    out = priority_sample(_ps_corpus(spark), "id", "w", 50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    out.unpersist()


def test_priority_sample_rejects_bad_k(spark):
    from yodel_etl_spark.scale.sampling import priority_sample

    with pytest.raises(ValueError):
        priority_sample(_ps_corpus(spark), "id", "w", 0)


def test_priority_sample_per_key_equals_single_window_form(spark):
    """The salted two-phase plan must be EXACTLY the naive single-window
    sample — same rows, same ranks — while never funneling a hot key
    through one reducer."""
    from pyspark.sql import Window

    from yodel_etl_spark.scale.sampling import priority_sample_per_key

    df = spark.range(600).select(
        (F.col("id") % 3).alias("dom"), F.col("id"), (F.col("id") % 7 + 1).alias("w")
    )
    got = {
        (r["key"], r["id"], r["rk"])
        for r in priority_sample_per_key(df, "dom", "id", "w", 25).collect()
    }
    # naive twin: same priority expression, one window
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("ps1"), F.col("id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    q = (F.col("w").cast("double") * F.lit(4294967296.0)) / ((h + F.lit(1)).cast("double"))
    naive = (
        df.select(F.col("dom").alias("key"), "id", q.alias("q"))
        .withColumn("rk", F.row_number().over(Window.partitionBy("key").orderBy(F.desc("q"), "id")))
        .where(F.col("rk") <= 25)
    )
    want = {(r["key"], r["id"], r["rk"]) for r in naive.collect()}
    assert got == want and len(got) == 75


def test_priority_sample_per_key_weight_bias_and_exhaustive(spark):
    from yodel_etl_spark.scale.sampling import priority_sample_per_key

    df = spark.range(400).select(
        (F.col("id") % 2).alias("dom"), F.col("id"), (F.col("id") % 8 + 1).alias("w")
    )
    rows = priority_sample_per_key(df, "dom", "id", "w", 30).collect()
    mean_w = sum(r["w"] for r in rows) / len(rows)
    assert mean_w > 4.5  # corpus mean of weights 1..8
    # a key smaller than k returns all its rows
    tiny = spark.range(5).select(F.lit(9).alias("dom"), F.col("id"), F.lit(2).alias("w"))
    assert priority_sample_per_key(tiny, "dom", "id", "w", 50).count() == 5
