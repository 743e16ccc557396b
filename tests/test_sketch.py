"""Misra-Gries heavy-hitters sketch (scale/sketch.py): exact
degradation when capacity suffices, and the classic > n/capacity
guarantee + bound containment when decrements fire."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from yodel_etl_spark.scale.sketch import approx_top_k
from yodel_etl_spark.session import load_tables


def test_exact_degradation_matches_groupby(spark, sf_small):
    """capacity ≥ distinct keys → no decrements → sketch == exact."""
    ev = load_tables(spark, sf_small, ("events",))["events"]
    got = approx_top_k(ev, "user_id", k=10, capacity=1024).collect()
    exact = {
        str(r["user_id"]): r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["item"], r["count_lo"]) for r in got] == top_exact
    assert all(r["count_lo"] == r["count_hi"] for r in got)  # zero error


def test_mergeability_across_disjoint_chunks(spark, sf_small):
    """Partials from disjoint data chunks merge to the same summary as
    one pass over the whole — the property that makes the sketch serve
    per-day → per-month rollups and streaming accumulation."""
    from yodel_etl_spark.scale.sketch import merge_partials, mg_partials
    from yodel_etl_spark.session import ship_package

    ship_package(spark)
    ev = load_tables(spark, sf_small, ("events",))["events"]
    whole = approx_top_k(ev, "user_id", k=10, capacity=1024).collect()
    chunks = [ev.where(F.col("event_id") % 3 == i) for i in range(3)]
    parts = mg_partials(chunks[0], "user_id", 1024)
    for c in chunks[1:]:
        parts = parts.unionByName(mg_partials(c, "user_id", 1024))
    merged = merge_partials(parts, k=10).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in whole]


def test_streaming_foreachbatch_accumulation(spark, sf_small, tmp_path):
    """MG partials accumulated per micro-batch (foreachBatch append)
    merge to the whole-data summary once the stream drains — the
    streaming path promised by the module docstring."""
    from yodel_etl_spark.scale.sketch import merge_partials, mg_partials
    from yodel_etl_spark.session import ship_package

    ship_package(spark)
    ev = load_tables(spark, sf_small, ("events",))["events"]
    whole = approx_top_k(ev, "user_id", k=10, capacity=1024).collect()

    src = str(tmp_path / "hh_src")
    sink = str(tmp_path / "hh_partials")
    # three files → up to three micro-batches
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)

    def land_partials(batch_df, batch_id):
        mg_partials(batch_df, "user_id", 1024).write.mode("append").parquet(sink)

    q = stream.writeStream.foreachBatch(land_partials).option(
        "checkpointLocation", str(tmp_path / "hh_ckpt")
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    merged = merge_partials(spark.read.parquet(sink), k=10).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in whole]


def test_guarantee_under_decrement_pressure(spark):
    """Skewed stream through a tiny sketch: every item with true count
    > n/capacity must surface, with count_lo ≤ true ≤ count_hi."""
    rows = (
        [Row(k="hot") for _ in range(400)]
        + [Row(k="warm") for _ in range(150)]
        + [Row(k=f"cold{i}") for i in range(300)]
    )
    df = spark.createDataFrame(rows).repartition(4)
    n, capacity = len(rows), 8
    got = {r["item"]: (r["count_lo"], r["count_hi"]) for r in approx_top_k(df, "k", k=8, capacity=capacity).collect()}
    true = {"hot": 400, "warm": 150}
    for item, t in true.items():
        if t > n / capacity:
            assert item in got, f"{item} (count {t}) must survive"
        lo, hi = got[item]
        assert lo <= t <= hi


def test_null_keys_excluded(spark):
    """NULL keys never enter the sketch: NULL is the decrement-marker
    row, and astype(str) would alias them with genuine 'None' strings."""
    df = spark.createDataFrame(
        [Row(k="a"), Row(k=None), Row(k="None"), Row(k=None), Row(k="a")]
    )
    got = approx_top_k(df, "k", k=10, capacity=16).collect()
    assert {r["item"]: r["count_lo"] for r in got} == {"a": 2, "None": 1}


def test_hll_rollup_accuracy_and_mergeability(spark, sf_small):
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.sketch import hll_distinct_rollup
    from yodel_etl_spark.session import load_tables

    ev = load_tables(spark, sf_small, ("events",))["events"].withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    est = {
        r["event_type"]: (r["approx_distinct"], r["n_partials"])
        for r in hll_distinct_rollup(ev, ["event_type"], "user_id", "day").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, (e, n_parts) in est.items():
        # lg_k=12 -> ~1.6% relative standard error; assert 5%
        assert abs(e - exact[t]) <= max(2, 0.05 * exact[t]), (t, e, exact[t])
        assert n_parts > 1  # genuinely rolled up from multiple day partials


def test_cms_never_undercounts_and_exact_when_wide(spark, sf_small):
    """CMS guarantees: est >= true for every key, and a sketch wide
    enough to avoid collisions is exact."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.sketch import cms_build, cms_query
    from yodel_etl_spark.session import load_tables

    ev = load_tables(spark, sf_small, ("events",))["events"]
    truth = {r["user_id"]: r["n"] for r in ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = ev.select("user_id").distinct()
    # narrow sketch: upper bounds only
    sk = cms_build(ev, "user_id", depth=4, width=64)
    est = {r["user_id"]: r["est"] for r in cms_query(sk, keys, "user_id", 4, 64).collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)
    # wide sketch: collision-free at this cardinality -> exact
    skw = cms_build(ev, "user_id", depth=6, width=1 << 16)
    estw = {r["user_id"]: r["est"] for r in cms_query(skw, keys, "user_id", 6, 1 << 16).collect()}
    assert estw == truth


def test_cms_merge_equals_sketch_of_union(spark, sf_small):
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.sketch import cms_build, cms_merge
    from yodel_etl_spark.session import load_tables

    ev = load_tables(spark, sf_small, ("events",))["events"]
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = {(r["d"], r["bucket"]): r["cnt"]
              for r in cms_merge(cms_build(a, "user_id"), cms_build(b, "user_id")).collect()}
    whole = {(r["d"], r["bucket"]): r["cnt"] for r in cms_build(ev, "user_id").collect()}
    assert merged == whole


def test_cms_unknown_key_estimates_bounded(spark, sf_small):
    """A key absent from the data gets est = 0 when its cells are
    empty, and never a negative value."""
    from yodel_etl_spark.scale.sketch import cms_build, cms_query
    from yodel_etl_spark.session import load_tables

    ev = load_tables(spark, sf_small, ("events",))["events"]
    sk = cms_build(ev, "user_id", depth=4, width=1 << 16)
    ghost = spark.createDataFrame([(987654321,)], "user_id long")
    est = cms_query(sk, ghost, "user_id", 4, 1 << 16).collect()[0]["est"]
    assert est == 0
