"""Training-pipeline sampling/statistics queries: deterministic hash
split (portable md5 bucketing, oracle-checked against DuckDB's md5) and
exact per-group percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.sampling import hash_split
from yodel_etl_spark.session import load_tables


@register(
    "split_docs",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
             text
      FROM (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS b,
               text
        FROM documents
      )
    )
    SELECT split, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM s GROUP BY split
    """,
    doc="Deterministic 80/10/10 train/val/test split via md5 hash "
    "bucketing: membership is a pure function of doc_id — stable under "
    "appends/re-runs (randomSplit is not), shuffle-free, and portable "
    "across engines (md5 is bit-identical in Spark and DuckDB, so the "
    "oracle checks the actual split assignment, not just counts).",
    tags=("sampling", "scale"),
    bench=True,
)
def split_documents_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
        )
    )


# (events_value_percentiles merged into ev_types (nee events_type_profile) in
# queries/windows.py — same groupBy key, one shuffle instead of two
# registry slots)


@register(
    "hh",
    oracle=None,  # approximate sketch — exactness asserted in pytest
    # (tests/test_sketch.py: exact-degradation parity vs groupBy +
    # the >n/capacity guarantee under forced decrements); registered
    # without an oracle so it sits in the rows-only tail and never
    # displaces an oracle-backed query from the driver's window
    doc="Mergeable Misra-Gries heavy-hitters: per-partition bounded "
    "sketches (mapInPandas, O(capacity) state) merged by a tiny "
    "groupBy — top user_ids by event count with deterministic "
    "count_lo/count_hi bounds.  The 100 TB answer to top-k over "
    "billion-key columns where exact groupBy state is the bottleneck.",
    tags=("sketch", "agg", "scale"),
)
def hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sketch import approx_top_k

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return approx_top_k(ev, "user_id", k=20, capacity=1024)


@register(
    "strat",
    oracle="""
    WITH s AS (
      SELECT lang, text,
             CAST(('0x' || substr(md5(lang || '|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS b
      FROM documents
    )
    SELECT lang, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM s
    WHERE b < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50 WHEN 'fr' THEN 25
                        WHEN 'es' THEN 10 ELSE 0 END
    GROUP BY lang
    """,
    doc="Deterministic stratified downsampling: rebalance the corpus "
    "language mix (en 100% / de 50% / fr 25% / es 10% / zh 0%) via "
    "per-stratum md5-hash thresholds.  Stratum is mixed INTO the hash "
    "key so per-stratum decisions are independent; membership is a "
    "pure row function — no shuffle, no RNG state, append-stable, and "
    "the oracle checks the actual sampled membership, not just rates.",
    tags=("sampling", "scale"),
    bench=True,
    tier=1,
)
def sample_stratified_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sampling import stratified_hash_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sampled = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 100, "de": 50, "fr": 25, "es": 10, "zh": 0}
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
    )


@register(
    "packs",
    oracle=None,  # greedy group-local bin packing is sequential, not
    # SQL-expressible; invariants (fill ≤ budget, exactly-once
    # assignment, determinism, FFD quality bound) pinned in
    # tests/test_packing.py
    doc="Sequence packing for pretraining batches: first-fit-decreasing "
    "inside md5-hash groups (one Arrow batch per group over narrow "
    "(id, n_tokens) rows), global bin id = group<<32 | local.  Waste vs "
    "a global packer bounded by one tail bin per group.  Returns "
    "per-bin fill stats.",
    tags=("sampling", "scale"),
)
def packs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.packing import pack_sequences
    from yodel_etl_spark.scale.textstats import tokens

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    with_counts = docs.select(
        "doc_id", tokens(F.col("text")).alias("tk")
    ).select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
    packed = pack_sequences(with_counts, "doc_id", "n_tokens", budget=512, num_groups=16)
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("bin_fill").alias("bin_fill"),
        F.max(F.col("over_budget").cast("int")).cast("boolean").alias("over_budget"),
    )


@register(
    "hll",
    oracle=None,  # DataSketches HLL has no DuckDB twin — accuracy vs
    # exact distinct asserted in tests/test_sketch.py; rows-only tail
    # so it never displaces an oracle-backed query from the window
    doc="Mergeable approximate-distinct rollup: per-(event_type, day) "
    "HLL sketches (hll_sketch_agg) unioned to per-type distinct-user "
    "estimates (hll_union_agg).  Unlike approx_count_distinct's "
    "per-group scalars, the fine sketches COMBINE losslessly — daily "
    "partials answer weekly/monthly/all-time questions without "
    "rescanning raw events, and map-side partials merge the same way, "
    "so the shuffle carries one small binary per partition per group.",
    tags=("sketch", "agg", "scale"),
    bench=True,
)
def hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sketch import hll_distinct_rollup

    ev = load_tables(spark, sf_dir, ("events",))["events"].withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return hll_distinct_rollup(ev, ["event_type"], "user_id", "day")


@register(
    "sample_domain_mix",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN source IN ('src0','src1','src2','src3') THEN source
                  ELSE 'rest' END AS domain
      FROM documents
    ), c AS (
      SELECT domain, count(*) AS n_s FROM d GROUP BY domain
    ), w AS (
      SELECT domain, n_s,
             CAST(floor(sqrt(CAST(n_s AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_s
      FROM c
    ), t AS (
      SELECT sum(n_s) AS n_tot, sum(w_s) AS w_tot FROM w
    ), r AS (
      SELECT domain,
             least(10000, CAST(floor(5000.0 * CAST(n_tot AS DOUBLE) * CAST(w_s AS DOUBLE)
                   / (CAST(w_tot AS DOUBLE) * CAST(n_s AS DOUBLE))) AS BIGINT)) AS rate_bp
      FROM w, t
    )
    SELECT d.doc_id, d.domain, r.rate_bp
    FROM d JOIN r USING (domain)
    WHERE CAST(('0x' || substr(md5(d.domain || '|' || CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
          * 10000 < r.rate_bp * 65536
    """,
    doc="Temperature-based domain mixing (α = 0.5 sampling of "
    "multilingual BERT / mT5) on a deliberately skewed derived domain "
    "(4 named sources vs a 16×-larger 'rest' pool): per-domain "
    "keep-rates ∝ √n_s/n_s under a 50% token budget, so the rare "
    "domains survive whole (rate caps at 1) while the dominant pool "
    "downsamples ~3×.  Membership cross-multiplies the raw 16-bit md5 "
    "prefix against the basis-point lattice (no modulo bias) as a pure "
    "function of "
    "(domain, key) — append-stable, shuffle-free on the data path "
    "(domain stats are a broadcast 5-row aggregate) — and the oracle "
    "checks the actual sampled membership row for row.  Tier 2: "
    "yields its driver-window slot; parity via pytest oracle suite + "
    "driver-sim.",
    tags=("sampling", "scale"),
    bench=True,
    tier=2,
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sampling import domain_mix_resample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    domain = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3"), F.col("source")
    ).otherwise(F.lit("rest"))
    d = docs.select("doc_id", domain.alias("domain"))
    return domain_mix_resample(d, "doc_id", "domain", budget_pct=50).select(
        "doc_id", "domain", "rate_bp"
    )


@register(
    "cms",
    oracle=None,  # xxhash64 cell coordinates have no DuckDB twin —
    # never-undercount / exact-when-wide / merge==whole guarantees
    # pinned in tests/test_sketch.py; rows-only registry tail
    doc="Count-Min sketch point-frequency estimates: the key column "
    "explodes into depth×(xxhash64 mod width) coordinates and the "
    "build is one map-side-combined count over at most depth·width "
    "cells — bounded shuffle state for ANY key cardinality, mergeable "
    "cell-wise across batches/days (unlike a groupBy count, partial "
    "sketches combine losslessly).  Query side re-derives coordinates "
    "and takes the per-key min over a broadcast counter table.",
    tags=("sketch", "agg", "scale"),
    bench=True,
    tier=2,
)
def cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sketch import cms_build, cms_query

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sketch = cms_build(ev, "user_id", depth=4, width=4096)
    probe = ev.select("user_id").distinct().where(F.col("user_id") < 20)
    return cms_query(sketch, probe, "user_id", depth=4, width=4096)


@register(
    "sample_reservoir",
    oracle="""
    SELECT source AS key, doc_id AS id, rk
    FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(concat('r5', '|', CAST(doc_id AS VARCHAR))), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= 3
    """,
    doc="Fixed-size per-key uniform sample: exactly min(3, n) documents "
    "per source, drawn by md5(seed|id) rank — the deterministic, "
    "append-auditable counterpart of reservoir sampling (md5 ranks are "
    "a pure random permutation of ids, so the k smallest are an "
    "exchangeable uniform draw; re-runs reproduce the sample "
    "bit-for-bit, changing the seed redraws it).  Skew posture: two "
    "phases — rank within (key, salt) first so a hot key spreads over "
    "16 partitions and the final per-key window sees at most 16·k "
    "candidate rows per key, never the key's full volume.  The oracle "
    "is the single-window form — exact-equal by the top-k-of-top-k "
    "argument.  Tier 1: new this round, yields its driver-window "
    "slot; parity via the pytest oracle gate.",
    tags=("sampling", "scale"),
    tier=1,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sampling import reservoir_per_key

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return reservoir_per_key(docs, "source", "doc_id", k=3, seed="r5")


_DSIR_B = 256
_DSIR_BUCKET = (
    "CAST(('0x' || substr(md5({x}), 1, 4)) AS INTEGER) % " + str(_DSIR_B)
)
_DSIR_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


@register(
    "sample_dsir",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             {_DSIR_BUCKET.format(x="CAST(doc_id AS VARCHAR)").replace("% 256", "% 100")} >= 95 AS is_tgt,
             {_DSIR_TOKS} AS tk
      FROM documents
    ), grams AS (
      SELECT is_tgt, {_DSIR_BUCKET.format(x="g")} AS bucket
      FROM base, unnest(tk) AS u(g)
    ), counts AS (
      SELECT bucket,
             sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS cnt_p,
             sum(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS cnt_q
      FROM grams GROUP BY bucket
    ), fb AS (
      SELECT CAST(r.range AS INTEGER) AS bucket,
             coalesce(cnt_p, 0) AS cnt_p, coalesce(cnt_q, 0) AS cnt_q
      FROM range({_DSIR_B}) r LEFT JOIN counts ON r.range = counts.bucket
    ), tot AS (
      SELECT sum(cnt_p) AS np, sum(cnt_q) AS nq FROM fb
    ), w AS (
      SELECT bucket,
             CAST(round(1000000.0 *
               (ln((CAST(cnt_p AS DOUBLE) + 1.0) / (CAST(np AS DOUBLE) + {_DSIR_B}.0))
              - ln((CAST(cnt_q AS DOUBLE) + 1.0) / (CAST(nq AS DOUBLE) + {_DSIR_B}.0)))
             ) AS BIGINT) AS wi
      FROM fb, tot
    ), docg AS (
      SELECT doc_id, {_DSIR_BUCKET.format(x="g")} AS bucket
      FROM base, unnest(tk) AS u(g) WHERE NOT is_tgt
    ), sc AS (
      SELECT b.doc_id, CAST(coalesce(sum(w.wi), 0) AS BIGINT) AS score_micro
      FROM base b LEFT JOIN docg ON b.doc_id = docg.doc_id
                  LEFT JOIN w ON docg.bucket = w.bucket
      WHERE NOT b.is_tgt
      GROUP BY b.doc_id
    )
    SELECT doc_id, score_micro FROM sc
    ORDER BY score_micro DESC, doc_id
    LIMIT 50
    """,
    doc="DSIR-style data selection (Xie et al. 2023, deterministic "
    "top-k variant): score every raw-pool document by the add-one-"
    "smoothed log-likelihood ratio of its hashed-unigram bag under the "
    "target slice (md5 bucket ≥ 95 — the engine's append-stable split) "
    "vs the raw pool, and keep the top 50.  Per-bucket weights are "
    "integer micro-nats (the lm.py convention), so the per-doc sum is "
    "order-insensitive exact arithmetic; the only corpus-sized shuffle "
    "is the 256-row gram count, the weight table folds to ONE "
    "broadcast array row, and scoring is a narrow aggregate over the "
    "token array — no explode, no per-gram join, TakeOrdered top-k.  "
    "Tier 1: new this round, yields its driver-window slot; parity via "
    "the pytest oracle gate.",
    tags=("sampling", "scale", "dsir"),
    bench=True,
    tier=1,
)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.dsir import dsir_select

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dsir_select(docs, "doc_id", "text", target_pct=5, n_buckets=_DSIR_B, top_n=50)


@register(
    "wsamp",
    oracle="""
    WITH scored AS (
      SELECT doc_id AS id, n_chars AS w,
             (CAST(n_chars AS DOUBLE) * 4294967296.0)
               / (CAST(('0x' || substr(md5('ps1|' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) + 1) AS q
      FROM documents
    ), topk1 AS (
      SELECT * FROM scored ORDER BY q DESC, id LIMIT 65
    ), tau AS (
      SELECT CASE WHEN count(*) = 65 THEN min(q) ELSE 0.0 END AS tau FROM topk1
    )
    SELECT id, w, q, greatest(CAST(w AS DOUBLE), tau.tau) AS est
    FROM (SELECT * FROM topk1 ORDER BY q DESC, id LIMIT 64) s, tau
    """,
    doc="Weight-sensitive sampling WITHOUT replacement: priority "
    "sampling (Duffield-Lund-Thorup JACM 2007) of 64 documents with "
    "weight = n_chars — every row draws u from the md5 lattice, "
    "priority q = w/u, top-k wins; est = max(w, tau) is the DLT "
    "unbiased subset-sum estimator (tau = (k+1)-th priority), so the "
    "sample supports corpus accounting.  The oracle checks MEMBERSHIP "
    "row for row, not just counts: u = (h+1)/2^32 keeps q to md5 + "
    "integer ops + ONE correctly-rounded IEEE division, bit-identical "
    "across engines (no ln/pow — the reason this is DLT priorities "
    "rather than Efraimidis-Spirakis keys).  Scale: top-(k+1) is "
    "TakeOrderedAndProject (per-partition heaps, no global sort/"
    "window); tau folds to a one-row broadcast.  Tier 2: yields its "
    "driver-window slot; parity via pytest oracle suite.",
    tags=("sampling", "scale"),
    bench=True,
    tier=2,
)
def wsamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sampling import priority_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return priority_sample(docs, "doc_id", "n_chars", k=64, seed="ps1")
