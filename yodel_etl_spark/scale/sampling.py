"""Deterministic dataset splitting for training pipelines.

``randomSplit``/``sampleBy`` draw per-row randoms — resampling a grown
corpus reshuffles membership, leaking eval docs into train.  The
standard fix at corpus scale is HASH bucketing: a row's split is a pure
function of its key, so membership is stable under re-runs, appends,
and engine changes, and needs no shuffle at all (narrow projection).

md5 (not xxhash64) on purpose: md5 is bit-identical across engines
(Spark, DuckDB, Python), so splits are portable and oracle-checkable;
the 16-bit prefix gives 65536 lattice points — granular enough for
percent-level fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in ``[0, buckets)``: first 4 hex chars of
    ``md5(key)`` mod buckets.  DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4)) AS INTEGER) % buckets``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
        % buckets
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``hash_bucket(stratum || '|' || key) < rates[stratum]`` (percent).

    The hash mixes the stratum INTO the key, so the same key sampled
    under two strata (or the same rate) makes independent decisions —
    plain ``hash(key) < p`` would select the identical key subset in
    every stratum, correlating samples across strata.

    Same posture as :func:`hash_split`: pure narrow projection + filter
    (no shuffle, no RNG state), append-stable, identical under re-runs
    and engine changes — this is how a 100 TB corpus rebalances source
    mix without resampling churn.  Strata absent from ``rates`` keep
    ``default_pct`` percent.
    """
    for stratum, pct in rates.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {stratum!r} must be 0..100, got {pct}")
    b = hash_bucket(
        F.concat_ws("|", F.col(strata_col).cast("string"), F.col(key_col).cast("string")),
        100,
    )
    pct_expr: Column = F.lit(default_pct)
    for stratum, pct in sorted(rates.items()):
        pct_expr = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(pct_expr)
    return df.where(b < pct_expr)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Label each row train/val/… by deterministic hash bucket.

    ``fractions`` maps label -> percent (must total 100); default
    80/10/10 train/val/test.  Narrow (no shuffle), append-stable, and
    reproducible everywhere md5 exists."""
    fractions = fractions or {"train": 80, "val": 10, "test": 10}
    if sum(fractions.values()) != 100:
        raise ValueError(f"fractions must total 100, got {fractions}")
    b = hash_bucket(F.col(key_col), 100)
    expr: Column | None = None
    hi = 0
    for label, pct in fractions.items():
        hi += pct
        expr = F.when(b < hi, F.lit(label)) if expr is None else expr.when(b < hi, F.lit(label))
    return df.withColumn(split_col, expr)


def domain_mix_resample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    budget_pct: int = 50,
) -> DataFrame:
    """Temperature-based domain rebalancing (the α-sampling of
    multilingual BERT / mT5, α = 0.5): per-domain keep-rates
    ∝ n_s^α / n_s, so over-represented domains downsample hard while
    rare domains survive (rate capped at 1) — the standard pretraining
    data-mixing stage, made deterministic.

    rate_s = min(1, β·N·√n_s / (Σ_t √n_t · n_s)) with β = budget_pct %,
    applied as ``hash_bucket(domain|key, 10000) < rate_bp`` — the same
    append-stable md5 lattice as :func:`stratified_hash_sample`, so
    membership is a pure function of the key and re-runs/appends never
    reshuffle the sample.

    Cross-engine exactness: weights are ``floor(√n_s · 10^6)`` — IEEE
    sqrt is correctly rounded, so the floored integer weights (and
    their integer sum) are bit-identical in Spark and DuckDB; the only
    float division happens once per DOMAIN (not per row) and lands on
    a 10^4 lattice.  The membership test cross-multiplies the raw
    16-bit md5 prefix against that lattice (``h16·10^4 < rate_bp·2^16``,
    all integers) — ``hash_bucket(·, 10000)`` would fold 65536 lattice
    points onto 10000 buckets and systematically over-keep by up to
    ~7% relative (buckets 0..5535 receive 7 preimages, the rest 6).
    Rows with a NULL domain form their own stratum (internal sentinel
    key) rather than silently dropping out of the equi-join.  Scale
    shape: the domain stats are a tiny aggregate (one row per domain)
    broadcast back; the data path is a narrow filter — no data-sized
    shuffle anywhere.  Domains with α ≠ 0.5 would need pow(), which
    IEEE does not promise correctly rounded — keep α = ½ for
    oracle-portable plans.
    """
    if not 0 <= budget_pct <= 100:
        raise ValueError(f"budget_pct must be 0..100, got {budget_pct}")
    d = df.withColumn(
        "_dom", F.coalesce(F.col(domain_col).cast("string"), F.lit("\x00NULL\x00"))
    )
    counts = d.groupBy("_dom").agg(F.count(F.lit(1)).alias("n_s"))
    w = counts.withColumn(
        "w_s",
        F.floor(F.sqrt(F.col("n_s").cast("double")) * F.lit(1000000.0)).cast("long"),
    )
    tot = w.agg(
        F.sum("n_s").alias("n_tot"),
        F.sum("w_s").alias("w_tot"),
    )
    rates = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "rate_bp",
            F.least(
                F.lit(10000).cast("long"),
                F.floor(
                    F.lit(float(budget_pct * 100))
                    * F.col("n_tot").cast("double")
                    * F.col("w_s").cast("double")
                    / (F.col("w_tot").cast("double") * F.col("n_s").cast("double"))
                ).cast("long"),
            ),
        )
        .select("_dom", "rate_bp")
    )
    h16 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("_dom"), F.col(key_col).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("int")
    return (
        d.join(F.broadcast(rates), "_dom")
        .where(h16 * 10000 < F.col("rate_bp") * 65536)
        .drop("_dom")
    )


def reservoir_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    seed: str = "r5",
    salts: int = 16,
) -> DataFrame:
    """Exactly ``min(k, n_key)`` rows per key, drawn uniformly and
    DETERMINISTICALLY — the fixed-size counterpart of the rate-based
    :func:`stratified_hash_sample` (classic reservoir sampling's
    guarantee, without its sequential state: rank every row by
    ``md5(seed|id)`` and keep each key's k smallest, which is an
    exchangeable uniform draw because md5 ranks are a pure random
    permutation of the ids).  Re-runs reproduce the sample bit-for-bit;
    changing ``seed`` redraws it.

    Skew posture (the reason this isn't one window): a single
    ``row_number() OVER (PARTITION BY key)`` sends every row of a hot
    key through one reducer.  Phase 1 ranks within ``(key, salt)``
    (salt = md5-derived, so a hot key spreads over ``salts``
    partitions) and keeps k per salt-group; any global-top-k row is
    necessarily in its salt-group's top-k, so phase 2's window on key
    sees at most ``salts * k`` candidate rows per key — bounded no
    matter how hot the key.  Output: key, id, ``rk`` (1-based uniform
    rank within the key's sample).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    rnd = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    salt = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 29, 4), 16, 10).cast(
            "int"
        )
        % salts
    )
    ranked = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        rnd.alias("_rnd"),
        salt.alias("_salt"),
    )
    part = F.row_number().over(
        Window.partitionBy("key", "_salt").orderBy("_rnd", "id")
    )
    cand = ranked.withColumn("_prk", part).where(F.col("_prk") <= k)
    final = F.row_number().over(Window.partitionBy("key").orderBy("_rnd", "id"))
    return (
        cand.withColumn("rk", final)
        .where(F.col("rk") <= k)
        .select("key", "id", "rk")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: dict[str, int] | None = None,
    split_col: str = "split",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Train/val/test split that cannot leak through near-duplicates.

    ``hash_split`` keyed on the DOCUMENT id has a silent contamination
    hole: two near-identical documents hash independently, so one lands
    in train and its twin in test — the eval set then scores memorized
    text.  The fix is to split at GROUP grain: take the near-dup pair
    graph (MinHash/SimHash/embedding-LSH output — any (doc_a, doc_b)
    edge list), contract it to connected components, and key the hash
    split on the COMPONENT id, so an entire duplicate cluster moves as
    one unit.  Singletons (docs in no pair) keep their own id as the
    component — for them this degrades to the plain id-keyed split.

    Returns ``df`` + ``component`` + ``split_col``.  Same determinism
    contract as :func:`hash_split` (md5 lattice, append-stable as long
    as appends don't bridge existing components — a bridge MERGES two
    clusters and the merged cluster legitimately re-lands as one unit).

    Scale posture: components scale with the duplicate-pair graph, not
    the corpus (see ``scale.cluster``); the split itself stays a narrow
    projection.  Invariant — no edge straddles splits — is pinned in
    tests/test_sampling.py.
    """
    from yodel_etl_spark.scale.cluster import attach_components, connected_components

    comp = connected_components(pairs, src=src, dst=dst)
    grouped = attach_components(df, comp, id_col)
    return hash_split(grouped, "component", fractions, split_col)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "ps1",
) -> DataFrame:
    """Deterministic weight-sensitive sample of ``k`` rows WITHOUT
    replacement — priority sampling (Duffield, Lund & Thorup, JACM
    2007): every row draws a uniform ``u`` from the md5 lattice, gets
    priority ``q = w/u``, and the k highest-priority rows are the
    sample.  Heavier rows win proportionally more often, re-runs
    reproduce the sample bit-for-bit, and changing ``seed`` redraws it
    (the :func:`reservoir_per_key` contract, weight-aware).

    The returned ``est`` column is the DLT unbiased subset-sum
    estimator: ``max(w, τ)`` with τ the (k+1)-th priority — summing
    ``est`` over the sample estimates the total weight of ANY predicate
    evaluated on it (within-sample covariances are zero), which is what
    makes a small weighted sample usable for corpus accounting.

    Cross-engine determinism without transcendentals: ``u = (h+1)/2³²``
    from a 32-bit md5 prefix, so ``q = w·2³²/(h+1)`` is integer
    arithmetic followed by ONE correctly-rounded IEEE division — md5,
    ``*``, ``/`` are bit-identical in Spark and DuckDB (the reason this
    uses priorities rather than Efraimidis–Spirakis ``u^(1/w)`` keys,
    whose ``ln``/``pow`` differ by ULPs across libm implementations).
    Ties break on ``id``.

    Scale shape: the top-(k+1) is ``TakeOrderedAndProject`` — per-
    partition heaps, no global sort, no corpus-sized window; τ folds to
    a one-row broadcast.  The k+1 candidate rows are persisted (they
    feed both τ and the sample; bounded by k).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from yodel_etl_spark.session import register_persisted

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    q = (F.col(weight_col).cast("double") * F.lit(4294967296.0)) / (
        (h + F.lit(1)).cast("double")
    )
    scored = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).alias("w"),
        q.alias("q"),
    )
    topk1 = scored.orderBy(F.desc("q"), F.col("id")).limit(k + 1).persist()
    # τ = (k+1)-th priority; 0 when the table has ≤ k rows (then the
    # sample is exhaustive and est = w exactly — the DLT convention)
    tau_row = topk1.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("q"))
        .otherwise(F.lit(0.0))
        .alias("tau")
    )
    sample = topk1.orderBy(F.desc("q"), F.col("id")).limit(k)
    out = sample.crossJoin(F.broadcast(tau_row)).select(
        "id",
        "w",
        "q",
        F.greatest(F.col("w").cast("double"), F.col("tau")).alias("est"),
    )
    return register_persisted(out, topk1)


def priority_sample_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "ps1",
    salts: int = 16,
) -> DataFrame:
    """Per-key weighted sample: ``min(k, n_key)`` rows per key by DLT
    priority (see :func:`priority_sample`) — the per-stratum form a
    domain-mixed corpus uses ("keep the k most weight-favoured docs per
    domain, heavier docs proportionally likelier").

    Same skew posture as :func:`reservoir_per_key`: phase 1 ranks
    within ``(key, salt)`` and keeps k per salt-group (any global
    top-k row is necessarily in its salt-group's top-k), so phase 2's
    window on the key sees at most ``salts·k`` candidates however hot
    the key.  Output: ``(key, id, w, q, rk)``; determinism and the
    two-phase ≡ single-window identity are pinned in tests.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    q = (F.col(weight_col).cast("double") * F.lit(4294967296.0)) / (
        (h + F.lit(1)).cast("double")
    )
    salt = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 29, 4), 16, 10).cast(
            "int"
        )
        % salts
    )
    scored = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(weight_col).alias("w"),
        q.alias("q"),
        salt.alias("_salt"),
    )
    part = F.row_number().over(
        Window.partitionBy("key", "_salt").orderBy(F.desc("q"), "id")
    )
    cand = scored.withColumn("_prk", part).where(F.col("_prk") <= k)
    final = F.row_number().over(Window.partitionBy("key").orderBy(F.desc("q"), "id"))
    return (
        cand.withColumn("rk", final)
        .where(F.col("rk") <= k)
        .select("key", "id", "w", "q", "rk")
    )
