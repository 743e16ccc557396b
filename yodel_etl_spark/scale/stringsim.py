"""Edit-distance similarity join (Ed-Join style) — the entity-resolution
primitive: all pairs of values within Levenshtein distance ``k``,
without the O(n²) cross join.

Scale posture (the quadratic term is the enemy, same family as
``scale.dedup.jaccard_pairs``):

  * work at VALUE grain — ``groupBy(col)`` first, so a billion rows with
    a million distinct names do a million-value join, and the result
    (name_a, name_b, dist, cnt_a, cnt_b) is the ER cluster-edge list a
    pipeline actually consumes.  One linear shuffle.
  * candidate generation by PREFIX-FILTERED q-gram inverted index
    (Ed-Join, Xiao et al., VLDB'08): if ``ed(s,t) ≤ k`` then each edit
    changes at most ``q`` of a string's padded q-grams, so the gram SETS
    differ by at most ``q·k`` elements each way — order all grams by a
    global total order (ascending document frequency, ties by gram, the
    PPJoin order that keeps hot grams out of prefixes) and the first
    ``q·k + 1`` grams of the two strings MUST intersect.  Proof sketch of
    the prefix bound: if the (qk+1)-prefixes were disjoint, whichever
    side's prefix sorts later would have qk+1 grams absent from the
    other side's set, contradicting the ≤ qk difference.  Only the
    prefixes are posted; the join shuffles 8-byte ``xxhash64`` keys, not
    gram strings (a hash collision can only ADD a candidate — the exact
    verify removes it).
  * length filter inside the join: ``ed(s,t) ≥ |len(s) − len(t)|``, so
    pairs with length gap > k are pruned before the distinct.
  * exact verify with the JVM ``levenshtein`` expression — candidates
    only, no Python in the path anywhere.

Padding: grams are taken over ``chr(0)·(q−1) + s + chr(0)·(q−1)`` so
every string (including the empty string) has at least one gram and
short-string pairs share padded boundary grams.  A NUL appearing in
real data cannot cause a false negative (padding only changes WHICH
grams exist; the ≤ q·k difference bound is per-edit and holds for any
fixed padding).

Short-string route: the prefix argument needs the count-filter premise
``|G(s)| ≥ q·k+1`` — a string with fewer grams can have its ENTIRE gram
set destroyed by k edits (ed("", "a") = 1 but the padded gram sets are
disjoint).  Values with ``len ≤ q·(k−1)+1`` therefore bypass the gram
index: the set of such values is bounded by ``charset^(q(k−1)+1)``
(tiny at value grain), so they broadcast and pair directly against the
length band that can reach them.

Exactness: every pruning step above discards only provably-out-of-range
pairs, so the result equals the brute-force
``a.name < b.name AND levenshtein(a,b) ≤ k`` oracle — pinned in
``tests/test_stringsim.py`` against DuckDB's ``levenshtein`` on the
sf0.01 ``part`` table and against a seeded random-mutation brute force
(short strings, empty strings, unicode included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yodel_etl_spark.session import register_persisted


def _grams_of_padded(padded, q: int):
    """Distinct q-grams of an ALREADY-PADDED string column — pure
    codegen (sequence → transform → substr), no UDF.  Takes the
    materialized column (not the concat expression) so the transform
    lambda re-reads an attribute per element, not a kernel
    (expression-hygiene rule: HOF lambdas inline their argument
    expression per element)."""
    # padded length = len + 2(q-1) → gram count = len + q - 1 ≥ q - 1 ≥ 1
    n_grams = F.length(padded) - (q - 1)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: padded.substr(i, F.lit(q)),
        )
    )


def edit_pairs(
    df: DataFrame,
    col: str,
    k: int = 1,
    q: int = 2,
) -> DataFrame:
    """All pairs of distinct values of ``col`` within Levenshtein
    distance ``k``, with per-value row counts.

    Returns ``(name_a, name_b, dist, cnt_a, cnt_b)`` with
    ``name_a < name_b`` — the edge list entity resolution feeds into
    ``scale.cluster.cluster_pairs`` to form ER groups.

    ``q`` is the gram width for the candidate filter (2 suits short
    name-like strings; 3 cuts candidates further on longer text).
    Exact for every ``k ≥ 1``, ``q ≥ 2`` — see module docstring.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    # persisted: referenced by the gram path, BOTH sides of the short
    # route, and both count joins — unpersisted, the upstream scan +
    # value groupBy re-runs per consumer (measured 8 scans / 17
    # exchanges, zero ReusedExchange), and the rows are narrow
    # (name, cnt), the cheap-to-cache shape
    vals = df.groupBy(F.col(col).alias("name")).agg(F.count(F.lit(1)).alias("cnt")).persist()
    pad = F.lit(chr(0) * (q - 1))
    padded = vals.select(
        "name",
        F.length("name").alias("len"),
        F.concat(pad, "name", pad).alias("pad"),
    )
    grams = padded.select(
        "name", "len", F.explode(_grams_of_padded(F.col("pad"), q)).alias("g")
    )
    # global total order = (ascending gram document frequency, gram):
    # hot grams sort last and never enter a prefix, so no posting list
    # goes quadratic on a common gram ("Supplier#..." prefixes, " " in
    # names).  Gram vocabulary is bounded by charset^q — broadcast.
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df_"))
    rank = F.row_number().over(Window.partitionBy("name").orderBy("df_", "g"))
    posts = (
        grams.join(F.broadcast(dfreq), "g")
        .withColumn("rk", rank)
        .where(F.col("rk") <= q * k + 1)
        .select("name", "len", F.xxhash64("g").alias("hg"))
        .persist()
    )
    cand = (
        posts.alias("x")
        .join(
            posts.alias("y"),
            (F.col("x.hg") == F.col("y.hg"))
            & (F.col("x.name") < F.col("y.name"))
            # ed ≥ |len(s) − len(t)|: length gap > k is provably out
            & (F.abs(F.col("x.len") - F.col("y.len")) <= k),
        )
        .select(F.col("x.name").alias("name_a"), F.col("y.name").alias("name_b"))
    )
    # short-string route: the prefix guarantee needs ≥ q·k+1 grams,
    # i.e. len ≥ q·(k−1)+2 (padded gram count = len+q−1).  Shorter
    # values — a set bounded by charset^(q(k−1)+1), tiny at value
    # grain — are paired directly against the length band that can
    # reach them (len ≤ short_max + k): broadcast the shorts, band
    # filter the other side.  Only pairs INVOLVING a short go through
    # here, so the non-equi join is |shorts| × |band|, never n².
    short_max = q * (k - 1) + 1
    shorts = vals.select("name", F.length("name").alias("len")).where(
        F.col("len") <= short_max
    )
    band = vals.select("name", F.length("name").alias("len")).where(
        F.col("len") <= short_max + k
    )
    short_cand = (
        F.broadcast(shorts.alias("s"))
        .join(
            band.alias("t"),
            (F.col("s.name") != F.col("t.name"))
            & (F.abs(F.col("s.len") - F.col("t.len")) <= k),
        )
        .select(
            F.least("s.name", "t.name").alias("name_a"),
            F.greatest("s.name", "t.name").alias("name_b"),
        )
    )
    cand = cand.unionByName(short_cand).distinct()
    verified = cand.withColumn("dist", F.levenshtein("name_a", "name_b")).where(
        F.col("dist") <= k
    )
    out = (
        verified.join(
            vals.select(F.col("name").alias("name_a"), F.col("cnt").alias("cnt_a")),
            "name_a",
        )
        .join(
            vals.select(F.col("name").alias("name_b"), F.col("cnt").alias("cnt_b")),
            "name_b",
        )
        .select("name_a", "name_b", "dist", "cnt_a", "cnt_b")
    )
    # cache lifetime is the caller's: session.release(out) frees both
    return register_persisted(out, posts, vals)
