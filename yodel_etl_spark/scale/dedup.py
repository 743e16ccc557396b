"""Deduplication family for LLM-corpus curation: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale postures (the quadratic term is the enemy):
  * exact — hash-groupBy, one shuffle on the digest, trivially linear.
  * n-gram Jaccard — inverted-index join on shingles (linear in total
    postings) instead of the O(n²) cross join; at 100 TB additionally
    drop ultra-frequent shingles (df cap) and band by document length
    (|A|/|B| ≥ t is necessary for J ≥ t), both standard prefix-filter
    moves that only discard provably-sub-threshold pairs.
  * MinHash+LSH — per-doc signature (k hashes over shingles), banded
    into buckets; candidate pairs only within equal (band, bucket-key);
    final exact-Jaccard verify removes false positives.  False
    negatives are bounded by the banding curve (b bands × r rows:
    P[candidate] = 1-(1-J^r)^b).
  * SimHash — 64-bit signed-projection sketch; near-dup = small Hamming
    distance; banding the 64 bits into (64/k)-bit blocks guarantees
    recall for distance < blocks (pigeonhole).
  * embedding cosine — blocked brute force at test SF; LSH/IVF variants
    live in scale.similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.textstats import tokens
from yodel_etl_spark.session import register_persisted, release


# ---------------------------------------------------------------- exact
def exact_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: md5 digest → canonical (min) id + member
    count.  One shuffle on the digest; the digest, not the text, moves
    through the exchange (hash first, shuffle second — at 100 TB this
    is the difference between shuffling 32-byte keys and shuffling
    documents)."""
    digests = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
    return digests.groupBy("digest").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct text (the min-id canonical member)."""
    keep = exact_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def dedup_against(
    corpus: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    keep_dupes: bool = False,
) -> DataFrame:
    """Incremental exact dedup: filter ``incoming`` rows whose text
    already exists in ``corpus`` (the daily-ingest-vs-lake shape).

    Both sides reduce to 16-byte digests before the join, so the
    anti/semi join shuffles digests — never documents; the corpus side
    additionally pre-distincts its digests (one row per unique text)
    ahead of the exchange.  ``keep_dupes=False`` returns the novel rows
    (anti join); ``True`` returns the already-seen rows (semi join)."""
    seen = corpus.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    inc = incoming.withColumn("digest", F.md5(F.col(text_col)))
    how = "left_semi" if keep_dupes else "left_anti"
    return inc.join(seen, "digest", how).drop("digest")


# ------------------------------------------------------------- shingles
def word_shingles(toks: Column, k: int = 3) -> Column:
    """Distinct word k-grams from a *materialized* token-array column.

    ``toks`` MUST be a column reference to an already-projected token
    array (``tokens(lower(text))`` in its own ``select``), never the
    tokenization expression itself: higher-order-function lambdas inline
    their argument's expression tree into the per-element body, so an
    inlined tokenizer re-runs the regex split once per gram — a measured
    ~50× slowdown on real documents."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.array_distinct(grams)


def _with_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc, sh) with tokens materialized before the gram expression
    (two selects on purpose; CollapseProject keeps a multiply-referenced
    non-trivial alias un-inlined)."""
    return (
        df.select(F.col(id_col).alias("doc"), tokens(F.lower(F.col(text_col))).alias("tk"))
        .select("doc", word_shingles(F.col("tk"), k).alias("sh"))
    )


def _shingle_posts(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) posting list + per-doc shingle counts."""
    sh = _with_shingles(df, id_col, text_col, k)
    return sh.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
    prefix_order: str = "df",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via PREFIX-FILTERED
    inverted-index join (PPJoin-style; exact, not approximate).

    Prefix-filter theorem: order each doc's distinct shingles by ANY
    global total order; if J(A,B) ≥ t, then A and B must share at least
    one shingle among each side's first ``n - ⌈t·n⌉ + 1`` shingles.  So
    the inverted index holds only those prefixes — at t=0.8 that's ~20%
    of the postings and a small fraction of the candidate fan-out
    versus the full index — and an exact ``array_intersect`` verify on
    the candidates removes every false positive.  Every
    provably-sub-threshold pair is the ONLY thing dropped, so results
    equal the brute-force oracle by construction UNDER EITHER ORDER.

    ``prefix_order`` picks the total order:

    * ``"df"`` (default, the textbook PPJoin order): ascending document
      frequency, ties by shingle.  Hot shingles sort LAST, so they
      cannot enter prefixes — the posting index stays skew-free at
      100 TB (an ultra-common shingle's posting list is the classic
      straggler under lexicographic order).  Costs one extra linear
      map-side-combined df aggregation + a per-doc rank.
    * ``"lex"``: lexicographic — no df pass, cheapest at small scale
      where no shingle is hot.

    ``df_cap`` additionally drops postings of shingles with document
    frequency above the cap (approximate mode; leave None for the
    exact oracle-checked form).
    """
    if prefix_order not in ("df", "lex"):
        raise ValueError(f"prefix_order must be 'df' or 'lex', got {prefix_order!r}")
    # NOT persisted (measured slower): the shingle arrays are wide, and
    # caching them costs more than the three recomputes of the cheap
    # tokenize kernel — unlike the signature tables below, which are one
    # narrow row per doc and clearly win from reuse.
    base = _with_shingles(df, id_col, text_col, k)
    n = F.size("sh")
    prefix_len = (n - F.ceil(F.lit(float(threshold)) * n) + 1).cast("int")
    # posting key = xxhash64(shingle): the self-join shuffles 8-byte
    # longs instead of gram strings; a hash collision can only ADD a
    # candidate pair, and the exact array_intersect verify removes it —
    # results stay exactly equal to the brute-force oracle.  Persisted:
    # the self-join's broadcast side is a separate pipeline (no exchange
    # reuse), and the posting rows are narrow.
    if prefix_order == "lex":
        prefixes = base.select(
            "doc", n.alias("n_sh"), F.slice(F.sort_array("sh"), 1, prefix_len).alias("pre")
        )
        posts = prefixes.select("doc", "n_sh", F.explode("pre").alias("shingle")).select(
            "doc", "n_sh", F.xxhash64("shingle").alias("hs")
        )
    else:
        from pyspark.sql import Window

        all_posts = base.select(
            "doc", n.alias("n_sh"), prefix_len.alias("plen"), F.explode("sh").alias("shingle")
        )
        # document frequency per shingle: linear, map-side combined —
        # the one extra pass that buys the skew-free posting index
        dfreq = all_posts.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        rank = F.row_number().over(
            Window.partitionBy("doc").orderBy("df_", "shingle")
        )
        posts = (
            all_posts.join(dfreq, "shingle")
            .withColumn("rk", rank)
            .where(F.col("rk") <= F.col("plen"))
            .select("doc", "n_sh", F.xxhash64("shingle").alias("hs"))
        )
    posts = posts.persist()
    if df_cap is not None:
        rare = posts.groupBy("hs").agg(F.count(F.lit(1)).alias("df_"))
        posts = posts.join(rare.where(F.col("df_") <= df_cap), "hs").drop("df_")
    # length filter (PPJoin): J(A,B) ≥ t ⟹ |A∩B| ≥ t·max(|A|,|B|) and
    # |A∩B| ≤ min(|A|,|B|) ⟹ min ≥ t·max — pairs failing it are
    # provably sub-threshold, pruned IN the join before the distinct
    tl = F.lit(float(threshold))
    cand = (
        posts.alias("x")
        .join(
            posts.alias("y"),
            (F.col("x.hs") == F.col("y.hs"))
            & (F.col("x.doc") < F.col("y.doc"))
            & (
                F.least(F.col("x.n_sh"), F.col("y.n_sh")).cast("double")
                >= tl * F.greatest(F.col("x.n_sh"), F.col("y.n_sh")).cast("double")
            ),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    verified = (
        cand.join(base.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(base.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")).cast("double"),
        )
    )
    out = verified.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )
    # cache lifetime is the caller's: session.release(out) after the
    # final action frees the posting table
    return register_persisted(out, posts)


# -------------------------------------------------------------- minhash
def minhash_signature_cols(num_hashes: int = 64) -> list[Column]:
    """MinHash signature as ``num_hashes`` aggregate expressions over an
    exploded posting list with base-hash column ``h``.

    Design note (hot path): higher-order-function lambdas
    (``transform``/``array_min``) are evaluated *interpreted*, never by
    whole-stage codegen — a per-doc array formulation benchmarked ~50×
    slower than this explode → codegen'd hash → partial-min shape.  Each
    seed's hash is ``xxhash64(i, h)`` over the 8-byte base hash: a
    fixed-width rehash (no per-seed string re-hash), and no ANSI-mode
    overflow risk as multiply-add universal hashing would have.  The
    ``min`` aggregates combine map-side, so the shuffle carries one
    partial signature per (doc × map partition), not the postings."""
    h = F.col("h")
    return [F.min(F.xxhash64(F.lit(i), h)).alias(f"m{i}") for i in range(num_hashes)]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    bands=16 × rows=4 over 64 hashes → P[candidate | J=0.5] ≈ 64%,
    ≈ 98% at J=0.7; tune (bands, num_hashes) to the target threshold.
    Candidates are verified with exact Jaccard so the output contains
    no false positives; recall is the banding curve's.

    Scale: signature build is narrow; banding shuffles (band, key)
    pairs (bands × n rows of 16 bytes); the candidate join touches only
    colliding buckets — the quadratic term never materializes.
    """
    rows_per_band = num_hashes // bands
    # materialize tokens, then shingles — each expression single-eval.
    # No size(sh)>0 filter: explode skips empty arrays, and a filter
    # here would be alias-inlined + pushed into the scan, re-evaluating
    # the shingle kernel per row (see session.get_spark excludedRules).
    # persisted: reused by the signature build and both verify join-backs
    base = _with_shingles(df, id_col, text_col, k).persist()
    posts = base.select("doc", F.explode("sh").alias("shingle")).withColumn(
        "h", F.xxhash64("shingle")
    )
    # persisted: the band self-join's broadcast side is a separate
    # pipeline (no exchange reuse), which would recompute signatures
    sigs = posts.groupBy("doc").agg(*minhash_signature_cols(num_hashes)).persist()
    # band key = one fixed-width xxhash64 over the band's signature cols
    banded = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"m{i}")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ]
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bkey")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    # exact verify on the candidate set only (reuses base's shingles)
    verified = (
        cand.join(base.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(base.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_a", F.size("sh_a"))
        .withColumn("n_b", F.size("sh_b"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    out = verified.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )
    return register_persisted(out, base, sigs)


# -------------------------------------------------------------- simhash
def simhash_bit_counts() -> list[Column]:
    """SimHash as 63 codegen'd ``sum(bit set)`` aggregates (+ total n)
    over an exploded token list with base-hash column ``h``.  Same
    explode-not-arrays rationale as :func:`minhash_signature_cols`:
    interpreted HOF lambdas benchmarked ~100× slower than this shape.
    Sign bit (63) stays clear so the sketch is a nonnegative long."""
    h = F.col("h")
    counts = [
        F.sum((h.bitwiseAND(F.lit(1 << b)) != 0).cast("long")).alias(f"c{b}")
        for b in range(63)
    ]
    return counts + [F.count(F.lit(1)).alias("n")]


def simhash_assemble() -> Column:
    """Fold the 63 bit-majority counts into the 64-bit sketch."""
    total = F.lit(0).cast("long")
    for b in range(63):
        total = total + (F.col(f"c{b}") * 2 > F.col("n")).cast("long") * F.lit(1 << b)
    return total


def hamming_pairs(
    sketches: DataFrame,
    id_col: str = "doc",
    hash_col: str = "sim",
    max_distance: int = 3,
    blocks: int = 8,
) -> DataFrame:
    """Generic 64-bit Hamming near-dup join: pairs with
    ``bit_count(xor) ≤ max_distance`` via block-banding — split the 64
    bits into ``blocks`` blocks; any pair within distance < blocks
    shares ≥1 exact block (pigeonhole, exact recall at that bound) →
    join per block, verify true distance with bit_count(xor).

    Input is any ``(id, 64-bit long)`` sketch table — text SimHash
    (:func:`simhash_pairs`) and image dHash
    (``scale.phash.image_near_dup``) both ride this one join; only
    ``(id, sim, block, key)`` rows flow through the band self-join.

    SIZE ``blocks`` TO THE CORPUS: expected bucket occupancy is
    n / 2^(64/blocks), and candidate volume grows with occupancy² — at
    n = 10⁶ the default 8-bit keys put ~4k sketches in every bucket
    and the self-join goes quadratic even on random data.  Keep
    64/blocks ≥ log₂(n) (blocks=4 → 16-bit keys carries ~65k sketches
    per key-space; real corpora cluster, so leave margin); the price is
    the pigeonhole recall bound dropping to distance < blocks.
    Output ``(doc_a, doc_b, hamming)``; the banded probe rows are
    persisted (both sides of the self-join served from cache —
    ``session.release`` the result to free them)."""
    if max_distance >= blocks:
        # same contract as probe_hamming_index: beyond this bound the
        # pigeonhole guarantee is gone and the batch API would silently
        # under-recall where the probe API raises
        raise ValueError(
            f"max_distance={max_distance} needs < blocks={blocks} for "
            "guaranteed recall (pigeonhole); use more blocks"
        )
    sims = sketches.select(
        F.col(id_col).alias("doc"), F.col(hash_col).alias("sim")
    )
    # ONE banding definition shared with the persisted index — the
    # probe-vs-batch parity the index tests pin requires identical keys
    banded = _hamming_banded(sims, blocks)
    # persisted at BANDED grain (blocks narrow rows per doc), not sketch
    # grain: the band self-join plans its broadcast side as a separate
    # pipeline (no exchange reuse), so persisting upstream of the
    # explode still re-ran the explode per side — caching the exploded
    # probe rows serves both sides verbatim (measured ~0.1-0.2 s off
    # the warm min at sf0.1, and the cold path drops the duplicate
    # tokenize + 63-agg sketch either way)
    banded = banded.persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["block", "key"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.col("x.sim").alias("sim_a"),
            F.col("y.sim").alias("sim_b"),
        )
        .distinct()
    )
    dist = cand.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
    out = dist.where(F.col("hamming") <= max_distance).select("doc_a", "doc_b", "hamming")
    return register_persisted(out, banded)


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_distance: int = 3, blocks: int = 8
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_distance — the
    64-bit text sketch (:func:`simhash_bit_counts` majority fold over
    xxhash64 unigrams) fed through the generic :func:`hamming_pairs`
    banding join.  Docs with zero tokens have no sketch and are
    excluded (they cannot near-dup textfully anyway)."""
    posts = (
        _with_shingles(df, id_col, text_col, 1)
        .select("doc", F.explode("sh").alias("w"))
        .withColumn("h", F.xxhash64("w"))
    )
    sims = (
        posts.groupBy("doc")
        .agg(*simhash_bit_counts())
        .select("doc", simhash_assemble().alias("sim"))
    )
    return hamming_pairs(sims, "doc", "sim", max_distance, blocks)


# ---------------------------------------------------------- bloom filter
def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """Distributed Bloom filter over a key column, as ONE dense row.

    Build: every key explodes into ``k`` probe positions
    (``pmod(xxhash64(key, i), m)``); positions reduce to 64-bit words
    via a ``bit_or`` aggregation.  bit_or is associative, so the map
    side combines each partition down to at most ``m/64`` word rows
    before the exchange — shuffle volume is O(words × partitions)
    regardless of corpus size, the textbook mergeable-sketch posture
    (Spark's own runtime bloom joins build theirs the same way).  The
    word rows then densify into a single array<long> row (zero-filled
    missing words) ready to broadcast into a probe plan.

    Returns a 1-row DataFrame ``(bloom: array<long>, m_bits: int,
    k: int)``.
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    pos = (
        keys.select(F.col(key_col).alias("_k"))
        .select(
            F.explode(
                F.array(*[F.pmod(F.xxhash64("_k", F.lit(i)), F.lit(m_bits)) for i in range(k)])
            ).alias("pos")
        )
    )
    words = pos.select(
        (F.col("pos") / 64).cast("int").alias("word"),
        # F.shiftleft takes only a literal shift — the SQL form accepts a column
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    ).groupBy("word").agg(F.bit_or("mask").alias("bits"))
    dense = words.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("bits")).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(F.element_at("_m", w), F.lit(0).cast("long")),
        ).alias("bloom"),
        F.lit(m_bits).alias("m_bits"),
        F.lit(k).alias("k"),
    )
    return dense


def bloom_might_contain(df: DataFrame, key_col: str, bloom: DataFrame, m_bits: int, k: int, out_col: str = "maybe_seen") -> DataFrame:
    """Tag each row with the Bloom membership verdict for ``key_col``.

    The 1-row bloom joins in via broadcast crossJoin (an array<long> of
    m/64 words — 16 KiB at the default size); the k probe checks are
    row-local codegen expressions, so the probe side adds NO shuffle
    and no Python.  False positives possible (hence *maybe*), false
    negatives impossible."""
    hit = None
    for i in range(k):
        # Column-valued shift needs the SQL shiftleft (F.shiftleft only
        # takes a literal shift amount)
        h = (
            F.expr(
                f"element_at(bloom, CAST(pmod(xxhash64({key_col}, {i}), {m_bits}) / 64 AS INT) + 1)"
                f" & shiftleft(CAST(1 AS BIGINT),"
                f"             CAST(pmod(xxhash64({key_col}, {i}), {m_bits}) % 64 AS INT))"
            )
            != 0
        )
        hit = h if hit is None else (hit & h)
    return (
        df.crossJoin(F.broadcast(bloom.select("bloom")))
        .withColumn(out_col, hit)
        .drop("bloom")
    )


def bloom_novel(
    corpus: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Incremental exact dedup with a Bloom prefilter — same result as
    :func:`dedup_against` (exact novel set), different scale shape.

    ``dedup_against`` anti-joins EVERY incoming digest against the
    distinct corpus digests — at 100 TB that shuffles the full
    incoming digest set plus the (semi-join-pruned) corpus side every
    ingest.  Here the corpus reduces once to a Bloom bitmap (m/64
    longs, built with map-side-combined bit_or partials), incoming
    rows failing ANY probe are *definitely novel* and never shuffle at
    all, and only the might-contain sliver (true dupes + ~FP-rate of
    the novel) pays the exact anti-join that removes false positives.
    With the default 2^17 bits / k=5 the FP rate at 10k corpus keys is
    ~1e-5; callers size ``m_bits`` to the corpus (the partial-agg
    build holds for any size).  Exactness: bloom negatives cannot be
    corpus members (no false negatives), and candidates are verified
    exactly — so output == dedup_against output, row for row.
    """
    # ``seen`` is a full distinct shuffle consumed twice (bloom build +
    # exact verify), and ``tagged`` is read by both the definite-novel
    # and candidate branches — persist both or each runs per consumer
    seen = corpus.select(F.md5(F.col(text_col)).alias("digest")).distinct().persist()
    bloom = bloom_build(seen, "digest", m_bits=m_bits, k=k)
    inc = incoming.withColumn("digest", F.md5(F.col(text_col)))
    tagged = bloom_might_contain(inc, "digest", bloom, m_bits=m_bits, k=k).persist()
    definite = tagged.where(~F.col("maybe_seen"))
    candidates = tagged.where(F.col("maybe_seen"))
    verified = candidates.join(seen, "digest", "left_anti")
    out = definite.unionByName(verified).drop("digest", "maybe_seen")
    return register_persisted(out, seen, tagged)


# ------------------------------------------------------- span scrub (C4)
def span_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
) -> DataFrame:
    """Cross-document duplicated-span removal, the C4 move ("we removed
    any [span] that occurred more than once in the data set" — Raffel et
    al. 2020 §2.2 do it at three-sentence granularity; here the unit is
    a non-overlapping ``w``-token window, the natural analogue for text
    without sentence boundaries).  A span whose exact text occurs in
    more than one document survives only in its keeper (min-id) doc and
    is cut everywhere else; per-doc output is the rebuilt text plus
    ``n_segs``/``n_dropped`` accounting, one row per input row.

    Scale shape — clean text never shuffles:
      * segmentation is a narrow higher-order projection (no explode of
        the text past its own stage): ``transform(sequence(...))`` over
        the staged token array;
      * the frequency count shuffles ONLY (md5, id) pairs — fixed-width
        digests, never span text;
      * the decision join keyed on the digest yields just the *dropped*
        (id, seg) coordinates — rare by construction — which group into
        tiny per-doc drop lists;
      * the rebuild joins docs against those drop lists (AQE broadcasts
        the small side) and cuts spans with an index-aware ``filter``
        lambda — a second narrow pass over the original text.
    So the only data-sized shuffle in the plan is the digest count, the
    same irreducible exchange exact dedup pays.
    """
    tk = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        tk.alias("_tk"),
        F.ceil(F.size(tk) / F.lit(w)).cast("int").alias("_nseg"),
    )
    seg_texts = F.transform(
        F.sequence(F.lit(0), F.col("_nseg") - 1),
        lambda s: F.array_join(F.slice(F.col("_tk"), s * w + 1, w), " "),
    )
    ex = base.select(
        F.col(id_col),
        F.posexplode(seg_texts).alias("seg", "_seg_text"),
    ).select(id_col, "seg", F.md5("_seg_text").alias("h"))
    ex = ex.persist()
    stats = ex.groupBy("h").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.min(id_col).alias("keeper"),
    )
    drops = (
        ex.join(stats, "h")
        .where((F.col("n_docs") > 1) & (F.col(id_col) != F.col("keeper")))
        .select(id_col, "seg")
    )
    drop_sets = drops.groupBy(id_col).agg(F.collect_set("seg").alias("_drop"))
    rebuilt = base.join(drop_sets, id_col, "left").select(
        F.col(id_col),
        F.col("_nseg").cast("long").alias("n_segs"),
        F.coalesce(F.size("_drop"), F.lit(0)).cast("long").alias("n_dropped"),
        F.array_join(
            F.filter(
                seg_texts,
                lambda x, i: ~F.coalesce(
                    F.array_contains(F.coalesce(F.col("_drop"), F.array().cast("array<int>")), i.cast("int")),
                    F.lit(False),
                ),
            ),
            " ",
        ).alias("text_clean"),
    )
    return register_persisted(rebuilt, ex)


# ------------------------------------- exact-substring spans (suffix-array)
def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact-substring duplicate detection, the suffix-array move of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", §4.1: build a suffix array over the corpus, report every
    repeated substring of ≥ k tokens): one row per MAXIMAL duplicated
    span ``(id, start, length)`` — a token range in which EVERY
    overlapping ``k``-token window occurs more than once in the corpus
    (in another document or at another position).  Complement of
    :func:`span_scrub`: that one cuts NON-overlapping fixed windows
    (the C4 grain, which misses any duplicate not aligned to the w-token
    lattice); this one is alignment-free — a shared passage is found
    wherever it starts — at the cost of overlapping-anchor fan-out.

    Distributed approximation in place of the literal suffix array (a
    global sort over all suffixes — a terabyte-scale total order no
    1000-executor plan wants): every position emits its k-token anchor
    digest; duplicated digests mark duplicated positions; a maximal run
    of CONSECUTIVE duplicated positions p0..p1 is the maximal span
    tokens[p0 : p1+k].  Anchor-run merging is per document, so two
    overlapping passages shared with DIFFERENT partners fuse into one
    reported span — every window of it is still verbatim-duplicated
    somewhere (the scrub criterion), but partner attribution needs the
    pair-grain join the banded families already provide.

    Scale shape — the same digest-only-shuffle contract as span_scrub:
      * anchors are a narrow ``transform`` over the staged token array
        (md5 per position, ~n_tokens rows of (id, pos, 16-byte digest)
        — text itself never leaves its scan partition);
      * the duplicate test is ONE map-side-combined count over digests
        plus a digest-keyed semi join back (co-partitioned with the
        count — AQE plans both sides of the same exchange);
      * run detection windows ONLY the duplicated positions (rare by
        construction), gaps-and-islands via pos − row_number.
    """
    from pyspark.sql import Window

    tk = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), tk.alias("_tk")).withColumn(
        "_n", F.size("_tk")
    )
    anchors = F.transform(
        F.sequence(F.lit(0), F.col("_n") - k),
        lambda p: F.md5(F.array_join(F.slice(F.col("_tk"), p + 1, k), " ")),
    )
    anch = (
        base.where(F.col("_n") >= k)
        .select(F.col(id_col), F.posexplode(anchors).alias("pos", "h"))
        .persist()
    )
    dup_h = anch.groupBy("h").agg(F.count(F.lit(1)).alias("_c")).where(
        F.col("_c") > 1
    )
    dup_pos = anch.join(dup_h.select("h"), "h", "left_semi").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = (
        dup_pos.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(F.min("pos").alias("start"), F.max("pos").alias("_end"))
        .select(
            F.col(id_col),
            F.col("start").cast("long").alias("start"),
            (F.col("_end") - F.col("start") + k).cast("long").alias("length"),
        )
    )
    return register_persisted(runs, anch)


def _redundant_positions(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared prologue of the scrub and its attribution report:
    ``(base, redundant, anch)`` where ``base`` is the tokenized doc
    frame (id, text, _tk, _n), ``redundant`` is every non-keeper
    duplicated anchor position (id, pos, src_id = the keeper's doc),
    and ``anch`` the persisted anchor table for the caller to register.
    One definition of the anchor digest and the min-(id, pos) keeper
    tie-break — the scrub and the source attribution MUST agree on
    both, or attribution reports sources for spans the scrub no longer
    cuts."""
    tk = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), F.col(text_col), tk.alias("_tk")).withColumn(
        "_n", F.size("_tk")
    )
    anchors = F.transform(
        F.sequence(F.lit(0), F.col("_n") - k),
        lambda p: F.md5(F.array_join(F.slice(F.col("_tk"), p + 1, k), " ")),
    )
    anch = (
        base.where(F.col("_n") >= k)
        .select(F.col(id_col), F.posexplode(anchors).alias("pos", "h"))
        .persist()
    )
    stats = anch.groupBy("h").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(F.struct(F.col(id_col).alias("kid"), F.col("pos").alias("kpos"))).alias(
            "_keep"
        ),
    )
    redundant = (
        anch.join(stats.where(F.col("_c") > 1), "h")
        .where(
            (F.col(id_col) != F.col("_keep.kid"))
            | (F.col("pos") != F.col("_keep.kpos"))
        )
        .select(id_col, "pos", F.col("_keep.kid").alias("src_id"))
    )
    return base, redundant, anch


def scrub_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """The cutting half of the Lee et al. 2022 exact-substring scrub:
    every maximal duplicated span (see :func:`duplicated_spans`) is
    REMOVED from all occurrences except the first — "first" at anchor
    grain: for each duplicated k-token window the minimum (id, pos)
    occurrence is the keeper, every other occurrence is redundant, and
    maximal runs of redundant positions cut tokens[p0 : p1+k].  Output
    is one row per input doc: ``(id, n_tokens, n_dropped, text_clean)``
    — the overlapping-grain complement of :func:`span_scrub`'s C4
    lattice (which misses any duplicate not aligned to the w-token
    grid).

    A doc can be keeper for one span and redundant for an overlapping
    one; keeper positions break redundant runs, so kept text is exactly
    the tokens no redundant run covers.  Cutting can create new k-gram
    adjacencies across a cut boundary; like the reference algorithm,
    the scrub does not recurse (run it again for a fixpoint).

    Scale shape — identical to :func:`duplicated_spans` plus the
    rebuild: anchors and the digest count shuffle fixed-width rows,
    the keeper choice is a plain ``min(struct(id, pos))`` per digest
    (map-side combined), the islands window sees only redundant
    positions, and the rebuild joins docs against tiny per-doc
    interval lists (AQE broadcasts the small side) and cuts with an
    index-aware ``filter`` lambda — a second narrow pass."""
    from pyspark.sql import Window

    base, redundant, anch = _redundant_positions(docs, id_col, text_col, k)
    redundant = redundant.select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    cuts = (
        redundant.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k).alias("e"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct(F.col("s"), F.col("e"))).alias("_cuts")
        )
    )
    covered = F.filter(
        F.sequence(F.lit(0), F.col("_n") - 1),
        lambda i: F.exists(
            F.coalesce(
                F.col("_cuts"), F.array().cast("array<struct<s:int,e:int>>")
            ),
            lambda iv: (i >= iv["s"]) & (i < iv["e"]),
        ),
    )
    rebuilt = base.join(cuts, id_col, "left").withColumn("_dropidx", covered)
    out = rebuilt.select(
        F.col(id_col),
        F.col("_n").cast("long").alias("n_tokens"),
        F.size("_dropidx").cast("long").alias("n_dropped"),
        F.array_join(
            F.filter(
                F.col("_tk"),
                lambda x, i: ~F.array_contains(F.col("_dropidx"), i.cast("int")),
            ),
            " ",
        ).alias("text_clean"),
    )
    return register_persisted(out, anch)


# ----------------------------------------------- persisted minhash index
def _band_table(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc, band, bkey) from a signature frame with columns m0..m{n-1}:
    each band key is ONE fixed-width xxhash64 over that band's signature
    slice (the minhash_lsh_pairs banding, factored for index reuse)."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"m{i}")
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bkey")


def _minhash_tables(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, bands: int, k: int
) -> tuple[DataFrame, DataFrame]:
    """(banded, sets) for an input corpus: the LSH posting table and the
    per-doc sorted distinct shingle-HASH sets (8 bytes per shingle —
    the index never stores text; Jaccard over 64-bit shingle hashes is
    exact up to a ~2⁻⁶⁴ collision rate, pinned equal to string-shingle
    Jaccard in tests)."""
    posts = (
        _with_shingles(df, id_col, text_col, k)
        .select("doc", F.explode("sh").alias("shingle"))
        .withColumn("h", F.xxhash64("shingle"))
        .persist()
    )
    sigs = posts.groupBy("doc").agg(*minhash_signature_cols(num_hashes))
    banded = _band_table(sigs, num_hashes, bands)
    sets = posts.groupBy("doc").agg(
        F.sort_array(F.collect_set("h")).alias("hs")
    )
    return register_persisted(banded, posts), sets


def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> None:
    """Persist a MinHash-LSH near-dup index for ``docs`` under ``path``:
    ``banded/`` (doc, band, bkey — the LSH posting table), ``sets/``
    (doc, sorted distinct shingle hashes — the exact-verify side), and
    ``params/`` (one row pinning num_hashes/bands/k, so probes can
    never band with mismatched parameters).  The index holds only
    fixed-width hashes — no text — at ~8·shingles + 24·bands bytes per
    document.

    This is the INCREMENTAL near-dup shape for a growing corpus (the
    daily-crawl increment): build once, :func:`extend_minhash_index`
    appends each delta's rows, and :func:`probe_minhash_index` checks
    new documents against the whole accumulated corpus WITHOUT ever
    re-tokenizing it — the corpus-sized work is paid exactly once per
    document, at its own arrival."""
    banded, sets = _minhash_tables(docs, id_col, text_col, num_hashes, bands, k)
    banded.write.mode("overwrite").parquet(f"{path}/banded")
    sets.write.mode("overwrite").parquet(f"{path}/sets")
    spark = docs.sparkSession
    spark.createDataFrame(
        [(num_hashes, bands, k)], "num_hashes int, bands int, k int"
    ).write.mode("overwrite").parquet(f"{path}/params")
    release(banded)


def extend_minhash_index(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Append ``docs`` to an existing index — delta-only maintenance:
    only the new documents are shingled/signed; parameters come from
    the index's own params table.  Caller contract: ids are globally
    unique across increments (re-appending an id duplicates its rows).

    Crash contract: the two appends are not atomic — a crash between
    them leaves the batch's rows in ``banded/`` but not ``sets/``.
    Such rows produce probe CANDIDATES that then fail the verify join
    (no sets row), so the index never emits a false positive, but it
    silently under-recalls those documents until the extend is re-run
    (duplicate rows from the re-run are benign: candidates are
    ``distinct``-ed and verification is per-doc).  The streaming gates
    recover this automatically via their at-least-once replay."""
    spark = docs.sparkSession
    p = spark.read.parquet(f"{path}/params").collect()[0]
    banded, sets = _minhash_tables(
        docs, id_col, text_col, p["num_hashes"], p["bands"], p["k"]
    )
    banded.write.mode("append").parquet(f"{path}/banded")
    sets.write.mode("append").parquet(f"{path}/sets")
    release(banded)


def probe_minhash_index(
    spark,
    path: str,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup hits of ``incoming`` against the persisted index:
    ``(doc_inc, doc_idx, n_common, jaccard)`` — banding parameters read
    from the index, candidates from the (band, bkey) equi-join of the
    incoming band table against the stored posting table, exact
    Jaccard verified on the stored hash sets.  The stored corpus is
    never re-tokenized; the scan reads only colliding buckets'
    rows (bucket-key equi-join — AQE picks broadcast when the incoming
    batch is small).  Probing does NOT modify the index; call
    :func:`extend_minhash_index` afterwards to admit the batch."""
    p = spark.read.parquet(f"{path}/params").collect()[0]
    inc_banded, inc_sets = _minhash_tables(
        incoming, id_col, text_col, p["num_hashes"], p["bands"], p["k"]
    )
    inc_sets = inc_sets.persist()
    out = _probe_from_tables(spark, path, inc_banded, inc_sets, threshold)
    # inc_banded carries the posting-table persist handle from
    # _minhash_tables — register it too, or every probe leaks one
    # cached (doc, shingle, h) frame into the CacheManager for the
    # life of the session (the long-running-stream hot path)
    return register_persisted(out, inc_sets, inc_banded)


def _probe_from_tables(
    spark, path: str, inc_banded: DataFrame, inc_sets: DataFrame, threshold: float
) -> DataFrame:
    """:func:`probe_minhash_index`'s join core over PREBUILT incoming
    (banded, sets) tables — factored so a caller that already signed
    the batch (the ingest gate) probes without re-shingling.  Persist
    discipline belongs to the caller."""
    idx_banded = spark.read.parquet(f"{path}/banded")
    idx_sets = spark.read.parquet(f"{path}/sets")
    cand = (
        inc_banded.select(F.col("doc").alias("doc_inc"), "band", "bkey")
        .join(
            idx_banded.select(F.col("doc").alias("doc_idx"), "band", "bkey"),
            ["band", "bkey"],
        )
        .select("doc_inc", "doc_idx")
        .distinct()
    )
    verified = (
        cand.join(
            inc_sets.select(F.col("doc").alias("doc_inc"), F.col("hs").alias("hs_i")),
            "doc_inc",
        )
        .join(
            idx_sets.select(F.col("doc").alias("doc_idx"), F.col("hs").alias("hs_x")),
            "doc_idx",
        )
        .withColumn("n_common", F.size(F.array_intersect("hs_i", "hs_x")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("hs_i") + F.size("hs_x") - F.col("n_common")).cast("double"),
        )
    )
    return verified.where(F.col("jaccard") >= threshold).select(
        "doc_inc", "doc_idx", "n_common", "jaccard"
    )


def _extend_index_tables(banded: DataFrame, sets: DataFrame, path: str) -> None:
    """Append PREBUILT (banded, sets) tables to a persisted MinHash
    index — :func:`extend_minhash_index` minus the re-shingling, for
    callers that already hold the batch's tables (the ingest gate).
    Factored as the gate's index-mutation boundary: the crash-window
    tests simulate a death exactly here.

    The two appends are INDEPENDENT jobs submitted concurrently (r15,
    guide §2.6 overlap): the crash contract only orders corpus-before-
    index, not banded-before-sets — a death between/among them leaves
    either table short, and the replay re-appends both: duplicated
    index rows only duplicate probe CANDIDATES (decisions are
    distinct-ed), and a banded row whose sets twin is missing merely
    yields a candidate the verify inner-join drops until the replay
    lands it; an orphan SETS row (sets landed, banded did not) is
    inert — candidates come from banded (pinned in
    tests/test_r15_opt.py's partial-extend interleaving test).  Both frames derive
    from the batch's persisted signature tables, so the concurrent
    jobs share the cached input."""
    _concurrent_writes(
        lambda: banded.write.mode("append").parquet(f"{path}/banded"),
        lambda: sets.write.mode("append").parquet(f"{path}/sets"),
    )


def _concurrent_writes(*thunks) -> None:
    """Submit independent write jobs from driver threads so their
    stages overlap (the guide's fill-the-tail pattern); every thunk
    completes (or the first failure propagates) before return — the
    caller's next write keeps whatever ordering it had."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        for f in [pool.submit(t) for t in thunks]:
            f.result()


def _pairs_from_tables(
    banded: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """In-corpus near-dup pairs ``(doc_a, doc_b)`` with ``doc_a <
    doc_b`` from PREBUILT (banded, sets) tables: banded self-join for
    candidates, exact Jaccard over the stored shingle-HASH sets (pinned
    equal to string-shingle Jaccard in tests).  The hash-set twin of
    :func:`minhash_lsh_pairs`'s core for callers that already hold the
    tables; persist discipline belongs to the caller."""
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    verified = (
        cand.join(
            sets.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b")),
            "doc_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("hs_a") + F.size("hs_b") - F.col("n_common")).cast("double"),
        )
    )
    return verified.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b")


def _index_exists(spark, index_path: str, marker: str = "params") -> bool:
    """True iff the index's commit-marker table exists — a Hadoop FS
    existence check, NOT a swallowed read error: treating a transient
    storage failure as 'no index yet' would let the first-batch branch
    OVERWRITE the accumulated index with one batch's docs.  The marker
    is whatever table the build writes LAST (``params`` for the
    MinHash/Hamming indexes, ``centroids`` for IVF), so a crash mid-
    build reads as 'no index' and the replay rebuilds via overwrite."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{index_path}/{marker}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _snapshot_cluster_pairs(
    cluster_src: DataFrame, components_path: str | None
) -> DataFrame | None:
    """Eager id-only snapshot of a batch's ``(doc_a, doc_b)`` cluster
    pairs, taken BEFORE any index mutation (the novel_ids self-hit
    discipline: a post-extend re-evaluation of the probe would hit the
    batch's own just-written rows).  Self-pairs — a replayed
    fully-landed batch probing itself — drop here.  None when the
    component map is not enabled, costing nothing."""
    if components_path is None:
        return None
    return (
        cluster_src.where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def near_dedup_ingest(
    index_path: str,
    corpus_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    components_path: str | None = None,
):
    """foreachBatch landing function for a NEAR-dup-gated ingest stream
    — the MinHash twin of the exact ``dedup_against`` loop: each
    micro-batch (1) drops members of in-batch near-dup pairs greedily
    (min id per pair survives; a chain a~b~c keeps only a — the
    connected-components canonicalization is the batch refinement),
    (2) probes the persisted index and drops everything within
    ``threshold`` of the accumulated corpus, (3) appends the survivors
    to ``corpus_path`` and admits them to the index.  The batch is
    shingled and signed exactly ONCE — the same (banded, sets) tables
    serve all three steps (the in-batch pass via
    :func:`_pairs_from_tables`, the probe via
    :func:`_probe_from_tables`, the admit via
    :func:`_extend_index_tables`), where signing per step would pay
    the data-sized tokenize/MinHash kernel three times per batch.

    Wire as ``stream.writeStream.foreachBatch(near_dedup_ingest(...))``.
    Delivery note: foreachBatch is at-least-once under retries, and the
    CORPUS APPEND LANDS BEFORE THE INDEX EXTEND — ordering is load-
    bearing.  A replay after full success probes its own just-admitted
    index rows, self-hits, and is gated out (idempotent no-op); a crash
    between the corpus append and the extend replays into a duplicate
    corpus append — schedule
    :func:`yodel_etl_spark.io.compact.vacuum_parquet` on the corpus
    (and :func:`vacuum_minhash_index` on the index) to collapse them,
    or land into a transactional table format (the standard
    foreachBatch file-sink contract).  The
    REVERSE order would turn that crash window into silent permanent
    loss: the replay would self-hit against index rows whose corpus
    rows never landed and drop the whole batch.  Duplicated index rows
    from a replayed extend only duplicate probe CANDIDATES (decisions
    are ``distinct``-ed), so gating stays correct.

    ``components_path`` (opt-in) closes the incremental loop's cluster
    leg: every batch's near-dup pairs — the in-batch pairs AND the
    cross-batch probe hits, including GATED documents (provenance:
    a dropped doc maps to the cluster holding its canonical landed
    copy) — fold into a persisted ``(node, component)`` map via
    :func:`yodel_etl_spark.scale.cluster.update_component_map`.  The
    pair set is snapshotted (eager localCheckpoint, ids only) BEFORE
    any index write for the same self-hit reason as ``novel_ids``, and
    the map write lands LAST: it is versioned-snapshot crash-safe on
    its own (see update_component_map), and a crash before it simply
    re-folds the same pairs on replay — the map equals
    ``connected_components`` over every pair the gate ever saw (parity
    pinned in tests/test_streaming.py).  A ``components_path`` has a
    SINGLE-WRITER contract (one gate per map path — see
    update_component_map): two gates folding into one path would
    clobber each other's same-version snapshots — since r13 the
    exclusive claim marker turns that into a raised error (the batch
    fails loudly instead of edges vanishing); to merge modalities,
    union the pair sources into one gate instead."""

    def land(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        # snapshot the INPUT once: everything downstream (pairs, probe,
        # novel filter, three writes) re-derives from this checkpoint,
        # never from the stream source.  LAZY: the eager novel_ids
        # checkpoint below materializes it inside its own job — before
        # any index mutation — so safety is identical and the batch
        # skips a dedicated materialization action
        batch = batch.dropDuplicates([id_col]).localCheckpoint(eager=False)
        have_index = _index_exists(spark, index_path)
        if have_index:
            # the index's pinned parameters govern BOTH gates: an
            # in-batch pass at different shingle/banding parameters
            # would judge the same jittered duplicate differently
            # depending on which batch it arrives in
            p = spark.read.parquet(f"{index_path}/params").collect()[0]
            nh, nb, kk = p["num_hashes"], p["bands"], p["k"]
        else:
            nh, nb, kk = num_hashes, bands, k
        # sign the batch exactly ONCE: the same (banded, sets) tables
        # serve the in-batch pass, the index probe, AND the index
        # extend — shingling is the data-sized kernel and paying it
        # three times per batch was the old hot-path cost
        banded, sets = _minhash_tables(batch, id_col, text_col, nh, nb, kk)
        banded = banded.persist()
        sets = sets.persist()
        # try/finally: foreachBatch retries a failed batch, and each
        # failed attempt would otherwise strand this attempt's cached
        # frames in the CacheManager for the life of the stream
        try:
            pairs = _pairs_from_tables(banded, sets, threshold)
            losers = pairs.select(F.col("doc_b").alias("doc")).distinct()
            surv_ids = (
                batch.select(F.col(id_col).alias("doc")).join(
                    losers, "doc", "left_anti"
                )
            )
            hits = None
            if have_index:
                hits = _probe_from_tables(
                    spark,
                    index_path,
                    banded.join(surv_ids, "doc", "left_semi"),
                    sets.join(surv_ids, "doc", "left_semi"),
                    threshold,
                )
                if components_path is not None:
                    # snapshot the probe ONCE (ids only): the novel
                    # filter AND the cluster union both read this
                    # frame, so the index join never runs twice per
                    # batch — and it is evaluated before any index
                    # write, same self-hit discipline as novel_ids
                    hits = hits.select("doc_inc", "doc_idx").localCheckpoint(
                        eager=True
                    )
                dup_ids = hits.select(F.col("doc_inc").alias("doc")).distinct()
                novel_ids = surv_ids.join(dup_ids, "doc", "left_anti")
            else:
                novel_ids = surv_ids
            # SNAPSHOT the admitted id set before ANY index mutation:
            # localCheckpoint (eager) cuts the lineage, so nothing can
            # re-evaluate the probe afterwards.  A persist()+count() is NOT
            # enough — releasing the probe's intermediates cascades the
            # uncache to this dependent plan (Spark uncacheQuery cascade
            # semantics) — and without the snapshot the sets append would
            # re-run the probe AFTER the banded append and self-hit the
            # batch's own just-written posting rows.  Only the narrow id
            # column pins; the data-sized tables stay in their cache.
            novel_ids = novel_ids.localCheckpoint(eager=True)
            cp = pairs
            if hits is not None and components_path is not None:
                cp = cp.unionByName(
                    hits.select(
                        F.col("doc_inc").alias("doc_a"),
                        F.col("doc_idx").alias("doc_b"),
                    )
                )
            cluster_pairs = _snapshot_cluster_pairs(cp, components_path)
            novel = batch.join(
                novel_ids.withColumnRenamed("doc", id_col), id_col, "left_semi"
            )
            # corpus BEFORE index (see the delivery note): a crash here
            # replays into a duplicate corpus append; index-first would
            # make the replay self-hit and silently lose the batch
            novel.write.mode("append").parquet(corpus_path)
            novel_banded = banded.join(novel_ids, "doc", "left_semi")
            novel_sets = sets.join(novel_ids, "doc", "left_semi")
            if have_index:
                _extend_index_tables(novel_banded, novel_sets, index_path)
            else:
                # banded/sets are order-independent (see
                # _extend_index_tables) — concurrent submission; params
                # stays strictly LAST: _index_exists keys on it, so a
                # crash anywhere before it leaves "no index" and the
                # replay rebuilds via overwrite
                _concurrent_writes(
                    lambda: novel_banded.write.mode("overwrite").parquet(
                        f"{index_path}/banded"
                    ),
                    lambda: novel_sets.write.mode("overwrite").parquet(
                        f"{index_path}/sets"
                    ),
                )
                spark.createDataFrame(
                    [(nh, nb, kk)], "num_hashes int, bands int, k int"
                ).write.mode("overwrite").parquet(f"{index_path}/params")
            # cluster-map fold LAST (own versioned-snapshot crash
            # contract; a crash anywhere above replays the same pairs)
            if cluster_pairs is not None and cluster_pairs.count() > 0:
                from yodel_etl_spark.scale.cluster import update_component_map

                update_component_map(
                    spark,
                    components_path,
                    cluster_pairs,
                    # names the LOGICAL write: a replayed batch
                    # reclaims its own crashed attempt's claim
                    # (see update_component_map's claim lifecycle)
                    writer_token=f"{corpus_path}#{_batch_id}",
                )
        finally:
            release(banded)
            sets.unpersist()

    return land


def duplicated_span_sources(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Keeper ATTRIBUTION for duplicated spans: one row per maximal run
    of redundant positions sharing the same keeper document —
    ``(id, start, length, src_id)`` where ``src_id`` holds the first
    (min (id, pos)) occurrence of every anchor in the run.  The
    provenance report behind :func:`scrub_duplicated_spans`'s cuts:
    "this passage in doc X is a copy of doc Y" — what a curation
    pipeline logs for audit and what boilerplate analysis aggregates by
    source.

    Runs are islanded per (id, keeper-id) pair, so a passage stitched
    from TWO different sources reports as two attributed spans (where
    :func:`duplicated_spans` fuses them into one unattributed span) —
    pair-grain truth costs nothing extra here because the keeper is
    already one ``min(struct)`` per digest, not an all-pairs join.

    Scale shape: identical to :func:`scrub_duplicated_spans` — the
    keeper choice rides the digest count's exchange; only redundant
    positions reach the islands window."""
    from pyspark.sql import Window

    _, redundant, anch = _redundant_positions(docs, id_col, text_col, k)
    w = Window.partitionBy(id_col, "src_id").orderBy("pos")
    runs = (
        redundant.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "src_id", "_grp")
        .agg(F.min("pos").alias("start"), F.max("pos").alias("_end"))
        .select(
            F.col(id_col),
            F.col("start").cast("long").alias("start"),
            (F.col("_end") - F.col("start") + k).cast("long").alias("length"),
            F.col("src_id"),
        )
    )
    return register_persisted(runs, anch)


# ----------------------------------------------- persisted hamming index
def _hamming_banded(sims: DataFrame, blocks: int) -> DataFrame:
    """(doc, sim, block, key) band rows for a (doc, sim) sketch table —
    the :func:`hamming_pairs` banding, factored for index persistence.
    Pure projection + explode: no shuffle, 8 narrow rows per doc."""
    width = 64 // blocks
    return sims.select(
        "doc",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftrightunsigned(F.col("sim"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select("doc", "sim", F.col("bb.block"), F.col("bb.key"))


def write_hamming_index(
    sketches: DataFrame,
    path: str,
    id_col: str = "doc",
    hash_col: str = "sim",
    blocks: int = 8,
) -> None:
    """Persist a 64-bit Hamming near-dup index: ``banded/`` rows carry
    (doc, sim, block, key) — band keys for the candidate join AND the
    full sketch for in-row exact verification, so probes need no second
    lookup table — plus ``params/`` pinning ``blocks``.  Modality-
    agnostic: text SimHash, image dHash, and audio fingerprints all
    produce (id, 64-bit long) sketch tables, and at 8 bytes per sketch
    the whole index is ~40 bytes × blocks per item.  The incremental
    counterpart of :func:`hamming_pairs`, exactly as
    :func:`write_minhash_index` is to :func:`minhash_lsh_pairs`.
    Size ``blocks`` to the EVENTUAL corpus (see the
    :func:`hamming_pairs` occupancy note — keep 64/blocks ≥ log₂(n));
    the parameter is pinned at build time and every probe inherits
    it."""
    sims = sketches.select(
        F.col(id_col).alias("doc"), F.col(hash_col).alias("sim")
    )
    _hamming_banded(sims, blocks).write.mode("overwrite").parquet(f"{path}/banded")
    sketches.sparkSession.createDataFrame(
        [(blocks,)], "blocks int"
    ).write.mode("overwrite").parquet(f"{path}/params")


def extend_hamming_index(
    sketches: DataFrame, path: str, id_col: str = "doc", hash_col: str = "sim"
) -> None:
    """Append a sketch batch — delta-only (only the new items band);
    blocks come from the index's params.  Ids must be globally unique
    across increments."""
    spark = sketches.sparkSession
    blocks = spark.read.parquet(f"{path}/params").collect()[0]["blocks"]
    sims = sketches.select(
        F.col(id_col).alias("doc"), F.col(hash_col).alias("sim")
    )
    _hamming_banded(sims, blocks).write.mode("append").parquet(f"{path}/banded")


def vacuum_minhash_index(spark, path: str) -> dict:
    """Collapse replay-duplicate rows in a persisted MinHash index —
    the index-side twin of the corpus vacuum
    (:func:`yodel_etl_spark.io.compact.vacuum_parquet`): a replayed
    ``extend_minhash_index`` appends its batch's ``banded``/``sets``
    rows again (benign for correctness — candidates are distinct-ed,
    verification is per-doc — but probe work and scan bytes grow with
    every replay).  Duplicate copies are byte-identical (bkey and the
    shingle-hash set are deterministic functions of text + pinned
    params), so any keeper is exact.  Each table swaps independently
    through the two-phase commit; a crash between them leaves one
    table vacuumed and the other not — both states are valid indices."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    return {
        "banded": vacuum_parquet(spark, f"{path}/banded", ["doc", "band"]),
        "sets": vacuum_parquet(spark, f"{path}/sets", ["doc"]),
    }


def vacuum_hamming_index(spark, path: str) -> dict:
    """Replay-duplicate collapse for a persisted Hamming index (one
    ``banded`` table; duplicate (doc, block) rows are byte-identical
    since key derives from the sketch)."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    return {
        "banded": vacuum_parquet(spark, f"{path}/banded", ["doc", "block"])
    }


def probe_hamming_index(
    spark,
    path: str,
    incoming: DataFrame,
    id_col: str = "doc",
    hash_col: str = "sim",
    max_distance: int = 3,
) -> DataFrame:
    """Near-dup hits of incoming sketches against the index:
    ``(doc_inc, doc_idx, hamming)`` with ``hamming ≤ max_distance`` —
    candidates from the (block, key) equi-join, distance verified
    in-row from the sketches both sides carry (no second join).  The
    pigeonhole recall guarantee requires ``max_distance < blocks``
    (validated); the stored corpus is never re-sketched."""
    blocks = spark.read.parquet(f"{path}/params").collect()[0]["blocks"]
    if max_distance >= blocks:
        raise ValueError(
            f"max_distance={max_distance} needs < blocks={blocks} for "
            "guaranteed recall (pigeonhole); rebuild with more blocks"
        )
    sims = incoming.select(
        F.col(id_col).alias("doc"), F.col(hash_col).alias("sim")
    )
    inc = _hamming_banded(sims, blocks).select(
        F.col("doc").alias("doc_inc"), F.col("sim").alias("sim_i"), "block", "key"
    )
    idx = spark.read.parquet(f"{path}/banded").select(
        F.col("doc").alias("doc_idx"), F.col("sim").alias("sim_x"), "block", "key"
    )
    return (
        inc.join(idx, ["block", "key"])
        .select(
            "doc_inc",
            "doc_idx",
            F.bit_count(F.col("sim_i").bitwiseXOR(F.col("sim_x"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_distance)
        .distinct()
    )


def scrub_to_fixpoint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_rounds: int = 4,
) -> DataFrame:
    """Iterate :func:`scrub_duplicated_spans` until a round cuts
    nothing: cutting can splice two previously-separated token runs
    into a NEW duplicated k-gram (a doc reduced to exactly another
    doc's text is the canonical case), which a single pass misses.
    Returns ``(id, text_clean, n_dropped_total, n_rounds)`` — rounds
    counts the passes that actually cut.

    Control-plane loop in the k-means/BPE family: the per-round stop
    probe is ONE summed counter; each round's survivor text is
    ``localCheckpoint``-truncated so ``max_rounds`` stays O(rounds)
    cost, not O(rounds²) lineage.  Convergence is guaranteed — every
    cutting round strictly removes tokens — but corpus-wide fixpoints
    usually land in 1-2 rounds; ``max_rounds`` bounds the pathological
    chain."""
    cur = docs.select(
        F.col(id_col),
        F.col(text_col).alias("text"),
        F.lit(0).cast("long").alias("_cum"),
    )
    rounds_used = 0
    for _ in range(max_rounds):
        s = scrub_duplicated_spans(cur, id_col, "text", k)
        # ONE execution of the (rebuild-heavy) scrub per round: the
        # joined round result materializes via the eager checkpoint and
        # the stop counter reads off that snapshot — a separate agg on
        # `s` would run the whole rebuild a second time (only the
        # anchor table is persisted inside the scrub)
        nxt = (
            cur.select(id_col, "_cum")
            .join(s.select(id_col, "n_dropped", "text_clean"), id_col)
            .select(
                F.col(id_col),
                F.col("text_clean").alias("text"),
                (F.col("_cum") + F.col("n_dropped")).alias("_cum"),
                F.col("n_dropped").alias("_rd"),
            )
            .localCheckpoint(eager=True)
        )
        release(s)
        total = nxt.agg(F.sum("_rd")).collect()[0][0] or 0
        cur = nxt.drop("_rd")
        if total == 0:
            break
        rounds_used += 1
    return cur.select(
        F.col(id_col),
        F.col("text").alias("text_clean"),
        F.col("_cum").alias("n_dropped_total"),
        F.lit(rounds_used).cast("int").alias("n_rounds"),
    )


def sketch_dedup_ingest(
    index_path: str,
    corpus_path: str,
    id_col: str = "doc",
    hash_col: str = "sim",
    max_distance: int = 3,
    blocks: int = 8,
    components_path: str | None = None,
):
    """foreachBatch landing function for a SKETCH stream (image dHash,
    audio fingerprints, text SimHash) — the Hamming twin of
    :func:`near_dedup_ingest`: per micro-batch, collapse in-batch
    near-dup pairs to the min id, probe the persisted Hamming index and
    drop everything within ``max_distance`` of the accumulated corpus,
    then append survivors to ``corpus_path`` and admit them to the
    index (:func:`extend_hamming_index`).  Same snapshot discipline (eager
    localCheckpoint before the extend — see near_dedup_ingest's
    self-hit note), the same at-least-once posture, and the same
    load-bearing write order: corpus append BEFORE index extend, so a
    crash between them replays into a duplicate corpus append instead
    of a self-hit-gated silent loss (see near_dedup_ingest's delivery
    note; vacuum_parquet / :func:`vacuum_hamming_index` collapse the
    replay duplicates).  ``components_path`` (opt-in) folds each batch's pairs —
    in-batch AND probe hits, gated sketches included — into the same
    persisted versioned ``(node, component)`` map as the MinHash gate
    (see near_dedup_ingest's components paragraph; identical snapshot
    discipline, crash contract, and single-writer-per-path rule)."""

    def land(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates([id_col])
        if _index_exists(spark, index_path):
            nb = spark.read.parquet(f"{index_path}/params").collect()[0]["blocks"]
        else:
            nb = blocks
        pairs = hamming_pairs(batch, id_col, hash_col, max_distance, nb)
        # try/finally: a failed attempt is retried by foreachBatch, and
        # each attempt would otherwise strand pairs' cached frames in
        # the CacheManager for the life of the stream
        try:
            losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
            batch = batch.join(losers, id_col, "left_anti")
            cluster_src = pairs.select("doc_a", "doc_b")
            if _index_exists(spark, index_path):
                hits = probe_hamming_index(
                    spark, index_path, batch, id_col, hash_col, max_distance
                )
                if components_path is not None:
                    # probe snapshot shared by gate + cluster union
                    # (the near-gate discipline: one index join/batch)
                    hits = hits.select("doc_inc", "doc_idx").localCheckpoint(
                        eager=True
                    )
                dup_ids = hits.select(F.col("doc_inc").alias(id_col)).distinct()
                if components_path is not None:
                    cluster_src = cluster_src.unionByName(
                        hits.select(
                            F.col("doc_inc").alias("doc_a"),
                            F.col("doc_idx").alias("doc_b"),
                        )
                    )
                novel = batch.join(dup_ids, id_col, "left_anti").localCheckpoint(
                    eager=True
                )
                cluster_pairs = _snapshot_cluster_pairs(
                    cluster_src, components_path
                )
                # corpus BEFORE index — same crash-window ordering as
                # near_dedup_ingest (index-first + replay = silent loss)
                novel.write.mode("append").parquet(corpus_path)
                extend_hamming_index(novel, index_path, id_col, hash_col)
            else:
                novel = batch.localCheckpoint(eager=True)
                cluster_pairs = _snapshot_cluster_pairs(
                    cluster_src, components_path
                )
                novel.write.mode("append").parquet(corpus_path)
                write_hamming_index(novel, index_path, id_col, hash_col, nb)
            if cluster_pairs is not None and cluster_pairs.count() > 0:
                from yodel_etl_spark.scale.cluster import update_component_map

                update_component_map(
                    spark,
                    components_path,
                    cluster_pairs,
                    # names the LOGICAL write: a replayed batch
                    # reclaims its own crashed attempt's claim
                    # (see update_component_map's claim lifecycle)
                    writer_token=f"{corpus_path}#{_batch_id}",
                )
        finally:
            release(pairs)

    return land


def embedding_dedup_ingest(
    index_path: str,
    corpus_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nprobe: int = 3,
    centroid_every: int = 50,
    n_planes: int = 16,
    blocks: int = 4,
    components_path: str | None = None,
    max_fatness: float | None = None,
):
    """foreachBatch landing function for an EMBEDDING stream — the ANN
    member of the ingest-gate family (text shingles →
    :func:`near_dedup_ingest`, 64-bit sketches →
    :func:`sketch_dedup_ingest`, embedding vectors → this): per
    micro-batch, collapse in-batch near-dups via hyperplane-LSH
    candidates + exact cosine verify (min id per pair survives), probe
    the persisted IVF index and drop everything with cosine ≥
    ``threshold`` against the accumulated corpus, then append
    survivors to ``corpus_path`` and admit them to the index
    (:func:`~yodel_etl_spark.scale.similarity.extend_ivf_index` —
    delta-only: new vectors score against the frozen broadcast
    centroids; the corpus is never re-assigned).

    Same load-bearing write order (corpus append BEFORE index extend —
    see near_dedup_ingest's delivery note; vacuum_parquet /
    ``similarity.vacuum_ivf_index`` collapse the crash-window replay
    duplicates), the same at-least-once
    posture and cache discipline, and the same opt-in
    ``components_path`` cluster leg (single-writer-per-path, like its
    siblings).  One honesty divergence from its
    two siblings: the cross-batch probe is APPROXIMATE — recall
    follows the nprobe/centroid geometry (see probe_ivf_index), where
    the MinHash/Hamming verifies are exact.  Near-dup thresholds live
    where the geometry is benign (planted-twin recall ~1, pinned in
    tests), and a missed duplicate degrades to a redundant corpus row,
    never a lost one.  Centroids are frozen at first-batch build;
    ``max_fatness`` (opt-in) automates the rebuild trigger — before the
    corpus append, the batch's projected post-extend mean-cell load vs
    the build-time mean is checked and a breach raises
    :class:`~yodel_etl_spark.scale.similarity.StaleIVFIndexError`
    (deterministic, BEFORE any write — the centroid-feasibility
    convention: a refusal after a side-effecting append would replay
    into an unbounded duplicate loop).  The operator then runs
    :func:`~yodel_etl_spark.scale.similarity.rebuild_ivf_index` from
    ``corpus_path`` and restarts the stream; with it unset the gate
    keeps the documented schedule-it-yourself posture.

    Guard cost: the gate reads ``ivf_index_stats`` ONCE at the first
    guarded batch and tracks ``n_vectors`` incrementally from its own
    admit counts — per-batch guard cost is the ``novel.count()`` the
    projection needs anyway plus one ``getFileStatus`` FS op on
    params.json, never an extra aggregate job over the posting table
    (per-job constants dominate this path; see BASELINE's eingest
    phase decomposition).  The mtime probe bounds denominator
    staleness (r14): ``rebuild_ivf_index`` is a public API an operator
    can run while the stream is LIVE — it republishes params.json, so
    a changed mtime drops the cached snapshot and the next batch
    re-reads stats, on top of the guard's own refusal already dropping
    it.  A replayed crash window appends duplicate
    posting rows the cache does not see, so the tracked fatness can
    read slightly LOW until the restart re-reads stats — bounded by
    the duplicates vacuum_ivf_index collapses, and a late rebuild
    trigger degrades probe cost, never correctness."""
    # first-guarded-batch stats snapshot + incremental vector count
    # (populated lazily inside land; see the guard-cost note above)
    fat_cache: dict = {}

    def land(batch: DataFrame, _batch_id: int) -> None:
        from yodel_etl_spark.scale.similarity import (
            extend_ivf_index,
            hyperplane_lsh_pairs,
            is_centroid_id,
            ivf_index_write,
            probe_ivf_index,
        )

        spark = batch.sparkSession
        batch = batch.dropDuplicates([id_col])
        pairs = hyperplane_lsh_pairs(
            batch, id_col, vec_col, threshold, n_planes, blocks
        )
        # try/finally: the retried-batch cache-leak contract the other
        # two gates carry (pairs registers its persisted sketch)
        try:
            losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
            batch = batch.join(losers, id_col, "left_anti")
            cluster_src = pairs.select(
                F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
            )
            if _index_exists(spark, index_path, marker="centroids"):
                hits = probe_ivf_index(
                    spark, index_path, batch, id_col, vec_col, threshold, nprobe
                )
                if components_path is not None:
                    # probe snapshot shared by gate + cluster union
                    # (the near-gate discipline: one index join/batch)
                    hits = hits.select("id_inc", "id_idx").localCheckpoint(
                        eager=True
                    )
                dup_ids = hits.select(F.col("id_inc").alias(id_col)).distinct()
                if components_path is not None:
                    cluster_src = cluster_src.unionByName(
                        hits.select(
                            F.col("id_inc").alias("doc_a"),
                            F.col("id_idx").alias("doc_b"),
                        )
                    )
                novel = batch.join(dup_ids, id_col, "left_anti").localCheckpoint(
                    eager=True
                )
                n_novel = None
                if max_fatness is not None:
                    # staleness refusal BEFORE any write (the centroid-
                    # feasibility convention): a breach after the corpus
                    # append would replay into a duplicate-append loop
                    from yodel_etl_spark.scale.similarity import (
                        StaleIVFIndexError,
                        ivf_index_stats,
                        ivf_params_mtime,
                    )

                    # staleness bound on the frozen denominators (r14):
                    # rebuild_ivf_index is a public API an operator can
                    # run while this stream is LIVE — it republishes
                    # params.json, so its mtime is the change signal.
                    # One getFileStatus FS op per batch, no Spark job
                    # (the guard-cost discipline); on change the cached
                    # stats re-read, so the guard neither keeps
                    # refusing after a rebuild fixed the index nor
                    # under-enforces against pre-rebuild denominators.
                    mtime = ivf_params_mtime(spark, index_path)
                    if fat_cache and fat_cache.get("params_mtime") != mtime:
                        fat_cache.clear()
                    if not fat_cache:
                        # one stats read per stream (frozen denominators
                        # — see the guard-cost note in the docstring)
                        stats = ivf_index_stats(spark, index_path)
                        if stats["built_mean"] is None:
                            raise ValueError(
                                "cannot enforce max_fatness: index at "
                                f"{index_path!r} has no params.json; "
                                "rebuild once with rebuild_ivf_index"
                            )
                        fat_cache.update(
                            n_vectors=stats["n_vectors"],
                            n_cells=stats["n_cells"],
                            built_mean=stats["built_mean"],
                            params_mtime=mtime,
                        )
                    n_novel = novel.count()
                    projected = (
                        fat_cache["n_vectors"] + n_novel
                    ) / fat_cache["n_cells"]
                    fatness = projected / fat_cache["built_mean"]
                    if fatness > max_fatness:
                        # drop the snapshot on refusal: the operator's
                        # next move is a rebuild, after which the
                        # frozen denominators change — the retried
                        # batch (same closure or fresh stream) must
                        # re-read stats, not re-refuse from stale ones
                        fat_cache.clear()
                        raise StaleIVFIndexError(
                            "admitting this batch would push mean cell "
                            f"fatness to {fatness:.2f}× the build-time "
                            f"mean (bound {max_fatness}×) — run "
                            f"rebuild_ivf_index({index_path!r}) from "
                            f"{corpus_path!r} and restart the stream"
                        )
                cluster_pairs = _snapshot_cluster_pairs(
                    cluster_src, components_path
                )
                # corpus BEFORE index — the family's crash-window order
                novel.write.mode("append").parquet(corpus_path)
                extend_ivf_index(novel, index_path, id_col, vec_col)
                if n_novel is not None:
                    # count the admit only AFTER the extend landed: a
                    # crash above replays the batch, and the replay's
                    # guard must project from the pre-crash total
                    fat_cache["n_vectors"] += n_novel
            else:
                novel = batch.localCheckpoint(eager=True)
                # an EMPTY trigger before any index exists is a no-op,
                # not a refusal — the near/sketch gates land empty
                # batches benignly and this gate must too
                if novel.limit(1).count() == 0:
                    return
                # centroid feasibility BEFORE the corpus append, using
                # THE build's own selection predicate: the refusal is
                # DETERMINISTIC, so raising after a side-effecting
                # write would replay into an unbounded duplicate-
                # append loop (the crash contract covers transient
                # failures, not a batch that can never build an index)
                if (
                    novel.where(
                        is_centroid_id(F.col(id_col), centroid_every)
                    ).limit(1).count()
                    == 0
                ):
                    raise ValueError(
                        "no centroid selectable from the first batch: no "
                        f"id divisible by {centroid_every}; lower "
                        "centroid_every or remap ids"
                    )
                cluster_pairs = _snapshot_cluster_pairs(
                    cluster_src, components_path
                )
                novel.write.mode("append").parquet(corpus_path)
                # assignments then centroids — centroids is the commit
                # marker, so a crash mid-build replays as a rebuild
                ivf_index_write(novel, id_col, vec_col, index_path, centroid_every)
            if cluster_pairs is not None and cluster_pairs.count() > 0:
                from yodel_etl_spark.scale.cluster import update_component_map

                update_component_map(
                    spark,
                    components_path,
                    cluster_pairs,
                    # names the LOGICAL write: a replayed batch
                    # reclaims its own crashed attempt's claim
                    # (see update_component_map's claim lifecycle)
                    writer_token=f"{corpus_path}#{_batch_id}",
                )
        finally:
            release(pairs)

    return land
