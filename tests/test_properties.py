"""Property-based parity (hypothesis): the higher-order-expression
operators against direct Python models of the reference's imperative
walks (extract_chat_qa_tsv.py:84-129, normalize_parks_json.py:50-58).

Each example generates a BATCH of inputs and compares in one Spark job
(per-example jobs would be ~0.5 s each; batches keep the suite fast).

Alphabets are restricted to printable ASCII + tab/CR/LF: Python
``str.strip()`` trims every Unicode whitespace while Spark ``trim``
trims ASCII spaces only — a known, documented divergence outside the
reference's data domain (its feeds are ASCII service payloads).
"""

from __future__ import annotations

import os
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yodel_etl_spark.ops.classify import tristate
from yodel_etl_spark.ops.sessionize import first_qa

# ----------------------------------------------------------- models
_WS = re.compile(r"[\t\r\n]")


def _clean(s: str | None) -> str:
    return _WS.sub(" ", s or "").strip(" ")


def model_first_qa(msgs: list[tuple[str | None, str | None]]) -> tuple[str, str]:
    """Literal model of the reference walk: drop leading assistant
    greeting, find first user message, concat contiguous non-empty
    assistant replies after it."""
    if msgs and msgs[0][0] == "assistant":
        msgs = msgs[1:]
    uidx = next((i for i, m in enumerate(msgs) if m[0] == "user"), None)
    if uidx is None:
        return "", ""
    q = _clean(msgs[uidx][1])
    parts: list[str] = []
    for role, content in msgs[uidx + 1 :]:
        if role != "assistant":
            break
        p = _clean(content)
        if p:
            parts.append(p)
    return q, " ".join(parts)


def model_tristate(text: str | None, keywords: list[str]) -> str:
    s = (text or "").lower()
    yes = r"\b(?:" + "|".join(re.escape(k) for k in keywords) + r")\b"
    no = r"\bno\s+(?:" + "|".join(re.escape(k) for k in keywords) + r")\b"
    if re.search(yes, s):
        return "Yes"
    if re.search(no, s):
        return "No"
    return "Don't Know"


# ------------------------------------------------------- strategies
_content = st.one_of(
    st.none(),
    st.text(alphabet="abcdefghij XY.,!?\t\r\n", max_size=12),
)
_role = st.sampled_from(["user", "assistant", "system", "", None])
_messages = st.lists(st.tuples(_role, _content), max_size=8)

MSG_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField(
            "messages",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("role", T.StringType()),
                        T.StructField("content", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_messages, min_size=5, max_size=40))
def test_first_qa_matches_reference_walk(spark, sessions):
    rows = [(i, [{"role": r, "content": c} for r, c in msgs]) for i, msgs in enumerate(sessions)]
    df = spark.createDataFrame(rows, MSG_SCHEMA)
    got = {
        r["i"]: (r["qa"]["user_question"], r["qa"]["assistant_response"])
        for r in df.select("i", first_qa(F.col("messages")).alias("qa")).collect()
    }
    for i, msgs in enumerate(sessions):
        assert got[i] == model_first_qa(msgs), f"session {i}: {msgs!r}"


_kw_word = st.text(alphabet="abcdef", min_size=2, max_size=6)
_keywords = st.lists(
    st.one_of(_kw_word, st.tuples(_kw_word, _kw_word).map(lambda t: f"{t[0]} {t[1]}")),
    min_size=1,
    max_size=4,
    unique=True,
)
_subject = st.one_of(
    st.none(),
    st.text(alphabet=st.sampled_from(list("abcdef no.,")), max_size=30),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_keywords, st.lists(_subject, min_size=5, max_size=60))
def test_tristate_matches_reference_select(spark, keywords, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, txt string")
    got = {r["i"]: r["cls"] for r in df.select("i", tristate("txt", keywords).alias("cls")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == model_tristate(t, keywords), f"{t!r} vs {keywords!r}"


def test_chunk_tokens_invariants(spark, sf_small):
    """Chunking invariants: (a) concatenating each doc's chunks with the
    overlap removed reproduces the doc's token stream exactly; (b) every
    chunk except the last has exactly chunk_size tokens; (c) a short doc
    yields one chunk; (d) (doc_id, chunk_id) is a key."""
    from yodel_etl_spark.scale.textstats import chunk_tokens, tokens
    from yodel_etl_spark.session import load_tables

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    out = chunk_tokens(docs, "doc_id", "text", chunk_size=64, overlap=16).collect()
    truth = {
        r["doc_id"]: r["tk"]
        for r in docs.select("doc_id", tokens(F.col("text")).alias("tk")).collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(truth)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))  # key + dense
        rebuilt: list[str] = []
        for i, r in enumerate(rows):
            toks = r["chunk_text"].split() if r["chunk_text"] else []
            assert r["n_tokens"] == len(toks)
            if i < len(rows) - 1:
                assert len(toks) == 64
            rebuilt.extend(toks if i == 0 else toks[16:])
        assert rebuilt == truth[doc_id], doc_id


# ---------------------------------------------------- span scrub model
def model_span_scrub(docs: list[tuple[int, str]], w: int = 3):
    """Direct Python model: non-overlapping w-token windows (split on a
    single literal space, empties kept — Spark split(' ') semantics); a
    span in >1 doc survives only in the min-id owner."""
    from collections import defaultdict

    per_doc = {}
    for did, text in docs:
        toks = text.split(" ")
        n = (len(toks) + w - 1) // w
        per_doc[did] = [" ".join(toks[s * w : (s + 1) * w]) for s in range(n)]
    owners = defaultdict(set)
    for did, segs in per_doc.items():
        for s in segs:
            owners[s].add(did)
    out = {}
    for did, segs in per_doc.items():
        kept = [s for s in segs if len(owners[s]) == 1 or did == min(owners[s])]
        out[did] = (len(segs), len(segs) - len(kept), " ".join(kept))
    return out


_span_word = st.sampled_from(["a", "b", "ab"])
_span_text = st.lists(_span_word, min_size=1, max_size=9).map(" ".join)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_span_text, min_size=1, max_size=8))
def test_span_scrub_matches_model(spark, texts):
    """Tiny 2-letter alphabet forces heavy span collisions — the model
    and the operator must agree on every doc: counts AND rebuilt text."""
    from yodel_etl_spark.scale.dedup import span_scrub
    from yodel_etl_spark.session import release

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = span_scrub(df, "doc_id", "text", w=3)
    got = {
        r["doc_id"]: (r["n_segs"], r["n_dropped"], r["text_clean"])
        for r in out.collect()
    }
    release(out)
    assert got == model_span_scrub(docs)


# -------------------------------------------------- domain mix model
def model_domain_mix(rows: list[tuple[int, str]], budget_pct: int = 50):
    """Direct Python model of domain_mix_resample: integer sqrt-weight
    lattice, per-domain basis-point rates, md5 bucket membership."""
    import hashlib
    import math
    from collections import Counter

    n_s = Counter(d for _, d in rows)
    w_s = {d: int(math.floor(math.sqrt(float(n)) * 1000000.0)) for d, n in n_s.items()}
    n_tot, w_tot = sum(n_s.values()), sum(w_s.values())
    rate = {
        d: min(
            10000,
            int(
                math.floor(
                    float(budget_pct * 100) * float(n_tot) * float(w_s[d])
                    / (float(w_tot) * float(n_s[d]))
                )
            ),
        )
        for d in n_s
    }
    kept = set()
    for k, d in rows:
        h16 = int(hashlib.md5(f"{d}|{k}".encode()).hexdigest()[:4], 16)
        if h16 * 10000 < rate[d] * 65536:
            kept.add(k)
    return kept, rate


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.sampled_from(["x", "y", "zz"]), min_size=1, max_size=40),
    st.sampled_from([0, 25, 50, 100]),
)
def test_domain_mix_matches_model(spark, domains, budget_pct):
    from yodel_etl_spark.scale.sampling import domain_mix_resample

    rows = list(enumerate(domains))
    df = spark.createDataFrame(rows, "k long, dom string")
    out = domain_mix_resample(df, "k", "dom", budget_pct=budget_pct)
    got = {(r["k"], r["rate_bp"]) for r in out.select("k", "rate_bp").collect()}
    kept, rate = model_domain_mix(rows, budget_pct)
    assert {k for k, _ in got} == kept
    assert all(rb == rate[dict(rows)[k]] for k, rb in got)


# ------------------------------------------------------ WAV (pure python)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200
    ),
    channels=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_pack_decode_roundtrip_property(samples, channels, rate):
    """Any int16 sample grid survives pack→parse→decode bit-exactly
    (trailing partial frames are dropped, never mangled)."""
    import numpy as np

    from yodel_etl_spark.scale.audio import decode_wav_samples, wav_pack

    n = (len(samples) // channels) * channels
    arr = np.array(samples[:n], dtype=np.int64).reshape(-1, channels)
    out = decode_wav_samples(wav_pack(arr, sample_rate=rate, bits=16))
    assert out.shape == arr.shape
    assert (out == arr).all()


@given(
    coords=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=20, deadline=None)
def test_zorder_value_matches_python_morton(spark, coords):
    """The column-algebra bit interleave equals a literal python Morton
    encode for 2x8-bit coordinates."""
    from yodel_etl_spark.io.layout import zorder_value

    def morton(a: int, b: int) -> int:
        z = 0
        for j in range(8):
            z |= ((a >> j) & 1) << (2 * j) | ((b >> j) & 1) << (2 * j + 1)
        return z

    df = spark.createDataFrame(coords, "a int, b int")
    got = [
        r["z"]
        for r in df.select(
            zorder_value([F.col("a"), F.col("b")], bits=8).alias("z")
        ).collect()
    ]
    assert got == [morton(a, b) for a, b in coords]


# --------------------------------------- exact-substring span models
def model_duplicated_spans(docs: list[tuple[int, str]], k: int):
    anch: dict[str, list[tuple[int, int]]] = {}
    toks = {i: t.split() for i, t in docs}
    for i, tk in toks.items():
        for p in range(len(tk) - k + 1):
            anch.setdefault(" ".join(tk[p : p + k]), []).append((i, p))
    duppos: dict[int, set] = {}
    for occ in anch.values():
        if len(occ) > 1:
            for i, p in occ:
                duppos.setdefault(i, set()).add(p)
    spans = set()
    for i, pos in duppos.items():
        run: list[int] = []
        for p in sorted(pos) + [None]:
            if run and (p is None or p != run[-1] + 1):
                spans.add((i, run[0], run[-1] - run[0] + k))
                run = []
            if p is not None:
                run.append(p)
    return spans


def model_scrub_spans(docs: list[tuple[int, str]], k: int):
    anch: dict[str, list[tuple[int, int]]] = {}
    toks = {i: t.split() for i, t in docs}
    for i, tk in toks.items():
        for p in range(len(tk) - k + 1):
            anch.setdefault(" ".join(tk[p : p + k]), []).append((i, p))
    red: dict[int, set] = {}
    for occ in anch.values():
        if len(occ) > 1:
            keep = min(occ)
            for o in occ:
                if o != keep:
                    red.setdefault(o[0], set()).add(o[1])
    out = {}
    for i, tk in toks.items():
        drop: set[int] = set()
        for p in red.get(i, ()):
            drop.update(range(p, p + k))
        kept = [t for j, t in enumerate(tk) if j not in drop]
        out[i] = (len(tk), len(drop), " ".join(kept))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=14).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_duplicated_spans_matches_model(spark, texts):
    """Two-letter alphabet forces heavy anchor collisions (within-doc
    AND cross-doc): the islands operator must agree with the direct
    model on every (id, start, length) triple; the scrub must agree on
    every rebuilt text.  Scrub drop-coverage note: the model drops
    range(p, p+k) per redundant POSITION, which equals the operator's
    per-run [p0, p1+k) cover because runs are exactly the maximal
    consecutive position sets."""
    from yodel_etl_spark.scale.dedup import duplicated_spans, scrub_duplicated_spans
    from yodel_etl_spark.session import release

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k = 3
    out = duplicated_spans(df, "doc_id", "text", k=k)
    got = {(r["doc_id"], r["start"], r["length"]) for r in out.collect()}
    release(out)
    assert got == model_duplicated_spans(docs, k)

    out2 = scrub_duplicated_spans(df, "doc_id", "text", k=k)
    got2 = {
        r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"])
        for r in out2.collect()
    }
    release(out2)
    assert got2 == model_scrub_spans(docs, k)


# ------------------------------------------------ unigram viterbi model
@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abc", min_size=1, max_size=9),
    st.dictionaries(
        st.text(alphabet="abc", min_size=2, max_size=4),
        st.integers(min_value=-900_000, max_value=-100_000),
        max_size=8,
    ),
)
def test_viterbi_is_optimal_vs_bruteforce(word, extra):
    """The DP must return a maximum-score segmentation among ALL
    segmentations under the table (chars scored, unknown chars at the
    UNK floor), with total equal to the brute-force optimum."""
    from yodel_etl_spark.scale.unigram import UNK_MICRO_NATS, viterbi_segment

    scores = {c: -200_000 for c in "ab"}  # 'c' is an unknown char
    scores.update(extra)

    def seg_score(piece):
        s = scores.get(piece)
        if s is None and len(piece) == 1:
            return UNK_MICRO_NATS
        return s

    best = None
    n = len(word)

    def rec(i, total):
        nonlocal best
        if i == n:
            best = total if best is None or total > best else best
            return
        for j in range(i + 1, min(i + 4, n) + 1):
            s = seg_score(word[i:j])
            if s is not None:
                rec(j, total + s)

    rec(0, 0)
    pieces, total = viterbi_segment(word, scores, 4)
    assert "".join(pieces) == word
    assert total == best
    assert sum(seg_score(p) for p in pieces) == total


# ------------------------------------------------- rollup upsert ≡ recompute
_fact = st.tuples(
    st.sampled_from(["d1", "d2", "d3", None]),       # partition (incl. null)
    st.sampled_from(["a", "b"]),                     # key
    st.one_of(st.none(), st.integers(-10_000, 10_000)),  # value (incl. null)
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_fact, min_size=1, max_size=40),
    st.integers(1, 4),  # number of delta batches
)
def test_rollup_upsert_sequence_matches_recompute(spark, tmp_path_factory, facts, k):
    """ANY split of the fact stream into sequential deltas must fold to
    the same rollup as one recompute — across every supported aggregate
    kind at once (sum/count/min/max and avg via the stored __sum/__cnt
    pair), null partition values, null sources, and all-null groups."""
    from pyspark.sql import functions as F2

    from yodel_etl_spark.io.rollup import read_rollup, upsert_rollup

    aggs = {
        "s": ("sum", "v"),
        "n": ("count", None),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
        "m": ("avg", "v"),
    }
    path = str(tmp_path_factory.mktemp("rollup_prop") / "t")
    schema = "d string, k string, v long"
    cuts = sorted({min(i * len(facts) // k, len(facts)) for i in range(1, k)})
    batches, prev = [], 0
    for c in [*cuts, len(facts)]:
        if c > prev:
            batches.append(facts[prev:c])
            prev = c
    for b in batches:
        upsert_rollup(spark, path, spark.createDataFrame(b, schema), "d", ["k"], aggs)
    got = {
        (r["d"], r["k"]): (r["s"], r["n"], r["lo"], r["hi"], r["m"])
        for r in read_rollup(spark, path, aggs).collect()
    }
    want = {
        (r["d"], r["k"]): (r["s"], r["n"], r["lo"], r["hi"], r["m"])
        for r in spark.createDataFrame(facts, schema)
        .groupBy("d", "k")
        .agg(
            F2.sum("v").alias("s"),
            F2.count(F2.lit(1)).alias("n"),
            F2.min("v").alias("lo"),
            F2.max("v").alias("hi"),
            (F2.sum("v") / F2.count("v")).alias("m"),
        )
        .collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_component_map_fold_matches_one_shot(spark, tmp_path_factory, batches):
    """Random pair batches folded through update_component_map must
    equal connected_components over the UNION of all batches —
    transitive closure is associative, and the versioned fold must not
    depend on how history was sliced (self-loops and duplicate pairs
    included, as the ingest gates' replays produce them)."""
    from yodel_etl_spark.scale.cluster import (
        connected_components,
        read_component_map,
        update_component_map,
    )

    path = str(tmp_path_factory.mktemp("cmap_prop") / "map")
    seen: list[tuple[int, int]] = []
    for b in batches:
        pairs = [(a, c) for a, c in b if a != c]
        if not pairs:
            continue
        seen.extend(pairs)
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        update_component_map(spark, path, df)
    got_df = read_component_map(spark, path)
    got = (
        {}
        if got_df is None
        else {r["node"]: r["component"] for r in got_df.collect()}
    )
    want = (
        {}
        if not seen
        else {
            r["node"]: r["component"]
            for r in connected_components(
                spark.createDataFrame(seen, "doc_a long, doc_b long")
            ).collect()
        }
    )
    assert got == want


# ------------------------------------- maintenance family interleavings
_mrow = st.tuples(
    st.one_of(st.none(), st.integers(0, 20)),  # key (incl. null)
    st.one_of(st.none(), st.integers(0, 2)),   # partition (incl. null leaf)
)
_mop = st.one_of(
    st.tuples(st.just("append"), st.lists(_mrow, min_size=1, max_size=12)),
    st.tuples(st.just("vacuum"), st.just(None)),
    st.tuples(st.just("delete"), st.integers(0, 22)),
    st.tuples(st.just("relayout"), st.just(None)),
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_mrow, min_size=1, max_size=12),  # initial corpus
    st.lists(_mop, min_size=1, max_size=4),
)
def test_maintenance_interleavings_match_model(
    spark, tmp_path_factory, first, ops
):
    """ANY interleaving of append / per-leaf vacuum / predicate delete
    / scoped re-layout over a partitioned corpus must track a literal
    Python multiset model: vacuum collapses (key, leaf) duplicates,
    delete removes k >= t rows and keeps NULL-key rows, re-layout
    keeps exactly one row per key whose leaf is one of that key's
    candidate leaves (which copy survives is unspecified — the model
    adopts the actual pick before continuing), and every report's
    rows_after equals the model size.  Null keys and the null
    partition leaf ride along throughout."""
    from collections import Counter

    from yodel_etl_spark.io.compact import (
        delete_parquet_where,
        relayout_parquet,
        vacuum_parquet,
    )

    path = str(tmp_path_factory.mktemp("maint_prop") / "t")
    schema = "k long, part long"
    model: Counter = Counter()

    def append(rows):
        spark.createDataFrame(rows, schema).coalesce(2).write.mode(
            "append"
        ).partitionBy("part").parquet(path)
        model.update(rows)

    def read_counter() -> Counter:
        import os as _os

        if not any(
            f.endswith(".parquet")
            for _dp, _dn, fns in _os.walk(path)
            for f in fns
        ):
            return Counter()
        return Counter(
            (r["k"], r["part"])
            for r in spark.read.parquet(path).collect()
        )

    append(first)
    for op, arg in ops:
        if op == "append":
            append(arg)
        elif op == "vacuum":
            if not model:
                continue
            rep = vacuum_parquet(spark, path, ["k"], per_leaf=True)
            model = Counter(set(model))
            assert rep["rows_after"] == sum(model.values())
        elif op == "delete":
            if not model:
                continue
            rep = delete_parquet_where(spark, path, f"k >= {arg}")
            model = Counter(
                {
                    (k, p): c
                    for (k, p), c in model.items()
                    if k is None or k < arg
                }
            )
            assert rep["rows_after"] == sum(model.values())
        elif op == "relayout":
            if not model:
                continue
            rep = relayout_parquet(spark, path, ["k"])
            got = read_counter()
            want_keys = {k for k, _p in model}
            cand = {
                k: {p for kk, p in model if kk == k} for k in want_keys
            }
            assert rep["rows_after"] == len(want_keys)
            assert set(got.values()) <= {1}
            assert {k for k, _p in got} == want_keys
            for k, p in got:
                assert p in cand[k], (k, p, cand[k])
            model = got  # adopt the unspecified survivor picks
            continue
        assert read_counter() == model


# ------------------------- partition membership fast path vs scan truth
_nasty_part = st.sampled_from(
    [
        "1", "01", "001", "10", "1_0", " 7", "7 ", "+8", "-3",
        "nan", "NaN", "inf", "0.5", ".5", "5.", "1e2", "0x1f",
        "2024-01-02", "2024-1-2", "abc", "B", "true", "00",
    ]
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_nasty_part, min_size=2, max_size=5, unique=True),
    st.integers(0, 4),
)
def test_partition_membership_matches_scan_truth(
    spark, tmp_path_factory, values, pick
):
    """The delete fast path's driver-side membership (typed by strict
    regex gates mirroring Spark's partition-value inference, cast
    INSIDE Spark) must agree with the scan path for ANY partition
    value spelling — leading zeros, underscores (Python's int() is
    laxer than the JVM), whitespace, nan/inf, date-ish strings.  When
    the probe cannot prove parity it must return None (scan fallback),
    never a wrong verdict; when it answers, every leaf's verdict is
    exactly the scan's all-or-nothing truth.

    Scan truth here is the operator's OWN exact path: ONE whole-table
    read (``_batched_leaf_counts``'s shape) whose partition column is
    typed by inference over ALL leaves, folded to leaf grain by
    ``input_file_name``.  A per-leaf ``basePath`` read is NOT the
    operator's semantics — inference over one leaf's value can type
    the column differently (leaf ``part=1`` alone is int while
    {'0.5','1'} is double table-wide) and under ANSI the pivot cast
    then throws where the table-typed compare answers."""
    from urllib.parse import unquote, urlparse

    from yodel_etl_spark.io.compact import (
        _fs_for,
        _partition_only_membership,
    )

    path = str(tmp_path_factory.mktemp("member_prop") / "t")
    rows = [(i, v) for v in values for i in range(3)]
    spark.createDataFrame(rows, "k long, part string").write.partitionBy(
        "part"
    ).parquet(path)
    fs = _fs_for(spark, path)
    leaves = fs.leaf_dirs(path)
    pivot = values[pick % len(values)]
    conds = [
        F.col("part") == F.lit(pivot),
        F.col("part") != F.lit(pivot),
        F.col("part") < F.lit(pivot),
        F.col("part").isNull(),
    ]
    tbl = spark.read.parquet(path)
    for cond in conds:
        got = _partition_only_membership(spark, path, leaves, cond)
        if got is None:
            continue  # routed to the exact scan path — always safe
        assert set(got) == set(leaves)
        per_file = (
            tbl.groupBy(F.input_file_name().alias("__f"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cond.cast("long")).alias("m"),
            )
            .collect()
        )
        counts: dict[str, list[int]] = {leaf: [0, 0] for leaf in leaves}
        for r in per_file:
            leaf = os.path.dirname(unquote(urlparse(r["__f"]).path))
            counts[leaf][0] += int(r["n"])
            counts[leaf][1] += int(r["m"] or 0)
        for leaf in leaves:
            n, m = counts[leaf]
            assert m in (0, n), "partition-only predicate must be all-or-nothing"
            assert got[leaf] == (m == n), (
                leaf,
                str(cond),
                got[leaf],
                (m, n),
            )
