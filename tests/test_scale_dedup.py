"""Dedup-family invariants (scale/dedup.py) beyond the driver oracles:
the prefix-filter order must not change results (PPJoin theorem holds
under any total order)."""

from __future__ import annotations

from yodel_etl_spark.scale.dedup import jaccard_pairs
from yodel_etl_spark.session import load_tables


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"], r["n_common"], round(r["jaccard"], 12))
        for r in df.collect()
    }


def test_jaccard_prefix_order_df_equals_lex(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    by_df = _pairs(jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5, prefix_order="df"))
    by_lex = _pairs(jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5, prefix_order="lex"))
    assert by_df == by_lex
    assert by_df  # non-vacuous: sf0.001 documents contain near-dups


def test_jaccard_df_cap_only_drops(spark, sf_small):
    """df-capped (approximate) output is a subset of the exact output."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    exact = _pairs(jaccard_pairs(docs, "doc_id", "text", threshold=0.5))
    capped = _pairs(jaccard_pairs(docs, "doc_id", "text", threshold=0.5, df_cap=20))
    assert capped <= exact


def test_release_frees_operator_caches(spark, sf_small):
    """Operators persist() intermediates; session.release(result) must
    free them all after the caller's final action (the long-lived
    session leak: repeated calls otherwise accumulate cached RDDs)."""
    from yodel_etl_spark.session import release

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    pairs = jaccard_pairs(docs.limit(80), "doc_id", "text")
    pairs.count()
    assert not cm.isEmpty()
    release(pairs)
    assert cm.isEmpty()
    release(pairs)  # idempotent


def test_span_scrub_golden(spark):
    """Hand-computed fixture: a 3-token span shared by two docs survives
    only in the min-id keeper; within-doc repeats are untouched; clean
    docs come back byte-identical; row count is preserved."""
    from yodel_etl_spark.scale.dedup import span_scrub
    from yodel_etl_spark.session import release

    rows = [
        (1, "a b c x y z"),          # keeper of "a b c"
        (2, "a b c q r s"),          # loses "a b c"
        (3, "q r s q r s"),          # within-doc repeat only -> kept whole
        (4, "lone words here"),      # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_scrub(docs, "doc_id", "text", w=3)
    got = {r["doc_id"]: (r["n_segs"], r["n_dropped"], r["text_clean"]) for r in out.collect()}
    release(out)
    # doc 2's "q r s" span also occurs in doc 3 (twice); keeper is doc 2
    assert got[1] == (2, 0, "a b c x y z")
    assert got[2] == (2, 1, "q r s")
    assert got[3] == (2, 2, "")
    assert got[4] == (1, 0, "lone words here")
    assert set(got) == {1, 2, 3, 4}


def test_duplicated_spans_golden(spark):
    """Hand-computed maximal duplicated spans at k=3: a 5-token passage
    shared by two docs is reported ONCE per doc as a maximal run (not as
    three overlapping anchors); a within-doc repeat duplicates too (the
    Lee et al. criterion is corpus-wide occurrence > 1, not cross-doc);
    clean docs report nothing; spans shorter than k are invisible."""
    from yodel_etl_spark.scale.dedup import duplicated_spans
    from yodel_etl_spark.session import release

    rows = [
        (1, "p q r s t u v w"),      # shares "r s t u v" with doc 2
        (2, "x y r s t u v z"),      # ... at a different offset
        (3, "m n o m n o k l"),      # within-doc repeated "m n o" (k=3)
        (4, "all unique words only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_spans(docs, "doc_id", "text", k=3)
    got = {(r["doc_id"], r["start"], r["length"]) for r in out.collect()}
    release(out)
    # doc1 tokens 2..6 = "r s t u v": anchors at pos 2,3,4 -> run start 2 len 5
    # doc2 same passage at pos 2..6 -> start 2 len 5
    # doc3 "m n o" at pos 0 and 3: anchors h("m n o") at 0 and 3 duplicate;
    # they are NOT consecutive (pos 1,2 anchors unique) -> two runs len 3
    assert got == {(1, 2, 5), (2, 2, 5), (3, 0, 3), (3, 3, 3)}


def test_duplicated_spans_duckdb_parity(spark):
    """Independent DuckDB formulation (explicit k-gram windows + the
    same gaps-and-islands) over a deterministic corpus with planted
    cross-doc reprints — every (id, start, length) must agree."""
    import duckdb

    from yodel_etl_spark.scale.dedup import duplicated_spans
    from yodel_etl_spark.session import release

    words = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9".split()
    rows = []
    for i in range(40):
        body = [words[(i * 7 + j * 3) % 10] + str((i * j) % 23) for j in range(30)]
        rows.append((i, " ".join(body)))
    # plant reprints: doc 100+i embeds doc i's tokens 5..20 inside noise
    for i in range(0, 40, 5):
        src = rows[i][1].split()[5:20]
        body = ["n" + str(i), "u" + str(i * 3 + 1)] + src + ["z" + str(i)]
        rows.append((100 + i, " ".join(body)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k = 4
    out = duplicated_spans(docs, "doc_id", "text", k=k)
    got = {(r["doc_id"], r["start"], r["length"]) for r in out.collect()}
    release(out)

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    oracle = con.sql(f"""
        WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM docs
        ), anch AS (
          SELECT doc_id, u.p - 1 AS pos,
                 md5(array_to_string(tk[u.p : u.p + {k} - 1], ' ')) AS h
          FROM tok, UNNEST(generate_series(1, len(tk) - {k} + 1)) AS u(p)
        ), dup AS (
          SELECT h FROM anch GROUP BY h HAVING count(*) > 1
        ), duppos AS (
          SELECT doc_id, pos FROM anch WHERE h IN (SELECT h FROM dup)
        ), runs AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM duppos
        )
        SELECT doc_id, min(pos) AS start, max(pos) - min(pos) + {k} AS length
        FROM runs GROUP BY doc_id, grp
    """).fetchall()
    want = {(int(d), int(s), int(ln)) for d, s, ln in oracle}
    assert got == want and len(got) >= 16  # every planted reprint found twice


def test_scrub_duplicated_spans_golden(spark):
    """Cut semantics at k=3: the doc holding the FIRST occurrence (min
    (id, pos) per anchor) keeps the shared passage; every other
    occurrence is cut; a within-doc repeat keeps its first occurrence;
    clean docs come back byte-identical with n_dropped 0."""
    from yodel_etl_spark.scale.dedup import scrub_duplicated_spans
    from yodel_etl_spark.session import release

    rows = [
        (1, "p q r s t u v w"),            # keeper of "r s t u v" (pos 2)
        (2, "x y r s t u v z"),            # loses tokens 2..6
        (3, "m n o k m n o l m n"),        # within-doc: keeps pos 0 run
        (4, "all unique words only here"), # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = scrub_duplicated_spans(docs, "doc_id", "text", k=3)
    got = {r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"]) for r in out.collect()}
    release(out)
    assert got[1] == (8, 0, "p q r s t u v w")
    assert got[2] == (8, 5, "x y z")
    # doc3 anchors: "m n o" at 0 (keeper) and 4 (redundant); "m n" at 8
    # is not an anchor (needs k=3 tokens: positions 0..7 only; pos 7 =
    # "l m n" unique).  Redundant run {4} cuts tokens 4..6.
    assert got[3] == (10, 3, "m n o k l m n")
    assert got[4] == (5, 0, "all unique words only here")


def test_scrub_duplicated_spans_python_twin(spark):
    """Literal single-process twin (anchor keepers + redundant-run
    cutting) over a corpus with planted reprints and overlapping shared
    passages — (n_tokens, n_dropped, text_clean) must agree exactly."""
    from yodel_etl_spark.scale.dedup import scrub_duplicated_spans
    from yodel_etl_spark.session import release

    words = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9".split()
    rows = []
    for i in range(30):
        body = [words[(i * 7 + j * 3) % 10] + str((i * j) % 19) for j in range(24)]
        rows.append((i, " ".join(body)))
    for i in range(0, 30, 6):  # reprints embedding doc i's tokens 4..16
        src = rows[i][1].split()[4:16]
        rows.append((100 + i, " ".join(["pre" + str(i)] + src + ["post" + str(i)])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k = 4
    out = scrub_duplicated_spans(docs, "doc_id", "text", k=k)
    got = {r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"]) for r in out.collect()}
    release(out)

    # twin
    anch = {}  # h -> list[(id,pos)]
    toks = {i: t.split() for i, t in rows}
    for i, tk in toks.items():
        for p in range(len(tk) - k + 1):
            anch.setdefault(" ".join(tk[p : p + k]), []).append((i, p))
    redundant = {}
    for h, occ in anch.items():
        if len(occ) > 1:
            keep = min(occ)
            for o in occ:
                if o != keep:
                    redundant.setdefault(o[0], set()).add(o[1])
    want = {}
    for i, tk in toks.items():
        drop = set()
        pos = sorted(redundant.get(i, ()))
        runs = []
        for p in pos:
            if runs and p == runs[-1][1]:
                runs[-1] = (runs[-1][0], p + 1)
            else:
                runs.append((p, p + 1))
        for s, e in runs:
            drop.update(range(s, e - 1 + k))
        kept = [t for j, t in enumerate(tk) if j not in drop]
        want[i] = (len(tk), len(drop), " ".join(kept))
    assert got == want
    assert any(v[1] > 0 for v in want.values())  # the plant actually cut


def _jittered_corpus(n=60, jitter_every=None):
    """Deterministic docs; with jitter_every, doc 1000+i is a near-dup
    of doc i (one token appended — high Jaccard at k=3)."""
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(n):
        body = [words[(i * 3 + j * 7) % 10] + str((i + j) % 13) for j in range(20)]
        rows.append((i, " ".join(body)))
    out = list(rows)
    if jitter_every:
        for i in range(0, n, jitter_every):
            out.append((1000 + i, rows[i][1] + " extra" + str(i)))
    return out


def test_minhash_index_probe_matches_batch_run(spark, tmp_path):
    """Probe-vs-index must find exactly the cross pairs the one-shot
    batch run finds on the union corpus (identical banding ⇒ identical
    candidate collisions; hash-set Jaccard ⇒ identical verify)."""
    from yodel_etl_spark.scale.dedup import (
        minhash_lsh_pairs,
        probe_minhash_index,
        write_minhash_index,
    )
    from yodel_etl_spark.session import release

    base_rows = _jittered_corpus(60)
    inc_rows = [(1000 + i, t + " extra" + str(i)) for i, t in base_rows[::6]]
    corpus = spark.createDataFrame(base_rows, "doc_id long, text string")
    incoming = spark.createDataFrame(inc_rows, "doc_id long, text string")

    idx = str(tmp_path / "mh_idx")
    write_minhash_index(corpus, idx)
    hits = probe_minhash_index(spark, idx, incoming, threshold=0.5)
    got = {(r["doc_inc"], r["doc_idx"], round(r["jaccard"], 12)) for r in hits.collect()}
    release(hits)
    assert got  # the jittered twins are found

    both = corpus.unionByName(incoming)
    full = minhash_lsh_pairs(both, "doc_id", "text", threshold=0.5)
    cross = {
        (r["doc_b"], r["doc_a"], round(r["jaccard"], 12))
        for r in full.collect()
        if r["doc_b"] >= 1000 and r["doc_a"] < 1000
    }
    release(full)
    assert got == cross
    # every planted twin is in the hit set
    planted = {i for i, _ in base_rows[::6]}
    assert {x for _, x, _ in got} >= planted


def test_minhash_index_extend_is_delta_only(spark, tmp_path):
    """extend admits a batch; a later probe sees BOTH the original
    corpus and the extension; probing never mutates the index."""
    import os

    from yodel_etl_spark.scale.dedup import (
        extend_minhash_index,
        probe_minhash_index,
        write_minhash_index,
    )
    from yodel_etl_spark.session import release

    rows = _jittered_corpus(40)
    corpus = spark.createDataFrame(rows[:30], "doc_id long, text string")
    batch2 = spark.createDataFrame(
        [(100 + i, t) for i, t in rows[30:]], "doc_id long, text string"
    )
    idx = str(tmp_path / "mh_idx2")
    write_minhash_index(corpus, idx)
    n_banded = spark.read.parquet(f"{idx}/banded").count()

    # probe an exact copy of a batch2 doc BEFORE extending: no hit
    probe_doc = spark.createDataFrame(
        [(9000, rows[35][1])], "doc_id long, text string"
    )
    pre = probe_minhash_index(spark, idx, probe_doc, threshold=0.9)
    assert pre.count() == 0
    release(pre)
    assert spark.read.parquet(f"{idx}/banded").count() == n_banded  # unmutated

    extend_minhash_index(batch2, idx)
    post = probe_minhash_index(spark, idx, probe_doc, threshold=0.9)
    hits = {r["doc_idx"] for r in post.collect()}
    release(post)
    assert 135 in hits  # 100 + 35: the extension is now probe-visible


def test_minhash_index_params_pinned(spark, tmp_path):
    """Probe bands with the INDEX's parameters, not the caller's."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.dedup import write_minhash_index

    corpus = spark.createDataFrame(
        _jittered_corpus(10), "doc_id long, text string"
    )
    idx = str(tmp_path / "mh_idx3")
    write_minhash_index(corpus, idx, num_hashes=32, bands=8, k=2)
    p = spark.read.parquet(f"{idx}/params").collect()[0]
    assert (p["num_hashes"], p["bands"], p["k"]) == (32, 8, 2)
    banded = spark.read.parquet(f"{idx}/banded")
    assert banded.groupBy("doc").count().select(F.max("count")).collect()[0][0] == 8


def test_duplicated_span_sources_attribution(spark):
    """Attribution golden at k=3: doc 2's copied passage attributes to
    doc 1 (the min-(id,pos) keeper); a passage stitched from TWO
    sources reports as two attributed spans; keepers report nothing."""
    from yodel_etl_spark.scale.dedup import duplicated_span_sources
    from yodel_etl_spark.session import release

    rows = [
        (1, "p q r s t u v w"),        # source of "r s t u"
        (2, "x y r s t u z1 z2"),      # copies doc1 tokens 2..5
        (3, "c1 c2 d e f g c3 c4"),    # source of "d e f g"
        (4, "r s t u d e f g"),        # stitched: doc1's + doc3's passage
        (5, "all unique words only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_span_sources(docs, "doc_id", "text", k=3)
    got = {(r["doc_id"], r["start"], r["length"], r["src_id"]) for r in out.collect()}
    release(out)
    # doc2: anchors at pos 2,3 ("r s t","s t u") both keep to doc1 -> one run
    assert (2, 2, 4, 1) in got
    # doc4 is redundant everywhere: "r s t u" from doc1, "d e f g" from doc3
    assert (4, 0, 4, 1) in got
    assert (4, 4, 4, 3) in got
    # "u d e" (pos 3) in doc4 is unique -> splits the two attributions
    assert not any(r[0] == 1 for r in got)   # keepers report nothing
    assert not any(r[0] == 5 for r in got)


def test_hamming_index_probe_matches_batch_run(spark, tmp_path):
    """Probe-vs-index equals the one-shot hamming_pairs cross pairs on
    the union sketch table; extend makes later sketches probe-visible;
    max_distance >= blocks is rejected (recall guarantee)."""
    import pytest as _pytest

    from yodel_etl_spark.scale.dedup import (
        extend_hamming_index,
        hamming_pairs,
        probe_hamming_index,
        write_hamming_index,
    )
    from yodel_etl_spark.session import release

    base = [(i, (i * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF) for i in range(50)]
    # planted near-dups: flip 2 low bits of every 5th sketch
    inc = [(1000 + i, s ^ 0b101) for i, s in base[::5]]
    corpus = spark.createDataFrame(base, "doc long, sim long")
    incoming = spark.createDataFrame(inc, "doc long, sim long")

    idx = str(tmp_path / "hm_idx")
    write_hamming_index(corpus, idx)
    hits = probe_hamming_index(spark, idx, incoming, max_distance=3)
    got = {(r["doc_inc"], r["doc_idx"], r["hamming"]) for r in hits.collect()}
    assert {(d, d - 1000, 2) for d, _ in inc} <= got  # every plant found

    both = corpus.unionByName(incoming)
    full = hamming_pairs(both, "doc", "sim", max_distance=3)
    cross = {
        (r["doc_b"], r["doc_a"], r["hamming"])
        for r in full.collect()
        if r["doc_b"] >= 1000 and r["doc_a"] < 1000
    }
    release(full)
    assert got == cross

    # extend: a sketch identical to an incoming one becomes visible
    extend_hamming_index(incoming, idx)
    again = probe_hamming_index(
        spark, idx, spark.createDataFrame([inc[0]], "doc long, sim long"),
        max_distance=0,
    )
    assert (inc[0][0], inc[0][0], 0) in {
        (r["doc_inc"], r["doc_idx"], r["hamming"]) for r in again.collect()
    }

    with _pytest.raises(ValueError, match="pigeonhole"):
        probe_hamming_index(spark, idx, incoming, max_distance=8)


def test_scrub_to_fixpoint_catches_spliced_duplicates(spark):
    """One pass cannot see a duplicate CREATED by its own cuts: cutting
    doc 2's copied passages splices it into exactly doc 3's text, which
    only the second round can scrub.  The fixpoint wrapper reports the
    cumulative drops and the number of cutting rounds."""
    from yodel_etl_spark.scale.dedup import (
        scrub_duplicated_spans,
        scrub_to_fixpoint,
    )
    from yodel_etl_spark.session import release

    rows = [
        (1, "a b c d"),            # keeper of "a b" and "c d"
        (2, "p a b q c d r"),      # round 1: cuts to "p q r"
        (3, "p q r"),              # round 2: now a duplicate of doc 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # single pass misses the spliced duplicate
    one = scrub_duplicated_spans(docs, "doc_id", "text", k=2)
    single = {r["doc_id"]: r["text_clean"] for r in one.collect()}
    release(one)
    assert single[3] == "p q r"  # untouched in round 1

    out = scrub_to_fixpoint(docs, "doc_id", "text", k=2, max_rounds=5)
    got = {
        r["doc_id"]: (r["text_clean"], r["n_dropped_total"], r["n_rounds"])
        for r in out.collect()
    }
    assert got[1] == ("a b c d", 0, 2)
    assert got[2] == ("p q r", 4, 2)   # lost "a b" and "c d" in round 1
    assert got[3] == ("", 3, 2)        # spliced duplicate cut in round 2


def test_span_operator_plan_shapes(spark):
    """Exchange audit for the exact-substring family: the digest count
    plus the islands window are the only hash exchanges (scrub adds the
    interval-list aggregation), and nothing plans a cartesian product —
    the all-pairs formulation this family exists to avoid."""
    from yodel_etl_spark.scale.dedup import (
        duplicated_spans,
        scrub_duplicated_spans,
    )
    from yodel_etl_spark.session import release

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} common tail tokens here") for i in range(30)],
        "doc_id long, text string",
    )
    for op, max_exchanges in ((duplicated_spans, 3), (scrub_duplicated_spans, 5)):
        out = op(docs, "doc_id", "text", k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, op.__name__
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex <= max_exchanges, (op.__name__, n_ex)
        release(out)
