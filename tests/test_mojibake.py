"""fix_mojibake: repair goldens, provable-safety of the decode guard
(Spark 4 decode raises on malformed input — the validity regex must
never let such a row through), no-false-positive properties on real
Latin-1 / CJK / ASCII text, and idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.textstats import fix_mojibake


def moji(s: str) -> str:
    """UTF-8 bytes mis-decoded as Latin-1 — how mojibake is born."""
    return s.encode("utf-8").decode("latin-1")


CASES = [
    # (input, expected)
    (moji("café"), "café"),
    (moji("naïve résumé"), "naïve résumé"),
    (moji("don’t — stop…"), "don’t — stop…"),  # cp1252-range punctuation
    (moji("深度学习 mixed ascii"), "深度学习 mixed ascii"),  # CJK via 3-byte seqs
    (moji("emoji 🎉 four-byte"), "emoji 🎉 four-byte"),
    ("clean ascii stays", "clean ascii stays"),
    ("ô legit accent", "ô legit accent"),  # real Latin-1 prose: untouched
    ("Ça va? Très bien.", "Ça va? Très bien."),  # real French: untouched
    ("broken Ã", "broken Ã"),  # lead byte, invalid continuation: untouched
    ("深度学习", "深度学习"),  # >U+00FF: untouched
    ("", ""),
]


def test_fix_mojibake_goldens_and_safety(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["t"])
    got = {
        r["t"]: r["f"]
        for r in df.select("t", fix_mojibake(F.col("t")).alias("f")).collect()
    }
    for inp, want in CASES:
        assert got[inp] == want, repr(inp)


def test_fix_mojibake_idempotent_and_double_layer(spark):
    once = moji("café")
    twice = moji(once)  # double-encoded
    df = spark.createDataFrame([(once,), (twice,)], ["t"])
    fixed1 = df.select(fix_mojibake(F.col("t")).alias("f"))
    fixed2 = fixed1.select(fix_mojibake(F.col("f")).alias("f"))
    vals2 = sorted(r["f"] for r in fixed2.collect())
    # two applications fully repair both the single and double layer...
    assert vals2 == sorted(["café", "café"])
    # ...and a third pass is a no-op (clean text never re-decodes)
    vals3 = sorted(r["f"] for r in fixed2.select(fix_mojibake(F.col("f")).alias("f")).collect())
    assert vals3 == vals2


def test_fix_mojibake_never_raises_on_lead_bytes(spark):
    """Adversarial rows full of lead/continuation chars in invalid
    orders must pass through untouched — if the guard ever let one
    reach decode(), Spark 4 would raise MALFORMED_CHARACTER_CODING."""
    rows = [
        ("Ã",), ("ÃÃÃ",), ("âx",), ("ð",), ("í ",),
        ("À",),  # C0 overlong lead is never valid
        ("ô¿¿¿",),  # F4 with out-of-cap continuation
    ]
    df = spark.createDataFrame(rows, ["t"])
    got = [r["f"] for r in df.select(fix_mojibake(F.col("t")).alias("f")).collect()]
    assert got == [r[0] for r in rows]


def test_curate_fix_encoding_repairs_then_filters(spark):
    """cfg.fix_encoding=True: mojibake pages repair BEFORE signals, so
    a wrecked-but-good English doc survives quality/lang gates it would
    otherwise fail, and its text lands clean; default config leaves
    text byte-identical (the registered oracle's behavior)."""
    from yodel_etl_spark.pipelines.curate import CurateConfig, curate

    good = (
        "the café and the dog walked out of a quiet village and spoke "
        "of the weather and a long road to the sea with a friend"
    )
    rows = [(1, moji(good)), (2, good)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate(docs, cfg=CurateConfig(fix_encoding=True)).select("doc_id", "text")
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # both repair to the SAME text -> exact dedup keeps only doc 1
    assert got == {1: good}
    # default: no repair — the mojibake row keeps its wrecked bytes
    out2 = curate(docs).select("doc_id", "text")
    got2 = {r["doc_id"]: r["text"] for r in out2.collect()}
    assert got2.get(2) == good and got2.get(1, None) in (None, moji(good))
