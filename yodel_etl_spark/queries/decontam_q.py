"""Benchmark-decontamination query: train-split documents sharing
5-gram keys with the test split (eval set), per scale/decontam.py's
broadcast n-gram membership join.  Self-contained on the ``documents``
table via the same deterministic md5 hash split the sampling family
uses, so the oracle checks actual contaminated-doc membership."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.decontam import contaminated_docs, eval_gram_set, ngram_keys
from yodel_etl_spark.scale.sampling import hash_split
from yodel_etl_spark.scale.textstats import tokens
from yodel_etl_spark.session import load_tables, spread

_N = 5

#: hyperplane-LSH banding for decontam_semantic: (bands, bits-per-band).
#: 12 x 16 is tuned to THIS corpus's bimodal cosine gap (planted twins
#: ~0.9998); a real near-threshold distribution should flip to 32 x 8 —
#: recall at cos 0.9 rises ~0.65 -> 0.99998 at higher candidate volume
#: (both figures pinned executable in
#: tests/test_scale_similarity.py::test_lsh_near_threshold_recall_32x8_bands).
SEMANTIC_BANDS = 12
SEMANTIC_BAND_BITS = 16

_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
      FROM (
        SELECT doc_id, text,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS b
        FROM documents
      )
    ),
    grams AS (
      SELECT doc_id, split,
             list_distinct(list_transform(range(1, greatest(len(tk) - {_N - 1}, 0) + 1),
               i -> md5(array_to_string(tk[i:i+{_N - 1}], ' ')))) AS gs
      FROM toks
    ),
    ev AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE split = 'test'),
    corpus AS (
      SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, unnest(gs) AS g
      FROM grams WHERE split = 'train'
    )
    SELECT doc_id, n_grams, count(*) AS n_overlap
    FROM corpus JOIN ev USING (g)
    GROUP BY doc_id, n_grams
"""


@register(
    "decontam",
    oracle=_ORACLE,
    doc=f"Benchmark decontamination (GPT-3/PaLM-style {_N}-gram overlap "
    "scrub): the test split's distinct n-gram md5 keys broadcast "
    "against the exploded train-side n-grams — the explode pipelines "
    "inside the scan stage and the broadcast join doubles as the "
    "filter, so clean docs (the overwhelming majority) never shuffle; "
    "only (doc, gram) hits reach the per-doc count.  Eval sets are "
    "small by nature, so the broadcast never outgrows its range; if it "
    "did, the identical plan degrades to a shuffle hash join on the "
    "gram key.  md5 gram keys are bit-identical across engines, so the "
    "oracle checks contaminated-doc membership exactly.",
    tags=("decontam", "dedup", "scale"),
    bench=True,
)
def decontam_train_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    split = hash_split(docs, "doc_id")
    staged = split.select("doc_id", "split", tokens(F.lower(F.col("text"))).alias("tkl"))
    grams = staged.select(
        "doc_id", "split", ngram_keys(F.col("tkl"), _N).alias("grams")
    )
    eval_g = eval_gram_set(grams.where(F.col("split") == "test"))
    corpus = grams.where(F.col("split") == "train")
    return contaminated_docs(corpus, eval_g, "doc_id")


_SEMANTIC_ORACLE = """
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    t AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(range(1, len(embedding) + 1),
               i -> 0.98 * CAST(embedding[i] AS DOUBLE)
                    + 0.02 * CAST(embedding[(i % len(embedding)) + 1] AS DOUBLE))
               AS embedding
      FROM e WHERE vec_id % 10 = 0
    ),
    u AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM e
      UNION ALL SELECT * FROM t
    ),
    n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding, x -> x * x))) AS nrm,
             CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS bk
      FROM u
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bk AS ba, b.bk AS bb,
             round(list_sum(list_transform(range(1, len(a.embedding) + 1),
                     i -> a.embedding[i] * b.embedding[i]))
                   / (a.nrm * b.nrm), 6) AS cosine_r
      FROM n a, n b
      WHERE a.vec_id < b.vec_id
        AND list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> a.embedding[i] * b.embedding[i]))
            / (a.nrm * b.nrm) >= 0.9
    )
    SELECT CASE WHEN ba < 90 THEN id_a ELSE id_b END AS vec_id,
           count(*) AS n_eval_hits, max(cosine_r) AS max_cosine
    FROM p WHERE (ba >= 90) <> (bb >= 90)
    GROUP BY 1
"""


@register(
    "decontam_semantic",
    oracle=_SEMANTIC_ORACLE,
    doc="Embedding-level benchmark decontamination — the semantic twin "
    "of the lexical n-gram scrub (paraphrased eval leakage that shares "
    "no 5-gram still has cos ≈ 1 to its source): corpus vectors whose "
    "cosine to ANY held-out eval vector (md5 bucket ≥ 90 — the same "
    "pure-function split the sampling family uses, so membership needs "
    "no join) reaches 0.9, found via the banded hyperplane-LSH "
    "candidate path (12 × 16-bit bands; recall 1 holds on THIS corpus's "
    "bimodal cosine gap — planted twins ≈ 0.9998, everything else "
    "< 0.6, as _with_planted_twins documents.  At band parameters "
    "12 × 16 a true pair sitting right at cos 0.9 is caught only ~65% "
    "of the time; a real-data distribution with near-threshold pairs "
    "needs more/shorter bands — flip SEMANTIC_BANDS/SEMANTIC_BAND_BITS "
    "to 32 × 8 to lift recall at cos 0.9 above 0.999 at materially "
    "higher random-pair candidate volume, all absorbed by the exact "
    "verify; both recall figures are pinned EXECUTABLE on planted "
    "cos-0.9 pairs in tests/test_scale_similarity.py) + exact "
    "cosine verify, then filtered to cross-split pairs and rolled up "
    "per corpus vector (hit count, worst cosine).  Candidates stay "
    "O(n); no full-corpus broadcast anywhere.  The oracle is the "
    "brute-force cross join at driver SF.  Tier 2: yields its "
    "driver-window slot; parity via pytest oracle suite + driver-sim.",
    tags=("decontam", "similarity", "scale"),
    bench=True,
    tier=2,
)
def decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.queries.scale_dedup import _with_planted_twins
    from yodel_etl_spark.scale.sampling import hash_bucket
    from yodel_etl_spark.scale.similarity import hyperplane_lsh_pairs

    emb = spread(load_tables(spark, sf_dir, ("embeddings",))["embeddings"])
    corpus = _with_planted_twins(emb)
    pairs = hyperplane_lsh_pairs(
        corpus,
        "vec_id",
        "embedding",
        threshold=0.9,
        n_planes=SEMANTIC_BANDS * SEMANTIC_BAND_BITS,
        blocks=SEMANTIC_BANDS,
        vectorized_sketch=True,
    )
    ba = hash_bucket(F.col("id_a"), 100)
    bb = hash_bucket(F.col("id_b"), 100)
    cross = pairs.where((ba >= 90) != (bb >= 90))
    contaminated = cross.select(
        F.when(ba < 90, F.col("id_a")).otherwise(F.col("id_b")).alias("vec_id"),
        "cosine_r",
    )
    return contaminated.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        F.max("cosine_r").alias("max_cosine"),
    )
