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
    "decontam_train_overlap",
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
