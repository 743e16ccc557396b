"""End-to-end corpus-curation query: quality/repetition/lang filters →
fingerprint dedup → eval-split decontamination, per
pipelines/curate.py.  The whole composition is exact, so the oracle is
the same four stages assembled from the fragments the individual
signal queries already verify.

Registered at tier 2: the composition yields its driver-window slot to
the 50 established single-operator queries (its pieces are each
driver-checked there); the full chain is still oracle-verified by the
pytest parity suite and the driver-sim at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.pipelines.curate import CurateConfig, curate
from yodel_etl_spark.queries.scale_text import (
    _ARGMAX,
    _GREATEST,
    _HITS,
    _STOP,
    TOK_LOWER_SQL,
    TOK_SQL,
)
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables, spread

_CFG = CurateConfig()
_LANG_IN = ", ".join(f"'{lang}'" for lang in _CFG.allowed_langs)

_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, text,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS b
      FROM documents
    ),
    toks AS (
      SELECT doc_id, text,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
             {TOK_SQL} AS tk,
             {TOK_LOWER_SQL} AS tkl
      FROM base
    ),
    counted AS (
      SELECT doc_id, text, split, tk, tkl,
             length(text) AS n_chars,
             len(tk) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
             len(list_filter(tk, t -> list_contains({_STOP}, lower(t)))) AS n_stopwords,
             list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
               i -> array_to_string(tk[i:i+1], ' ')) AS g2,
             list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
               i -> array_to_string(tk[i:i+2], ' ')) AS g3,
             {_HITS}
      FROM toks
    ),
    sig AS (
      SELECT doc_id, split, tkl,
             greatest(least(
               CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 1.0 ELSE 0.0 END * 0.4
               + CASE WHEN CAST(n_tokens AS DOUBLE) > 0
                      THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 0.2
               + CASE WHEN n_chars > 0
                      THEN CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 0.4
               - CASE WHEN n_chars > 0
                      THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 0.5,
             1.0), 0.0) AS quality,
             CASE WHEN len(g2) > 0
                  THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
                  ELSE 0.0 END AS rep_2gram_frac,
             CASE WHEN len(g3) > 0
                  THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
                  ELSE 0.0 END AS rep_3gram_frac,
             CASE WHEN {_GREATEST} = 0 THEN 'und' {_ARGMAX} ELSE 'und' END AS lang_pred,
             md5(array_to_string(tkl, ' ')) AS fp
      FROM counted
    ),
    filtered AS (
      SELECT * FROM sig
      WHERE split = 'train'
        AND quality >= {_CFG.min_quality}
        AND rep_2gram_frac <= {_CFG.max_rep_2gram}
        AND rep_3gram_frac <= {_CFG.max_rep_3gram}
        AND lang_pred IN ({_LANG_IN})
    ),
    canon AS (SELECT fp, min(doc_id) AS doc_id FROM filtered GROUP BY fp),
    kept AS (
      SELECT f.* FROM filtered f
      WHERE EXISTS (SELECT 1 FROM canon c WHERE c.fp = f.fp AND c.doc_id = f.doc_id)
    ),
    evg AS (
      SELECT DISTINCT unnest(list_distinct(
               list_transform(range(1, greatest(len(tkl) - {_CFG.decontam_n - 1}, 0) + 1),
                 i -> md5(array_to_string(tkl[i:i+{_CFG.decontam_n - 1}], ' '))))) AS g
      FROM sig WHERE split = 'test'
    ),
    dirty AS (
      SELECT DISTINCT doc_id
      FROM (
        SELECT doc_id, unnest(list_distinct(
                 list_transform(range(1, greatest(len(tkl) - {_CFG.decontam_n - 1}, 0) + 1),
                   i -> md5(array_to_string(tkl[i:i+{_CFG.decontam_n - 1}], ' '))))) AS g
        FROM kept
      ) kg
      WHERE EXISTS (SELECT 1 FROM evg WHERE evg.g = kg.g)
    )
    SELECT doc_id, quality, rep_2gram_frac, rep_3gram_frac, lang_pred, fp
    FROM kept
    WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
"""


@register(
    "pipeline_curate",
    oracle=_ORACLE,
    doc="End-to-end corpus curation on one table: signal pass (quality "
    "band, Gopher repetition caps, lang-ID allowlist) → canonical-doc "
    "fingerprint dedup (digest-only shuffle + semi join) → "
    "decontamination against the held-out test split (broadcast gram "
    "set).  Train split is the corpus; every stage exact, so the oracle "
    "replays the identical composition in SQL.  Clean docs flow "
    "scan→output without shuffling text.",
    tags=("pipeline", "scale", "decontam", "dedup", "textstats"),
    bench=True,
    tier=2,
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.sampling import hash_split

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    split = hash_split(docs, "doc_id")
    train = split.where(F.col("split") == "train").select("doc_id", "text")
    test = split.where(F.col("split") == "test").select("doc_id", "text")
    out = curate(train, eval_docs=test)
    return out.select(
        "doc_id", "quality", "rep_2gram_frac", "rep_3gram_frac", "lang_pred", "fp"
    )
