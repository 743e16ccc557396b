"""EP-convert — JSON → natural-language text via LLM inference
(convert_json_to_text.py end-to-end).

Reference flow (per file, strictly sequential): load JSON (corrupt →
log & skip, :112-117) → pretty-dump into the prompt template (:131-134)
→ Gemini call with 0.5 s pacing (:223-225) → ``stem.txt`` per input
file (:150-168) → success/failure counters (:196-227).

Spark shape: whole-file text scan → ``try_parse_json`` validity split
(A2 counters are a groupBy away) → prompt render (P11, column algebra)
→ ``infer_map`` (U1: Arrow-batched, per-partition client + token
bucket) → per-record text sink (K4).  One lazy DAG; file count is the
parallelism unit exactly like the reference's loop, minus the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.io.text import write_text_per_record
from yodel_etl_spark.llm.infer import Client, infer_map

#: behavioral data of the reference (convert_json_to_text.py:26-52),
#: kept verbatim; split on the single {json_content} slot.
PROMPT_TEMPLATE = """You are a helpful assistant that converts structured park information in JSON format into a smooth, natural English description.

Write a detailed, factual summary that reads like a short Wikipedia article or tourism guide entry.
The goal is to make the text sound natural, coherent, and informative for a general audience.

Follow these guidelines:
- Use full sentences and flowing paragraphs.
- Include key information such as:
  - Park name and location
  - Overview or description
  - How to get there (if available)
  - Activities visitors can do
  - Available facilities
  - Accessibility features
  - Restrictions and rules
  - Nearby or related parks
  - Any special notes like free parking, scenic views, or opening hours.
- Avoid technical terms, JSON keys, or symbols.
- Do not list field names — integrate all data into natural sentences.
- Write in a friendly but factual tone.
- Length: 150–250 words if enough data is available.

Convert the following park information into a plain English description as described above.

{json_content}
"""

_PRE, _POST = PROMPT_TEMPLATE.split("{json_content}")


def read_json_files(spark: SparkSession, input_dir: str) -> DataFrame:
    """One row per ``*.json`` file: (stem, raw body) — the unit the
    reference summarizes (a whole file, whether one object or a list,
    convert_json_to_text.py:186-205)."""
    glob = f"{input_dir.rstrip('/')}/*.json"
    return (
        spark.read.option("wholetext", True)
        .text(glob)
        .select(
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1).alias("stem"),
            F.col("value").alias("body"),
        )
    )


def render_prompts(files: DataFrame) -> DataFrame:
    """Validity split + prompt render as column algebra.

    ``try_parse_json`` is the log-and-skip policy (:112-117): corrupt
    bodies yield a NULL variant, counted not thrown.  Valid bodies are
    re-serialized canonically (the reference pretty-prints; byte shape
    of the prompt JSON is not load-bearing for an LLM call)."""
    parsed = files.select("stem", F.try_parse_json("body").alias("doc"))
    return parsed.select(
        "stem",
        F.col("doc").isNotNull().alias("valid"),
        F.when(
            F.col("doc").isNotNull(),
            F.concat(F.lit(_PRE), F.to_json("doc"), F.lit(_POST)),
        ).alias("prompt"),
    )


def convert_dir(
    spark: SparkSession,
    input_dir: str,
    output_dir: str | None,
    client: Client,
    rate_per_sec: float | None = 2.0,
) -> DataFrame:
    """EP end-to-end; returns per-file (stem, valid, output, status,
    error) — the A2 counters are ``groupBy(valid, status).count()``.

    ``rate_per_sec=2.0`` mirrors the reference's 0.5 s inter-call delay
    (API_DELAY_SECONDS, :23) per partition."""
    prompts = render_prompts(read_json_files(spark, input_dir))
    good = prompts.where("valid").select("stem", "prompt")
    inferred = infer_map(good, client, rate_per_sec=rate_per_sec).select(
        "stem", F.lit(True).alias("valid"), "output", "status", "error"
    )
    bad = (
        prompts.where(~F.col("valid"))
        .select("stem")
        .select(
            "stem",
            F.lit(False).alias("valid"),
            F.lit(None).cast("string").alias("output"),
            F.lit(None).cast("int").alias("status"),
            F.lit("invalid JSON").alias("error"),
        )
    )
    result = inferred.unionByName(bad)
    if output_dir:
        # persist across the sink action: the caller's follow-up
        # counters aggregate the cached rows instead of re-running the
        # inference map (LLM calls are the one thing never to pay twice)
        result = result.persist()
        ok = result.where(F.col("output").isNotNull())
        write_text_per_record(ok, "stem", "output", output_dir)
    return result


if __name__ == "__main__":  # pragma: no cover - CLI shim
    import sys

    from yodel_etl_spark.cli import convert_main

    sys.exit(convert_main())
