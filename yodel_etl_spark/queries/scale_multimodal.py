"""Multimodal-column queries: binary blobs (here: utf-8 of documents.text
standing in for image bytes) flowing through the real mapInPandas decode
plumbing; metadata verified against SQL byte arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.multimodal import byte_histogram_features, decode_meta, frame_offsets
from yodel_etl_spark.session import load_tables, spread


def _with_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("content"))


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS byte_len,
           sha256(text) AS sha256,
           ascii(substr(text, 1, 1)) % 64 + 1 AS width,
           ascii(substr(text, 2, 1)) % 64 + 1 AS height,
           3 AS channels
    FROM documents
    """,
    doc="Binary decode plumbing: mapInPandas (Arrow batches) computes "
    "byte_len/sha256 + fake header dims; oracle recomputes them with "
    "SQL byte arithmetic.  The real codec call is stubbed "
    "(scale.multimodal.try_real_decode) — the distributed shape is what "
    "is under test.",
    tags=("multimodal",),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    return decode_meta(b, "content").select(
        "doc_id",
        "byte_len",
        "sha256",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
    )


@register(
    "multimodal_frame_offsets",
    oracle="""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN ''
                ELSE array_to_string(list_transform(range(0, 4),
                  i -> CAST(floor(length(text) * i / 4.0) AS BIGINT)), ',')
           END AS frame_offsets
    FROM documents
    """,
    doc="Frame sampling (video analogue): 4 deterministic byte offsets "
    "per blob as pure column algebra.  Offsets serialized to a "
    "comma-joined string: drivers hash/sort rows by value, and "
    "top-level array cells are unsortable in pandas.",
    tags=("multimodal",),
)
def multimodal_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    return frame_offsets(b, "content", 4).select(
        "doc_id",
        F.array_join(F.col("frame_offsets").cast("array<string>"), ",").alias(
            "frame_offsets"
        ),
    )


_BIN_SUMS = ",\n           ".join(
    f"CAST(coalesce(sum(CASE WHEN unicode(ch) // 32 = {b} THEN 1 END), 0) AS BIGINT) AS b{b}"
    for b in range(8)
)


@register(
    "multimodal_byte_features",
    oracle=f"""
    SELECT doc_id,
           {_BIN_SUMS}
    FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents)
    WHERE ch <> ''
    GROUP BY doc_id
    """,
    doc="Feature-extraction plumbing: 8-bin byte histogram per blob via "
    "mapInPandas + numpy bincount (the Arrow-batch shape a CLIP/audio "
    "embedding UDF would have).  Raw counts, not ratios, so the "
    "char-exploded SQL oracle matches exactly (text is ASCII at test "
    "SF: byte == codepoint).",
    tags=("multimodal",),
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    feats = byte_histogram_features(b, "content", n_bins=8, normalize=False)
    return feats.select(
        "doc_id",
        *[F.element_at("features", i + 1).cast("long").alias(f"b{i}") for i in range(8)],
    )
