"""Multimodal-column queries: binary blobs (here: utf-8 of documents.text
standing in for image bytes) flowing through the real mapInPandas decode
plumbing; metadata verified against SQL byte arithmetic.

The decode / frame-sampling / feature-extraction kernels each append
columns and pass their input through, so one registered query chains all
three — one narrow no-shuffle pass over the blobs, and one registry slot
instead of three (keeps every oracle-backed query inside the driver's
bounded correctness window).  The kernels stay independent operators in
``scale.multimodal`` (individually pinned by tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.multimodal import byte_histogram_features, decode_meta, frame_offsets
from yodel_etl_spark.session import load_tables, spread


def _with_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("content"))


_BIN_SUMS = ",\n           ".join(
    f"CAST(coalesce(sum(CASE WHEN unicode(ch) // 32 = {b} THEN 1 END), 0) AS BIGINT) AS b{b}"
    for b in range(8)
)


@register(
    "mm_feats",  # r12 rename of multimodal_features (byte budget; green r11)
    oracle=f"""
    WITH hist AS (
      SELECT doc_id, {_BIN_SUMS}
      FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents)
      WHERE ch <> ''
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(length(d.text) AS BIGINT) AS byte_len,
           sha256(d.text) AS sha256,
           ascii(substr(d.text, 1, 1)) % 64 + 1 AS width,
           ascii(substr(d.text, 2, 1)) % 64 + 1 AS height,
           3 AS channels,
           CASE WHEN length(d.text) = 0 THEN ''
                ELSE array_to_string(list_transform(range(0, 4),
                  i -> CAST(floor(length(d.text) * i / 4.0) AS BIGINT)), ',')
           END AS frame_offsets,
           coalesce(h.b0, 0) AS b0, coalesce(h.b1, 0) AS b1,
           coalesce(h.b2, 0) AS b2, coalesce(h.b3, 0) AS b3,
           coalesce(h.b4, 0) AS b4, coalesce(h.b5, 0) AS b5,
           coalesce(h.b6, 0) AS b6, coalesce(h.b7, 0) AS b7
    FROM documents d LEFT JOIN hist h USING (doc_id)
    """,
    doc="Binary-column plumbing end-to-end: mapInPandas decode "
    "(byte_len/sha256 + header dims — real magic-byte parse for "
    "PNG/GIF/BMP/JPEG via scale.multimodal.parse_image_header, "
    "deterministic fake for unrecognized blobs like this text-as-bytes "
    "corpus, which valid UTF-8 can never false-positive out of), "
    "4-point frame sampling as "
    "pure column algebra, and an 8-bin byte histogram via numpy "
    "bincount per Arrow batch (the shape a CLIP/audio embedding UDF "
    "would have).  Raw counts, not ratios, so the char-exploded SQL "
    "oracle matches exactly (text is ASCII at test SF: byte == "
    "codepoint).  Frame offsets serialized to a comma-joined string: "
    "drivers sort rows by value and top-level array cells are "
    "unsortable in pandas.",
    tags=("multimodal",),
    bench=True,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    meta = decode_meta(b, "content")
    framed = frame_offsets(meta, "content", 4)
    feats = byte_histogram_features(framed, "content", n_bins=8, normalize=False)
    return feats.select(
        "doc_id",
        "byte_len",
        "sha256",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.array_join(F.col("frame_offsets").cast("array<string>"), ",").alias(
            "frame_offsets"
        ),
        *[F.element_at("features", i + 1).cast("long").alias(f"b{i}") for i in range(8)],
    )


def _planted_wavs(spark: SparkSession, sf_dir: str, n_base: int = 200) -> DataFrame:
    """(doc_id, content) with per-doc 16-bit mono WAV blobs whose PCM
    samples are synthesized deterministically from doc_id — the shared
    fixture generator for the audio queries (sample i of doc d is
    ``((d*31 + i*17) % 65536) - 32768``, n_base + d%50 samples).
    ``audio_wav``'s oracle is pinned to the default 200; the spectral
    query passes a longer clip (the 256-sample analysis frame needs
    n ≥ frame to produce any frames at all)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from yodel_etl_spark.scale.audio import wav_pack
    from yodel_etl_spark.session import ship_package

    ship_package(spark)

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"]).select(
        "doc_id"
    )

    def plant(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["content"] = [
                wav_pack(
                    ((int(d) * 31 + np.arange(n_base + int(d) % 50) * 17) % 65536)
                    - 32768,
                    sample_rate=8000,
                    bits=16,
                )
                for d in pdf["doc_id"]
            ]
            yield out

    return docs.mapInPandas(plant, "doc_id long, content binary")


@register(
    "audio_wav",
    oracle="""
    WITH s AS (
      SELECT doc_id, ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
      FROM (SELECT doc_id, unnest(range(0, 200 + doc_id % 50)) AS i
            FROM documents)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           8000 AS sample_rate, 1 AS channels, 16 AS bits,
           CAST(max(abs(v)) AS BIGINT) AS peak_abs,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v * v) AS BIGINT) AS sum_sq
    FROM s GROUP BY doc_id
    """,
    doc="Audio-column plumbing end-to-end through a REAL RIFF/WAVE "
    "container: per-doc PCM samples synthesized deterministically from "
    "doc_id, packed into 16-bit mono WAV blobs (scale.audio.wav_pack), "
    "then decoded back (chunk-walking header parse + PCM decode, all "
    "pure-stdlib — MP3/ADPCM stay honestly gated) and reduced to "
    "EXACT INTEGER features (n_samples, peak |x|, Σ|x|, Σx²) in one "
    "Arrow-batched mapInPandas pass — no shuffle anywhere, blobs "
    "never leave their partition.  The oracle reproduces the planted "
    "sample arithmetic directly, so a hash match proves the whole "
    "pack→parse→decode→aggregate roundtrip bit-exactly.  Tier 1: "
    "yields its driver-window slot; parity via the pytest oracle "
    "gate.",
    tags=("multimodal", "audio"),
    tier=1,
)
def audio_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.audio import audio_features

    blobs = _planted_wavs(spark, sf_dir)
    return audio_features(blobs, "content").select(
        "doc_id",
        "n_samples",
        "sample_rate",
        "channels",
        "bits",
        "peak_abs",
        "sum_abs",
        "sum_sq",
    )


@register(
    "phash",
    oracle=None,  # pixel decode + perceptual hashing has no
    # single-statement SQL twin; hash determinism, block-mean
    # exactness, pigeonhole recall and the planted-pair semantics are
    # pinned in tests/test_phash.py — rows-only: one pair row per
    # planted twin, exact ids + hamming
    doc="Image near-duplicate detection end-to-end through REAL "
    "containers: per-doc 64×72 RGB images planted deterministically "
    "from blake2b(doc_id) block patterns, packed as 24-bpp BI_RGB BMP "
    "(scale.codecs.bmp_pack), every 10th doc re-emitted under a "
    "shifted id with two pattern cells perturbed (≤2 dHash bits) → "
    "pure-stdlib pixel decode → exact-integer dHash (luma, 9×8 "
    "block-mean, gradient sign bits) → the generic 64-bit Hamming "
    "banding join shared with text SimHash (pigeonhole-exact recall "
    "at distance < blocks).  Only 8-byte sketches shuffle; blobs "
    "never leave their decode partition.  The multimodal twin of "
    "simhash — perceptual dedup for the image columns of a "
    "multimodal corpus.",
    tags=("multimodal", "dedup", "scale"),
    bench=True,
)
def phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import hashlib

    import numpy as np
    import pandas as pd

    from yodel_etl_spark.scale.phash import image_near_dup
    from yodel_etl_spark.session import ship_package

    ship_package(spark)

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"]).select(
        "doc_id"
    )
    near = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id")
    )
    ids = docs.unionByName(near)

    def plant(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from yodel_etl_spark.scale.codecs import bmp_pack

        def image(doc_id: int) -> bytes:
            base = doc_id % 2_000_000
            key = base.to_bytes(8, "little")
            cells = np.frombuffer(
                hashlib.blake2b(key, digest_size=36, person=b"phash-a").digest()
                + hashlib.blake2b(key, digest_size=36, person=b"phash-b").digest(),
                dtype=np.uint8,
            ).reshape(8, 9)
            if doc_id >= 2_000_000:  # the near-dup twin: bump 2 cells
                cells = cells.copy()
                cells[3, 4] = (int(cells[3, 4]) + 60) % 256
                cells[6, 1] = (int(cells[6, 1]) + 60) % 256
            gray = np.repeat(np.repeat(cells, 8, axis=0), 8, axis=1)
            return bmp_pack(np.stack([gray] * 3, axis=2))

        for pdf in it:
            out = pdf.copy()
            out["content"] = [image(int(d)) for d in pdf["doc_id"]]
            yield out

    blobs = ids.mapInPandas(plant, "doc_id long, content binary")
    return image_near_dup(blobs, "doc_id", "content", max_distance=4, blocks=8)


@register(
    "audiox",
    oracle=None,  # rfft/log-mel float front-end has no SQL twin; the
    # spectral invariants (Parseval cross-check, gain-invariant
    # fingerprint, noise-locality) are pinned in tests/test_audio.py
    doc="Audio feature-extraction front-end over the planted WAV "
    "corpus: the log-mel spectral pass (frame → Hann window → rfft → "
    "16-band mel → log; scale.audio.audio_spectral) chained with the "
    "64-bit Haitsma-Kalker band-delta fingerprint "
    "(scale.audio.audio_fingerprint) in one Arrow-batched pipeline — "
    "blobs never leave their decode partition, only (doc_id, scalars, "
    "fp) come out.  Records the decode+DSP cost an audio-model "
    "training pipeline pays per clip; the fp column is exactly what "
    "the Hamming index family (sketch_dedup_ingest, hamming_pairs) "
    "consumes.  Floats are per-row deterministic (numpy kernels, no "
    "reduction order); the log-mel vector stays internal — outputs "
    "are scalar columns only.",
    tags=("multimodal", "audio", "bench"),
    bench=True,
)
def audiox(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.audio import audio_spectral_fingerprint

    blobs = _planted_wavs(spark, sf_dir, n_base=2000)
    # fused spectral+fingerprint pass (r15): one blob decode and one
    # JVM↔Python round trip instead of the chained form's two of each;
    # bit-identical outputs pinned in tests/test_audio.py
    feats = audio_spectral_fingerprint(blobs, "content")
    return feats.select(
        "doc_id",
        "n_frames",
        "zero_crossings",
        F.round("centroid_hz", 3).alias("centroid_hz"),
        "fp",
    )
