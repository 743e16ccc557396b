"""Perceptual image hashing + image near-duplicate detection — the
multimodal twin of text SimHash, extending the dedup family to the
image columns a multimodal training pipeline carries.

``dhash`` (difference hash, the classic 64-bit perceptual sketch): luma
→ exact integer 9×8 block-mean downsample → horizontal gradient sign
bits.  Resistant to re-encoding, resizing, and mild edits; a few
changed pixels flip at most a few bits, so near-duplicate images sit
within small Hamming distance — exactly the property the generic
64-bit banding join (:func:`yodel_etl_spark.scale.dedup.hamming_pairs`)
turns into a shuffle-narrow self-join at corpus scale.

Everything is exact integer arithmetic (ITU-R 601 luma in millesimal
fixed point, area sums over a 2-D cumulative table, floor division), so
the hash is bit-reproducible on any executor — the same determinism
contract as the audio/codec modules.

Scale shape: decode + hash is one Arrow ``mapInPandas`` pass — blobs
never leave their partition; only ``(id, 64-bit hash)`` rows reach the
banding join.  At 100 TB of images the sketch table is ~8 bytes/image.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: dHash grid: 8 rows × 9 columns of block means → 8×8 gradient bits
GRID_H, GRID_W = 8, 9


def luma(px):
    """``(h, w[, c])`` uint8 pixels → ``(h, w)`` int64 luma (ITU-R 601
    weights in exact millesimal fixed point: (299R + 587G + 114B) //
    1000).  Grayscale passes through; an alpha channel is ignored."""
    import numpy as np

    a = np.asarray(px)
    if a.ndim == 2:
        return a.astype(np.int64)
    if a.shape[2] == 1:
        return a[:, :, 0].astype(np.int64)
    r = a[:, :, 0].astype(np.int64)
    g = a[:, :, 1].astype(np.int64)
    b = a[:, :, 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def block_mean(gray, out_h: int, out_w: int):
    """Exact integer area-mean downsample to ``(out_h, out_w)``: block
    boundaries at ``floor(i·H/out_h)``, block sums via one 2-D
    cumulative table, floor-divided by the true block area.  Raises
    ValueError when the image is smaller than the target grid (a
    zero-area block has no mean) — honest gate, the codec-module
    policy."""
    import numpy as np

    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    if h < out_h or w < out_w:
        raise ValueError(
            f"image {h}x{w} smaller than the {out_h}x{out_w} hash grid"
        )
    ys = (np.arange(out_h + 1, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w + 1, dtype=np.int64) * w) // out_w
    c = np.zeros((h + 1, w + 1), dtype=np.int64)
    c[1:, 1:] = g.cumsum(0).cumsum(1)
    sums = (
        c[ys[1:, None], xs[None, 1:]]
        - c[ys[:-1, None], xs[None, 1:]]
        - c[ys[1:, None], xs[None, :-1]]
        + c[ys[:-1, None], xs[None, :-1]]
    )
    areas = (ys[1:, None] - ys[:-1, None]) * (xs[1:] - xs[:-1])[None, :]
    return sums // areas


def dhash64(px) -> int:
    """64-bit difference hash of a decoded pixel array, as a SIGNED
    64-bit int (Spark ``long``; the banding join's
    ``shiftrightunsigned`` reads it back as unsigned bits).  Bit 63 is
    the first (row 0) gradient: row-major ``mean[r, c+1] > mean[r, c]``."""
    m = block_mean(luma(px), GRID_H, GRID_W)
    bits = (m[:, 1:] > m[:, :-1]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


#: columns :func:`image_dhash` appends
DHASH_SCHEMA = [
    T.StructField("dhash", T.LongType()),
    T.StructField("img_h", T.IntegerType()),
    T.StructField("img_w", T.IntegerType()),
]


def image_dhash(
    df: DataFrame, binary_col: str = "content", decoder=None
) -> DataFrame:
    """Append ``(dhash, img_h, img_w)`` from an image binary column via
    one Arrow ``mapInPandas`` pass — pure-stdlib decode
    (``scale.multimodal.decode_pixels``: PNG/JPEG/GIF/BMP) + the exact
    integer dHash; corrupt or undersized images raise (honest gate,
    same policy as the decoders themselves).  ``decoder`` (opt-in)
    rides through to decode_pixels' pluggable-codec hook, so video
    frames / WebP hash through the same banding family once an external
    codec is plugged in."""
    from yodel_etl_spark.scale.multimodal import decode_pixels
    from yodel_etl_spark.session import ship_package

    ship_package(df.sparkSession)
    out_schema = T.StructType(df.schema.fields + DHASH_SCHEMA)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes, hs, ws = [], [], []
            for blob in pdf[binary_col]:
                px = decode_pixels(bytes(blob), decoder=decoder)
                hashes.append(dhash64(px))
                hs.append(int(px.shape[0]))
                ws.append(int(px.shape[1]))
            res = pdf.copy()
            res["dhash"] = pd.Series(hashes, dtype="int64")
            res["img_h"] = pd.Series(hs, dtype="int32")
            res["img_w"] = pd.Series(ws, dtype="int32")
            yield res

    return df.mapInPandas(batches, schema=out_schema)


def image_near_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "content",
    max_distance: int = 3,
    blocks: int = 8,
) -> DataFrame:
    """Image near-duplicate pairs: decode → dHash → the generic 64-bit
    Hamming banding join (pigeonhole-exact recall at
    ``max_distance < blocks``).  Returns ``(doc_a, doc_b, hamming)``;
    only 8-byte sketches shuffle — the blobs never leave their decode
    partition."""
    from yodel_etl_spark.scale.dedup import hamming_pairs

    sk = image_dhash(df.select(id_col, binary_col), binary_col).select(
        id_col, "dhash"
    )
    return hamming_pairs(sk, id_col, "dhash", max_distance, blocks)
