"""WAV decode invariants: container roundtrip across every supported
encoding, chunk-walking robustness, honest gates on compressed formats,
and exact-integer feature math (the registered ``audio_wav`` query's
cross-engine parity rides the oracle gate)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from yodel_etl_spark.scale.audio import (
    audio_features,
    decode_wav_samples,
    parse_wav_header,
    wav_pack,
)


def test_roundtrip_pcm16_mono():
    x = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int64)
    blob = wav_pack(x, sample_rate=8000, bits=16)
    h = parse_wav_header(blob)
    assert (h["format"], h["channels"], h["sample_rate"], h["bits"]) == (1, 1, 8000, 16)
    out = decode_wav_samples(blob)
    assert out.shape == (6, 1)
    assert list(out[:, 0]) == list(x)


def test_roundtrip_pcm16_stereo():
    x = np.array([[1, -1], [300, -300], [5, 6]], dtype=np.int64)
    blob = wav_pack(x, sample_rate=44100, bits=16)
    out = decode_wav_samples(blob)
    assert out.shape == (3, 2)
    assert (out == x).all()


def test_roundtrip_pcm8_centers_on_zero():
    x = np.array([0, 127, -128, 5], dtype=np.int64)
    out = decode_wav_samples(wav_pack(x, bits=8))
    assert list(out[:, 0]) == [0, 127, -128, 5]


def test_roundtrip_pcm32():
    x = np.array([2**30, -(2**30), 12], dtype=np.int64)
    out = decode_wav_samples(wav_pack(x, bits=32))
    assert list(out[:, 0]) == list(x)


def test_float32_wav_decodes():
    payload = np.array([0.5, -0.25, 1.0], dtype="<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    out = decode_wav_samples(blob)
    assert out.dtype.kind == "f"
    assert list(out[:, 0]) == [np.float32(0.5), np.float32(-0.25), np.float32(1.0)]


def test_chunk_walk_skips_list_chunk():
    """fmt is not always the first chunk — a LIST/INFO chunk (odd
    length, so word-alignment padding is exercised too) must be
    skipped, not break the parse."""
    x = np.array([1, 2, 3], dtype=np.int64)
    canonical = wav_pack(x)
    body = canonical[12:]
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    blob = b"RIFF" + struct.pack("<I", 4 + len(info) + len(body)) + b"WAVE" + info + body
    assert list(decode_wav_samples(blob)[:, 0]) == [1, 2, 3]


def test_honest_gates():
    with pytest.raises(NotImplementedError):
        decode_wav_samples(b"not a wav at all")
    assert parse_wav_header(b"\x00" * 40) is None
    # MP3-in-WAV (format 85): recognized container, gated codec
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(NotImplementedError):
        decode_wav_samples(blob)
    # truncated data chunk: recognized but contradictory → ValueError
    good = wav_pack(np.array([1, 2, 3, 4], dtype=np.int64))
    with pytest.raises(ValueError):
        parse_wav_header(good[:-3])


def test_audio_features_exact_integers(spark):
    xs = {
        7: np.array([100, -200, 300], dtype=np.int64),
        8: np.array([0, 0], dtype=np.int64),
    }
    rows = [(k, bytearray(wav_pack(v, sample_rate=16000))) for k, v in xs.items()]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in audio_features(df, "content").collect()}
    assert out[7]["n_samples"] == 3
    assert out[7]["sample_rate"] == 16000
    assert out[7]["peak_abs"] == 300
    assert out[7]["sum_abs"] == 600
    assert out[7]["sum_sq"] == 100**2 + 200**2 + 300**2
    assert out[8]["peak_abs"] == 0 and out[8]["sum_sq"] == 0


def test_float_features_quantize_to_micro(spark):
    payload = np.array([0.5, -0.25], dtype="<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, content binary")
    r = audio_features(df, "content").collect()[0]
    assert r["peak_abs"] == 500_000
    assert r["sum_abs"] == 750_000


# ---------------------------------------------------------------- MP4
def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mini_mp4(version: int = 0) -> bytes:
    if version == 1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + struct.pack(">IQ", 1000, 90_000)
    else:
        mvhd = bytes([0, 0, 0, 0]) + b"\x00" * 8 + struct.pack(">II", 1000, 90_000)
    hdlr_v = b"\x00" * 8 + b"vide" + b"\x00" * 12
    hdlr_s = b"\x00" * 8 + b"soun" + b"\x00" * 12
    trak_v = _box(b"trak", _box(b"mdia", _box(b"hdlr", hdlr_v)))
    trak_s = _box(b"trak", _box(b"mdia", _box(b"hdlr", hdlr_s)))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak_v + trak_s)
    return _box(b"ftyp", b"isom" + b"\x00" * 8) + moov


def test_mp4_metadata_parse():
    from yodel_etl_spark.scale.audio import parse_mp4_boxes

    for ver in (0, 1):
        m = parse_mp4_boxes(_mini_mp4(ver))
        assert m["brand"] == "isom"
        assert m["timescale"] == 1000
        assert m["duration_s"] == 90.0
        assert m["n_tracks"] == 2
        assert m["track_types"] == ["vide", "soun"]


def test_mp4_not_bmff_and_truncated():
    from yodel_etl_spark.scale.audio import parse_mp4_boxes

    assert parse_mp4_boxes(b"RIFF....WAVE") is None
    assert parse_mp4_boxes(b"\x00" * 6) is None
    blob = _mini_mp4()
    with pytest.raises(ValueError):
        parse_mp4_boxes(blob[:-5])  # truncated trailing box


def test_mp4_size_zero_extends_to_end():
    from yodel_etl_spark.scale.audio import parse_mp4_boxes

    blob = _mini_mp4()
    # rewrite moov's size field to 0 ("to end of file") — still parses
    moov_off = blob.index(b"moov") - 4
    blob = blob[:moov_off] + struct.pack(">I", 0) + blob[moov_off + 4 :]
    m = parse_mp4_boxes(blob)
    assert m["n_tracks"] == 2 and m["duration_s"] == 90.0
