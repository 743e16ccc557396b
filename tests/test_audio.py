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


# ---------------------------------------------------------------- G.711
def _mulaw_twin(code: int) -> int:
    """Literal scalar twin of the classic G.711 µ-law decode."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_twin(code: int) -> int:
    """Literal scalar twin of the classic G.711 A-law decode."""
    a = code ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = t + 8 if seg == 0 else (t + 0x108) << max(seg - 1, 0)
    return t if (a & 0x80) else -t


def _g711_wav(codes: bytes, fmt_tag: int, ch: int = 1, rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * ch, ch, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(codes)) + codes
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_g711_mulaw_all_codes_match_twin_and_anchors():
    codes = bytes(range(256))
    out = decode_wav_samples(_g711_wav(codes, 7))
    assert out.dtype == np.int16 and out.shape == (256, 1)
    for c in range(256):
        assert out[c, 0] == _mulaw_twin(c), c
    # standard table anchors
    got = {c: int(out[c, 0]) for c in (0x00, 0x7F, 0x80, 0xFF)}
    assert got == {0x00: -32124, 0x7F: 0, 0x80: 32124, 0xFF: 0}


def test_g711_alaw_all_codes_match_twin_and_anchors():
    codes = bytes(range(256))
    out = decode_wav_samples(_g711_wav(codes, 6))
    assert out.dtype == np.int16 and out.shape == (256, 1)
    for c in range(256):
        assert out[c, 0] == _alaw_twin(c), c
    got = {c: int(out[c, 0]) for c in (0x55, 0xD5)}
    assert got[0x55] == -8 and got[0xD5] == 8  # the quietest codes
    # sign symmetry: clearing the sign bit negates every magnitude
    for c in range(128):
        assert _alaw_twin(c) == -_alaw_twin(c | 0x80)


def test_g711_stereo_interleave():
    codes = bytes([0x00, 0xFF, 0x80, 0x7F])  # L,R,L,R
    out = decode_wav_samples(_g711_wav(codes, 7, ch=2))
    assert out.shape == (2, 2)
    assert list(out[:, 0]) == [-32124, 32124]
    assert list(out[:, 1]) == [0, 0]


# ----------------------------------------------------------- IMA-ADPCM
def _ima_twin_decode_block(block: bytes, ch: int):
    """Literal per-channel twin of the IMA reference decode."""
    from yodel_etl_spark.scale.audio import _IMA_INDEX_ADJ, _IMA_STEPS

    states, outs = [], []
    for c in range(ch):
        pred, idx = struct.unpack_from("<hB", block, 4 * c)
        states.append([pred, idx])
        outs.append([pred])
    payload = block[4 * ch :]
    for g in range(0, len(payload), 4):
        c = (g // 4) % ch
        for b in payload[g : g + 4]:
            for nib in (b & 0x0F, b >> 4):
                pred, idx = states[c]
                step = _IMA_STEPS[idx]
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    diff = -diff
                pred = max(-32768, min(32767, pred + diff))
                idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib & 0x07]))
                states[c] = [pred, idx]
                outs[c].append(pred)
    return outs


def _ima_wav(blocks: bytes, ch: int, block_align: int, fact: int | None = None) -> bytes:
    fmt = struct.pack("<HHIIHH", 0x11, ch, 8000, 4000, block_align, 4)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        chunks += b"fact" + struct.pack("<I", 4) + struct.pack("<I", fact)
    chunks += b"data" + struct.pack("<I", len(blocks)) + blocks
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_ima_adpcm_mono_matches_twin():
    rng = np.random.RandomState(3)
    payload = rng.randint(0, 256, 8, dtype=np.uint8).tobytes()
    block = struct.pack("<hBB", 1234, 20, 0) + payload  # align 12
    out = decode_wav_samples(_ima_wav(block * 3, 1, 12))
    twin = []
    for b in range(3):
        twin += _ima_twin_decode_block(block, 1)[0]
    assert out.shape == (51, 1)  # 3 blocks x (1 + 16) samples
    assert list(out[:, 0]) == twin


def test_ima_adpcm_stereo_group_interleave_and_fact():
    rng = np.random.RandomState(4)
    payload = rng.randint(0, 256, 16, dtype=np.uint8).tobytes()  # 2 groups/ch
    block = (
        struct.pack("<hBB", -500, 10, 0)
        + struct.pack("<hBB", 700, 35, 0)
        + payload
    )  # align = 8 + 16 = 24 -> 1 + 16/2... per-ch: 8 bytes = 16 nibs + header
    out = decode_wav_samples(_ima_wav(block, 2, 24, fact=15))
    twin = _ima_twin_decode_block(block, 2)
    assert out.shape == (15, 2)  # fact truncates 17 -> 15
    assert list(out[:, 0]) == twin[0][:15]
    assert list(out[:, 1]) == twin[1][:15]


def test_ima_adpcm_trailing_partial_block_decoded():
    """A short FINAL block (header + fewer nibble groups than
    block_align implies — how real IMA WAVs end; fact carries the true
    frame count) must be decoded, not silently dropped."""
    rng = np.random.RandomState(5)
    full = struct.pack("<hBB", 1234, 20, 0) + rng.randint(
        0, 256, 8, dtype=np.uint8
    ).tobytes()  # align 12 -> 17 samples
    partial = struct.pack("<hBB", -200, 15, 0) + rng.randint(
        0, 256, 4, dtype=np.uint8
    ).tobytes()  # header + ONE 4-byte group = 9 samples
    out = decode_wav_samples(_ima_wav(full + partial, 1, 12))
    twin = _ima_twin_decode_block(full, 1)[0] + _ima_twin_decode_block(partial, 1)[0]
    assert out.shape == (26, 1)  # 17 + 9, not 17
    assert list(out[:, 0]) == twin
    # fact still truncates across the partial block
    out_fact = decode_wav_samples(_ima_wav(full + partial, 1, 12, fact=20))
    assert list(out_fact[:, 0]) == twin[:20]


def test_ima_adpcm_tail_shorter_than_header_raises():
    """A non-empty tail too short for the per-channel headers carries
    no decodable sample — honest ValueError, not silence."""
    block = struct.pack("<hBB", 0, 0, 0) + bytes(8)
    with pytest.raises(ValueError, match="trailing fragment"):
        decode_wav_samples(_ima_wav(block + b"\x01\x02", 1, 12))


def test_ima_adpcm_encoder_roundtrip_tracks_signal():
    """Test-side reference IMA encoder on a smooth signal: the decoded
    wave must track the original closely (ADPCM is lossy; after step
    adaptation the error is bounded by the local step size)."""
    from yodel_etl_spark.scale.audio import _IMA_INDEX_ADJ, _IMA_STEPS

    t = np.arange(4096)
    x = np.round(6000 * np.sin(2 * np.pi * t / 64)).astype(np.int64)

    blocks = bytearray()
    pred, idx = int(x[0]), 0
    pos = 0
    samples_per_block = 505  # align = 4 + 252 -> 4 | (505-1)/2 = 252 bytes
    while pos < len(x):
        chunk = x[pos : pos + samples_per_block]
        if len(chunk) < samples_per_block:
            break
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for s in chunk[1:]:
            step = _IMA_STEPS[idx]
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib, diff = 8, -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # decoder-mirror update
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            if nib & 8:
                d = -d
            pred = max(-32768, min(32767, pred + d))
            idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib & 0x07]))
            nibs.append(nib)
        for i in range(0, len(nibs), 2):
            blocks.append(nibs[i] | (nibs[i + 1] << 4))
        pos += samples_per_block
    align = 4 + (samples_per_block - 1) // 2
    out = decode_wav_samples(_ima_wav(bytes(blocks), 1, align))
    m = len(out)
    err = np.abs(out[:, 0].astype(np.int64) - x[:m])
    assert m >= 4040
    assert err.mean() < 150 and err.max() < 2500, (err.mean(), err.max())


def test_audio_features_over_g711_and_adpcm(spark):
    """The mapInPandas feature chain consumes the new formats end to
    end: exact integer aggregates over the table/block decodes."""
    from yodel_etl_spark.session import ship_package

    ship_package(spark)
    mu = _g711_wav(bytes([0x00, 0x80, 0xFF]), 7)
    rng = np.random.RandomState(5)
    block = struct.pack("<hBB", 77, 15, 0) + rng.randint(
        0, 256, 8, dtype=np.uint8
    ).tobytes()
    ima = _ima_wav(block, 1, 12)
    df = spark.createDataFrame(
        [(1, bytearray(mu)), (2, bytearray(ima))], "id long, content binary"
    )
    rows = {r["id"]: r for r in audio_features(df, "content").collect()}
    assert rows[1]["n_samples"] == 3 and rows[1]["bits"] == 8
    assert rows[1]["peak_abs"] == 32124 and rows[1]["sum_abs"] == 64248
    twin = _ima_twin_decode_block(block, 1)[0]
    assert rows[2]["n_samples"] == 17 and rows[2]["bits"] == 4
    assert rows[2]["sum_abs"] == sum(abs(v) for v in twin)
    assert rows[2]["sum_sq"] == sum(v * v for v in twin)


# ------------------------------------------------- spectral (log-mel) features


def _tone(freq, sr=8000, secs=0.5, amp=12000):
    import numpy as np

    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_spectral_pure_tone_lands_in_the_right_mel_bin():
    """A pure tone's energy must concentrate where the mel scale puts
    its frequency — low tone → low bins, high tone → higher bins — and
    its zero-crossing count is 2·freq·secs ± 1."""
    import numpy as np

    from yodel_etl_spark.scale.audio import spectral_features_of

    for freq in (200, 1500):
        x = _tone(freq)
        n_frames, zc, log_mel, centroid = spectral_features_of(x, 8000, 1)
        assert n_frames > 0
        assert abs(zc - 2 * freq * 0.5) <= 1, (freq, zc)
        assert abs(centroid - freq) < 60, (freq, centroid)
    lo = spectral_features_of(_tone(200), 8000, 1)[2]
    hi = spectral_features_of(_tone(1500), 8000, 1)[2]
    assert int(np.argmax(lo)) < int(np.argmax(hi))


def test_spectral_matches_independent_naive_dft():
    """Pin the kernel against a from-scratch O(n²) DFT + hand-built
    framing — an INDEPENDENT formulation, not the operator's own rfft
    path."""
    import numpy as np

    from yodel_etl_spark.scale.audio import _mel_filterbank, spectral_features_of

    rng = np.random.default_rng(7)
    x = (rng.normal(0, 4000, 700)).astype(np.int16)
    frame, hop, n_mels, sr = 256, 128, 16, 8000
    n_frames, _zc, log_mel, centroid = spectral_features_of(
        x, sr, 1, n_mels=n_mels, frame=frame, hop=hop
    )
    # naive twin
    xf = x.astype(np.float64)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    n = np.arange(frame)
    k = np.arange(frame // 2 + 1)
    dft = np.exp(-2j * np.pi * k[:, None] * n[None, :] / frame)
    specs = []
    for s in range(0, len(xf) - frame + 1, hop):
        fr = xf[s : s + frame] * win
        specs.append(np.abs(dft @ fr) ** 2)
    spec = np.vstack(specs)
    assert len(specs) == n_frames
    fb = _mel_filterbank(n_mels, frame, sr)
    want_logmel = np.log(spec @ fb.T + 1e-10).mean(axis=0)
    np.testing.assert_allclose(log_mel, want_logmel, rtol=1e-9, atol=1e-9)
    freqs = k * (sr / frame)
    want_centroid = (spec * freqs[None, :]).sum() / spec.sum()
    assert abs(centroid - want_centroid) < 1e-6


def test_spectral_stereo_downmix_and_short_blob():
    import numpy as np

    from yodel_etl_spark.scale.audio import spectral_features_of

    # stereo: L = tone, R = -tone → downmix cancels to silence
    x = _tone(400)
    stereo = np.empty(2 * x.shape[0], dtype=np.int16)
    stereo[0::2], stereo[1::2] = x, -x
    n_frames, _zc, log_mel, centroid = spectral_features_of(stereo, 8000, 2)
    assert n_frames > 0 and centroid == 0.0
    assert max(log_mel) < np.log(2e-10)  # numerical silence
    # shorter than one frame → zero frames, zeroed features
    nf, zc, lm, c = spectral_features_of(x[:100], 8000, 1)
    assert (nf, c) == (0, 0.0) and len(lm) == 16 and zc > 0


def test_audio_spectral_operator(spark):
    """The mapInPandas plumbing: schema, per-row values equal the
    kernel, executor-side decode."""
    from yodel_etl_spark.scale.audio import (
        audio_spectral,
        spectral_features_of,
        wav_pack,
    )

    blobs = [(i, wav_pack(_tone(300 + 500 * i), 8000, 16)) for i in range(4)]
    df = spark.createDataFrame(blobs, ["audio_id", "content"])
    out = audio_spectral(df, "content").orderBy("audio_id").collect()
    assert len(out) == 4
    for i, r in enumerate(out):
        nf, zc, lm, c = spectral_features_of(_tone(300 + 500 * i), 8000, 1)
        assert r["n_frames"] == nf and r["zero_crossings"] == zc
        assert abs(r["centroid_hz"] - c) < 1e-9
        assert len(r["log_mel_mean"]) == 16
        assert abs(r["log_mel_mean"][0] - lm[0]) < 1e-9


def test_audio_fingerprint_gain_invariance_and_near_dup(spark):
    """The perceptual-hash contract: uniform gain ⇒ identical
    fingerprint (log-mel band DELTAS cancel the constant shift); small
    additive noise ⇒ small Hamming distance; different content ⇒ far.
    Pairs ride the shared hamming_pairs banding join — the audio member
    of the text-SimHash/image-dHash sketch family."""
    import numpy as np

    from yodel_etl_spark.scale.audio import audio_fingerprint, wav_pack
    from yodel_etl_spark.scale.dedup import hamming_pairs
    from yodel_etl_spark.session import release

    rng = np.random.default_rng(11)
    base = (
        8000 * np.sin(2 * np.pi * 300 * np.arange(8000) / 8000)
        + 3000 * np.sin(2 * np.pi * 950 * np.arange(8000) / 8000)
        + rng.normal(0, 300, 8000)
    )
    clips = {
        0: base,
        1: base * 0.5,                              # gain change
        2: base + rng.normal(0, 120, 8000),          # slight noise
        3: rng.normal(0, 6000, 8000),                # unrelated
    }
    df = spark.createDataFrame(
        [(i, wav_pack(np.clip(x, -32768, 32767).astype(np.int16), 8000, 16))
         for i, x in clips.items()],
        ["audio_id", "content"],
    )
    fps = {r["audio_id"]: r["fp"] for r in audio_fingerprint(df).collect()}
    assert fps[0] == fps[1]  # bit-identical under uniform gain
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fps[0], fps[2]) <= 10, ham(fps[0], fps[2])  # measured 7
    assert ham(fps[0], fps[3]) > 20, ham(fps[0], fps[3])  # measured 31

    sk = audio_fingerprint(df).select("audio_id", "fp")
    pairs = hamming_pairs(sk, "audio_id", "fp", max_distance=10, blocks=16)
    got = {frozenset((r["doc_a"], r["doc_b"])) for r in pairs.collect()}
    release(pairs)
    assert frozenset((0, 1)) in got and frozenset((0, 2)) in got
    assert frozenset((0, 3)) not in got


def test_external_decoder_hook_end_to_end(spark):
    """The r12 pluggable-codec hook: a fake compressed blob (non-RIFF)
    rides audio_features/audio_spectral/audio_fingerprint through a
    mocked external decoder alongside a real WAV — bits=0 marks the
    external rows — while WITHOUT the decoder the same frame still
    raises (the honest default gate, untouched)."""
    from yodel_etl_spark.scale.audio import (
        audio_features,
        audio_fingerprint,
        audio_spectral,
    )

    t = np.arange(2000)
    wav = wav_pack(
        (3000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16),
        sample_rate=8000,
    )
    fake_mp3 = b"ID3\x03\x00" + bytes(range(64))

    def mock_decoder(blob):
        # deterministic samples keyed off the blob bytes
        n = 1600
        x = np.frombuffer((blob * (n // len(blob) + 1))[:n], dtype=np.uint8)
        return (x.astype(np.int16) - 128) * 64, 16000

    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(fake_mp3))],
        "id long, content binary",
    )
    feats = {
        r["id"]: r
        for r in audio_features(df, decoder=mock_decoder).collect()
    }
    assert feats[1]["bits"] == 16 and feats[1]["sample_rate"] == 8000
    assert feats[2]["bits"] == 0  # external decode marker
    assert feats[2]["sample_rate"] == 16000
    assert feats[2]["n_samples"] == 1600
    assert feats[2]["sum_abs"] > 0

    spec = {
        r["id"]: r
        for r in audio_spectral(df, decoder=mock_decoder).collect()
    }
    assert spec[2]["n_frames"] > 0 and len(spec[2]["log_mel_mean"]) == 16
    fp = {
        r["id"]: r["fp"]
        for r in audio_fingerprint(df, decoder=mock_decoder).collect()
    }
    assert isinstance(fp[2], int)

    # default gate intact: same frame, no decoder → the honest raise
    with pytest.raises(Exception, match="RIFF|NotImplemented"):
        audio_features(df).collect()


def test_fused_spectral_fingerprint_bit_identical_to_chain(spark):
    """r15 fusion pin: audio_spectral_fingerprint must equal the
    chained audio_fingerprint(audio_spectral(df)) column-for-column —
    same decode, same kernels, one pass (the optimization only removes
    the second decode and the second JVM↔Python round trip)."""
    from yodel_etl_spark.scale.audio import (
        audio_fingerprint,
        audio_spectral,
        audio_spectral_fingerprint,
        wav_pack,
    )

    blobs = [(i, wav_pack(_tone(300 + 217 * i), 8000, 16)) for i in range(6)]
    df = spark.createDataFrame(blobs, ["audio_id", "content"])
    chained = (
        audio_fingerprint(audio_spectral(df, "content"), "content")
        .orderBy("audio_id")
        .collect()
    )
    fused = (
        audio_spectral_fingerprint(df, "content").orderBy("audio_id").collect()
    )
    assert len(chained) == len(fused) == 6
    assert chained[0].asDict().keys() == fused[0].asDict().keys()
    for a, b in zip(chained, fused):
        assert a.asDict() == b.asDict()
