"""BMP + GIF pixel decoder tests over hand-assembled fixtures (no codec
library exists here, so the GIF test carries its own minimal LZW
compressor — exercising code growth and CLEAR handling for real)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from yodel_etl_spark.scale.codecs import decode_bmp_pixels, decode_gif_pixels
from yodel_etl_spark.scale.multimodal import decode_pixels, parse_image_header


def build_bmp(px: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """(h, w, 3) RGB → BI_RGB BMP bytes (24/32 bpp)."""
    h, w, _ = px.shape
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = px[:, :, ::-1]
    if nch == 4:
        bgr = np.concatenate([bgr, np.full((h, w, 1), 0xAA, np.uint8)], axis=2)
    rows[:, : w * nch] = bgr.reshape(h, w * nch)
    if not top_down:
        rows = rows[::-1]
    data = rows.tobytes()
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0, len(data), 0, 0, 0, 0
    )
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + dib + data


def lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Minimal GIF-LZW compressor (clear at start, end at finish, code
    growth mirrored from the decoder's rules)."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out_bits: list[tuple[int, int]] = [(clear, code_size)]
    seq: tuple[int, ...] = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        out_bits.append((table[seq], code_size))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        seq = (idx,)
    if seq:
        out_bits.append((table[seq], code_size))
    out_bits.append((end, code_size))
    acc = nbits = 0
    data = bytearray()
    for code, size in out_bits:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc)
    return bytes(data)


def build_gif(grid: np.ndarray, palette: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w) palette indices + (n, 3) palette → single-frame GIF."""
    h, w = grid.shape
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    n_slots = 1 << depth
    pal = np.zeros((n_slots, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag + size
    out += pal.tobytes()
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
    rows = grid
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = grid[order]
    min_code_size = max(2, depth)
    out += bytes([min_code_size])
    data = lzw_encode(min_code_size, rows.flatten().tolist())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _rng_img(h, w, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_24bpp_bottom_up_roundtrip():
    img = _rng_img(5, 7)  # odd width exercises row padding
    blob = build_bmp(img)
    assert parse_image_header(blob) == (7, 5, 3)
    assert (decode_bmp_pixels(blob) == img).all()


def test_bmp_top_down_and_32bpp():
    img = _rng_img(4, 3, seed=9)
    assert (decode_bmp_pixels(build_bmp(img, top_down=True)) == img).all()
    assert (decode_bmp_pixels(build_bmp(img, bpp=32)) == img).all()


def test_bmp_rle_raises():
    img = _rng_img(4, 4)
    blob = bytearray(build_bmp(img))
    blob[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp_pixels(bytes(blob))


def test_gif_roundtrip_with_code_growth():
    # 300 pixels over a 4-color palette: the LZW table outgrows the
    # initial code size, exercising growth on both sides
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 4, (15, 20), dtype=np.uint8)
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    blob = build_gif(grid, palette)
    assert parse_image_header(blob) == (20, 15, 3)
    assert (decode_gif_pixels(blob) == palette[grid]).all()


def test_gif_interlaced():
    rng = np.random.default_rng(5)
    grid = rng.integers(0, 8, (13, 6), dtype=np.uint8)
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    blob = build_gif(grid, palette, interlace=True)
    assert (decode_gif_pixels(blob) == palette[grid]).all()


def test_decode_pixels_routes_all_four_formats():
    img = _rng_img(4, 4, seed=11)
    assert (decode_pixels(build_bmp(img)) == img).all()
    grid = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    palette = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    assert (decode_pixels(build_gif(grid, palette)) == palette[grid]).all()
    with pytest.raises(NotImplementedError):
        decode_pixels(b"RIFF....WAVEfmt " + b"\x00" * 32)  # audio, not an image


def test_gif_subrect_frame_composites_on_background_index():
    """A first frame smaller than the logical screen must composite
    onto the header's BACKGROUND color index (byte 11), not palette
    slot 0."""
    from yodel_etl_spark.scale.codecs import decode_gif_pixels

    palette = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], dtype=np.uint8)
    grid = np.array([[1, 1], [1, 1]], dtype=np.uint8)  # 2x2 red frame
    blob = bytearray(build_gif(grid, palette))
    # widen the logical screen to 4x4 and set background index to 2
    blob[6:10] = struct.pack("<HH", 4, 4)
    blob[11] = 2
    px = decode_gif_pixels(bytes(blob))
    assert px.shape == (4, 4, 3)
    assert (px[:2, :2] == [200, 0, 0]).all()  # the frame itself
    assert (px[3, 3] == [0, 200, 0]).all()  # background = index 2, NOT slot 0


def test_lzw_first_code_out_of_range_raises_valueerror():
    """A corrupt stream whose FIRST code after start/CLEAR is outside
    the table must raise the module's documented ValueError — the
    unguarded table[code] lookup used to surface an IndexError."""
    from yodel_etl_spark.scale.codecs import _lzw_decode

    # min_code_size=2: table has 6 entries (4 literals + CLEAR + END),
    # 3-bit codes; first code 7 is out of range
    with pytest.raises(ValueError, match="corrupt LZW stream"):
        _lzw_decode(2, bytes([0b00000111]), 10)
