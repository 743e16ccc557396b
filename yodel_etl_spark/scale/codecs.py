"""Pure-stdlib BMP and GIF pixel decoders.

Together with the PNG (``multimodal.decode_png_pixels``) and baseline
JPEG (``jpeg.decode_jpeg_pixels``) paths this completes dependency-free
pixel decode for every image format whose header
``multimodal.parse_image_header`` recognizes — the honest
``NotImplementedError`` gate in ``try_real_decode`` now covers only
video.  Scope is the dominant profile of each container, with loud
``ValueError`` on anything else:

* BMP: uncompressed ``BI_RGB`` at 8 (palette), 24, 32 bpp, bottom-up or
  top-down, 4-byte row padding — no RLE, no bitfields.
* GIF: first image frame, global or local color table, interlaced or
  not, full LZW with code growth and CLEAR/END handling.  Animation
  frames beyond the first are ignored (frame 1 IS the still image).
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp_pixels(blob: bytes) -> np.ndarray:
    """BMP → ``(h, w, channels)`` uint8 (channels 3; 32 bpp alpha is
    dropped — BMP alpha is rarely meaningful and the other decoders'
    oracle surface is RGB)."""
    if blob[:2] != b"BM" or len(blob) < 54:
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (dib,) = struct.unpack("<I", blob[14:18])
    if dib < 40:
        raise ValueError(f"unsupported DIB header size {dib} (BITMAPCOREHEADER)")
    w, h_raw = struct.unpack("<ii", blob[18:26])
    (planes, bpp) = struct.unpack("<HH", blob[26:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * (bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    raw = np.frombuffer(blob, dtype=np.uint8, count=h * stride, offset=data_off)
    rows = raw.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette: BGRX quads between the DIB header and the pixel data
        (n_colors,) = struct.unpack("<I", blob[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + dib
        pal = np.frombuffer(
            blob, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        idx = rows[:, :w]
        return np.ascontiguousarray(pal[idx])
    nch = bpp // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR(A) -> RGB


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-variant LZW: codes grow from ``min_code_size``+1 up to 12
    bits; CLEAR resets the table, END stops."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                # first code after start/CLEAR must be a literal already
                # in the table — an out-of-range code is corruption and
                # must raise the module's documented ValueError, not an
                # IndexError from the bare lookup
                if code >= len(table):
                    raise ValueError("corrupt LZW stream")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif_pixels(blob: bytes) -> np.ndarray:
    """GIF (first frame) → ``(h, w, 3)`` uint8 RGB."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", blob[6:10])
    flags = blob[10]
    bg_index = blob[11]  # background color index (only meaningful with a GCT)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob, dtype=np.uint8, count=n * 3, offset=pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(blob):
        b = blob[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack("<HHHH", blob[pos + 1 : pos + 9])
            iflags = blob[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(
                    blob, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(-1, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code_size = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos]:
                ln = blob[pos]
                data += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code_size, bytes(data), w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            grid = np.array(idx[: w * h], dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row order
                deinter = np.empty_like(grid)
                rows = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                deinter[rows] = grid
                grid = deinter
            if (left, top, w, h) != (0, 0, sw, sh):
                # frame 1 smaller than the logical screen: place it on a
                # screen-sized canvas filled with the header's
                # BACKGROUND color index (byte 11) — index 0 is just
                # whatever the palette's first slot holds
                bg = bg_index if bg_index < len(ct) else 0
                canvas = np.full((sh, sw), bg, dtype=np.uint8)
                canvas[top : top + h, left : left + w] = grid
                grid = canvas
            return ct[grid]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block {b:#x}")
    raise ValueError("no image data in GIF")


def bmp_pack(px: np.ndarray) -> bytes:
    """``(h, w, 3)`` uint8 RGB → 24-bpp BI_RGB BMP bytes — the encode
    twin of :func:`decode_bmp_pixels` (fixture planting + roundtrip
    tests, the ``wav_pack``/``write_warc`` convention).  Bottom-up rows,
    BGR order, 4-byte row padding; ``decode_bmp_pixels(bmp_pack(px))``
    is pixel-exact."""
    a = np.asarray(px, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got shape {a.shape}")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[:, :, [2, 1, 0]].reshape(h, w * 3)  # RGB -> BGR
    data = rows[::-1].tobytes()  # bottom-up
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    return header + dib + data
