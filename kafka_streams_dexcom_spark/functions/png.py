"""Minimal stdlib-only PNG codec (zlib + struct), vendored so the REAL
image-decode path runs without PIL.

Why this exists: the multimodal decode stage
(operators/multimodal.py:_decode_real) adapts to whatever codec stack the
cluster ships. PIL is not installable in this environment, which
previously left the real-pixel path written-but-never-executed; this
module gives the engine a genuine PNG decoder with zero dependencies, so
`use_real_codecs=True` decodes actual encoded bytes in CI and a PNG-only
corpus works out of the box on a bare cluster. PIL, when importable,
still takes priority (it covers every format).

Scope (deliberately the PNG subset a training-data fixture needs):
8-bit depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA), all five
scanline filters (None/Sub/Up/Average/Paeth), non-interlaced. Everything
else raises ValueError — an honest per-payload failure, never a silent
wrong answer.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, unfiltered pixel bytes row-major)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, b""
    width = height = color = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG: bit depth {depth}, color type {color}"
                )
            if interlace != 0:
                raise ValueError("unsupported PNG: Adam7 interlacing")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG: nonzero compression/filter method")
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color]
    stride = width * channels
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    for _ in range(height):
        f = raw[i]
        line = bytearray(raw[i + 1 : i + 1 + stride])
        i += 1 + stride
        bpp = channels
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError(f"unsupported PNG scanline filter {f}")
        out += line
        prev = line
    return width, height, channels, bytes(out)


def encode_png(
    width: int, height: int, pixels: bytes, channels: int = 1
) -> bytes:
    """Encode row-major 8-bit pixel bytes (1=gray, 3=RGB, 4=RGBA) as a
    valid non-interlaced PNG (filter 0 scanlines) — the fixture writer
    for decode tests and synthetic corpora."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match width*height*channels")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_features(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_frames=1, mean luminance in [0,1] rounded to
    6 decimals) — the same feature contract as the PIL path in
    _decode_real: grayscale means are bit-identical across both codecs,
    and RGB(A) replays Pillow's exact integer luma
    (R*19595 + G*38470 + B*7471) >> 16, so which codec decoded a payload
    is unobservable in the features."""
    width, height, channels, px = decode_png(payload)
    n = width * height
    if channels == 1:
        total = sum(px)
    else:
        total = 0
        for i in range(0, len(px), channels):
            # alpha (channel 4) is ignored, as in PIL convert("L")
            total += (px[i] * 19595 + px[i + 1] * 38470 + px[i + 2] * 7471) >> 16
    return width, height, 1, round(total / n / 255.0, 6)
