"""Real-pixel image decode without PIL: the vendored stdlib PNG codec
(functions/png.py) and its wiring into the multimodal decode stage.

This closes the r3 gap where _decode_real was written but never executed
(PIL is not installable here): these tests drive the REAL decode path
end-to-end on actual encoded bytes — encoder → Spark mapInPandas →
width/height/frames/mean — with exactly-known expected features. The
stub path and its DuckDB oracles are untouched."""

from __future__ import annotations

import zlib

import pytest

from kafka_streams_dexcom_spark.functions.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    png_features,
)


def test_roundtrip_grayscale():
    px = bytes(range(0, 120))  # 12x10 gradient
    data = encode_png(12, 10, px, channels=1)
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (12, 10, 1)
    assert out == px


def test_roundtrip_rgb_and_rgba():
    px3 = bytes((i * 7) % 256 for i in range(6 * 4 * 3))
    w, h, ch, out = decode_png(encode_png(6, 4, px3, channels=3))
    assert (w, h, ch, out) == (6, 4, 3, px3)
    px4 = bytes((i * 11) % 256 for i in range(5 * 3 * 4))
    w, h, ch, out = decode_png(encode_png(5, 3, px4, channels=4))
    assert (w, h, ch, out) == (5, 3, 4, px4)


def test_decode_all_scanline_filters():
    """A PNG using every filter type (None/Sub/Up/Average/Paeth) must
    reconstruct exactly — hand-built IDAT, filters applied per spec."""
    import struct

    width, height = 4, 5
    rows = [bytes([10, 20, 30, 40]),
            bytes([15, 25, 35, 45]),
            bytes([100, 110, 120, 130]),
            bytes([90, 95, 100, 105]),
            bytes([200, 150, 100, 50])]
    filters = [0, 1, 2, 3, 4]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = b""
    prev = bytes(width)
    for r, f in zip(rows, filters):
        enc = bytearray()
        for x in range(width):
            left = r[x - 1] if x >= 1 else 0
            up = prev[x]
            ul = prev[x - 1] if x >= 1 else 0
            if f == 0:
                v = r[x]
            elif f == 1:
                v = (r[x] - left) & 0xFF
            elif f == 2:
                v = (r[x] - up) & 0xFF
            elif f == 3:
                v = (r[x] - ((left + up) >> 1)) & 0xFF
            else:
                v = (r[x] - paeth(left, up, ul)) & 0xFF
            enc.append(v)
        raw += bytes([f]) + bytes(enc)
        prev = r

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    data = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (width, height, 1)
    assert out == b"".join(rows)


def test_features_known_mean():
    # 2x2 grayscale [0, 51, 102, 255] → mean = 408/4/255 = 0.4
    data = encode_png(2, 2, bytes([0, 51, 102, 255]), channels=1)
    assert png_features(data) == (2, 2, 1, 0.4)


def test_features_rgb_uses_pillow_luma():
    # one pure-red pixel: L = (255*19595) >> 16 = 76
    data = encode_png(1, 1, bytes([255, 0, 0]), channels=3)
    w, h, n, mean = png_features(data)
    assert (w, h, n) == (1, 1, 1)
    assert mean == round(76 / 255.0, 6)


def test_unsupported_pngs_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    import struct

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    bad_depth = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad_depth)


def test_real_decode_path_in_spark(spark):
    """End-to-end through the engine: encoded PNG payloads → mapInPandas
    decode with use_real_codecs=True → exact width/height/frames/mean.
    This is the path a real image corpus takes on a PIL-less cluster."""
    from pyspark.sql import functions as F

    from kafka_streams_dexcom_spark.operators.multimodal import (
        decode_features,
    )

    imgs = [
        (1, encode_png(3, 2, bytes([0, 0, 0, 255, 255, 255]), channels=1)),
        (2, encode_png(2, 2, bytes([0, 51, 102, 255]), channels=1)),
        (3, encode_png(1, 1, bytes([255, 0, 0]), channels=3)),
    ]
    media = spark.createDataFrame(
        [(i, "image", p) for i, p in imgs],
        "doc_id long, media_type string, payload binary",
    )
    got = {
        r.doc_id: (r.width, r.height, r.n_frames, r.feature_mean)
        for r in decode_features(media, use_real_codecs=True).collect()
    }
    assert got == {
        1: (3, 2, 1, 0.5),
        2: (2, 2, 1, 0.4),
        3: (1, 1, 1, round(76 / 255.0, 6)),
    }


def test_real_decode_non_png_without_pil_fails_loudly(spark):
    """Arbitrary bytes labeled 'image' must raise on the real path when
    only the PNG codec is available — never silently fake features."""
    from kafka_streams_dexcom_spark.operators import multimodal as mm

    if mm._HAVE_REAL_CODECS:
        pytest.skip("PIL present: it decodes more than PNG")
    media = spark.createDataFrame(
        [(1, "image", b"not an image at all")],
        "doc_id long, media_type string, payload binary",
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)):
        mm.decode_features(media, use_real_codecs=True).collect()


def test_video_media_still_stubs_on_real_path(spark):
    """Mixed-media frames keep decoding: video payloads fall back to the
    stub until a real video codec lands (documented behavior)."""
    from kafka_streams_dexcom_spark.operators.multimodal import (
        _decode_stub,
        decode_features,
    )

    payload = b"fake video bytes"
    media = spark.createDataFrame(
        [(1, "video", payload)],
        "doc_id long, media_type string, payload binary",
    )
    row = decode_features(media, use_real_codecs=True).collect()[0]
    assert (row.width, row.height, row.n_frames, row.feature_mean) == (
        _decode_stub(payload)
    )
