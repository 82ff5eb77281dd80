"""Real-pixel JPEG decode without PIL: the vendored numpy baseline-JFIF
codec (functions/jpeg.py) and its wiring into the multimodal decode
stage — closing the carried gap where a mixed-format corpus failed on
its first .jpg (PNG landed in r4, functions/png.py).

The encoder exists so these tests run on REAL encoded bitstreams; the
flat-gray golden below pins the exact entropy-coded bytes against the
spec by hand (canonical Huffman codes from the Annex K tables), so
encode/decode cannot cancel out a shared mistake on that path."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_streams_dexcom_spark.functions.jpeg import (
    JPEG_MAGIC,
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_rgb,
    jpeg_features,
)

ONES = np.ones(64)


def test_flat_gray_golden_bitstream():
    """8x8 all-128, all-ones quant: the block is all zeros after level
    shift, so the entropy segment is exactly DC category-0 ('00', the
    only length-2 canonical DC code) + EOB ('1010', the first length-4
    canonical AC code) + '11' padding = 0x2B — hand-derived from Annex
    K's table definitions."""
    data = encode_jpeg_gray(np.full((8, 8), 128, np.uint8), quant=ONES)
    assert data[:2] == JPEG_MAGIC and data[-2:] == b"\xff\xd9"
    assert data[-3:-2] == b"\x2b"
    w, h, c, arr = decode_jpeg(data)
    assert (w, h, c) == (8, 8, 1)
    assert np.array_equal(arr[:, :, 0], np.full((8, 8), 128))


def test_gray_near_lossless_with_ones_quant():
    img = (np.arange(64).reshape(8, 8) * 3 + 10).astype(np.uint8)
    _, _, _, arr = decode_jpeg(encode_jpeg_gray(img, quant=ONES))
    assert np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_gray_multiblock_non_multiple_of_8():
    """DC prediction chains across blocks; odd dimensions crop the
    padded MCU grid back to the declared frame size."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (17, 24), dtype=np.uint8)
    w, h, c, arr = decode_jpeg(encode_jpeg_gray(img, quant=ONES))
    assert (w, h, c) == (24, 17, 1)
    assert np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_restart_interval_decodes_identically():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    _, _, _, a1 = decode_jpeg(encode_jpeg_gray(img, quant=ONES))
    _, _, _, a2 = decode_jpeg(
        encode_jpeg_gray(img, quant=ONES, restart_interval=4)
    )
    assert np.array_equal(a1, a2)


def test_color_444_solid_exact():
    rgb = np.zeros((10, 13, 3), dtype=np.uint8)
    rgb[...] = (200, 60, 120)
    w, h, c, arr = decode_jpeg(
        encode_jpeg_rgb(rgb, luma_quant=ONES, chroma_quant=ONES)
    )
    assert (w, h, c) == (13, 10, 3)
    assert np.abs(arr.astype(int) - rgb.astype(int)).max() == 0


def test_color_420_solid_exact():
    """Solid color survives 2x2 chroma subsampling exactly — isolates
    the 4:2:0 MCU interleave + upsample from quantization loss."""
    rgb = np.zeros((10, 13, 3), dtype=np.uint8)
    rgb[...] = (200, 60, 120)
    w, h, c, arr = decode_jpeg(
        encode_jpeg_rgb(
            rgb, subsample_420=True, luma_quant=ONES, chroma_quant=ONES
        )
    )
    assert (w, h, c) == (13, 10, 3)
    assert np.abs(arr.astype(int) - rgb.astype(int)).max() == 0


def test_color_420_smooth_bounded_error():
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    rgb = np.stack(
        [
            128 + 60 * np.sin(xx / 9),
            128 + 50 * np.cos(yy / 7),
            128 + 40 * np.sin((xx + yy) / 11),
        ],
        -1,
    ).astype(np.uint8)
    _, _, _, arr = decode_jpeg(encode_jpeg_rgb(rgb, subsample_420=True))
    assert np.abs(arr.astype(float) - rgb.astype(float)).mean() < 8


def test_unsupported_jpegs_raise():
    data = encode_jpeg_gray(np.full((8, 8), 99, np.uint8))
    # progressive SOF2 instead of SOF0
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG1234")


def test_features_known_mean():
    img = np.zeros((2, 3), dtype=np.uint8)
    img[0, :] = 0
    img[1, :] = 255
    w, h, n, mean = jpeg_features(encode_jpeg_gray(img, quant=ONES))
    assert (w, h, n) == (3, 2, 1)
    assert abs(mean - 0.5) < 0.01


def test_real_decode_path_in_spark(spark):
    """End-to-end through the engine: encoded JPEG payloads →
    mapInPandas decode with use_real_codecs=True — the path a mixed
    PNG/JPEG corpus takes on a PIL-less cluster."""
    from kafka_streams_dexcom_spark.functions.png import encode_png
    from kafka_streams_dexcom_spark.operators.multimodal import (
        decode_features,
    )

    flat = np.full((8, 8), 128, np.uint8)
    grad = np.zeros((2, 3), dtype=np.uint8)
    grad[1, :] = 255
    media = spark.createDataFrame(
        [
            (1, "image", encode_jpeg_gray(flat, quant=ONES)),
            (2, "image", encode_jpeg_gray(grad, quant=ONES)),
            # PNG in the same frame: the dispatch handles both formats
            (3, "image", encode_png(2, 2, bytes([0, 51, 102, 255]), channels=1)),
        ],
        "doc_id long, media_type string, payload binary",
    )
    got = {
        r.doc_id: (r.width, r.height, r.n_frames, r.feature_mean)
        for r in decode_features(media, use_real_codecs=True).collect()
    }
    assert got[1] == (8, 8, 1, round(128 / 255.0, 6))
    assert got[3] == (2, 2, 1, 0.4)
    assert got[2][0:3] == (3, 2, 1) and abs(got[2][3] - 0.5) < 0.01

def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: encoders may pad with any number of 0xFF fill bytes
    before a marker. 0xFF 0xFF <marker> must parse as <marker>, not as a
    bogus 0xFF segment whose 'length' skips arbitrary bytes."""
    img = (np.arange(64).reshape(8, 8) * 2 + 50).astype(np.uint8)
    data = encode_jpeg_gray(img, quant=ONES)
    base = decode_jpeg(data)[3]
    # inject fill bytes before the DQT marker and before EOI
    padded = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    padded = padded[:-2] + b"\xff\xff" + padded[-2:]
    w, h, c, arr = decode_jpeg(padded)
    assert (w, h, c) == (8, 8, 1)
    np.testing.assert_array_equal(arr, base)
