"""Property-based codec tests (hypothesis): the vendored protobuf wire
codec and baseline JPEG codec against randomized inputs. These run on
the PURE codec layers (no Spark per example — the Spark wiring has its
own golden/round-trip tests), so the example budget can be generous."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_dexcom_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
)
from kafka_streams_dexcom_spark.functions.protobuf import (
    _decode_scalar,
    _encode_field,
    _varint_decode,
    _varint_encode,
)

_FAST = dict(max_examples=200, deadline=None)
_SLOW = dict(max_examples=25, deadline=None)


@given(u=st.integers(0, 2**64 - 1))
@settings(**_FAST)
def test_varint_roundtrip(u):
    buf = _varint_encode(u)
    assert len(buf) <= 10
    v, pos = _varint_decode(buf, 0)
    assert v == u and pos == len(buf)


@given(v=st.integers(-(2**63), 2**63 - 1))
@settings(**_FAST)
def test_int64_field_roundtrip(v):
    wire = _encode_field(1, "int64", v)
    # tag byte for field 1 / wire type 0 is 0x08
    assert wire[0] == 0x08
    got, pos = _decode_scalar("int64", wire, 1)
    assert got == v and pos == len(wire)


@given(v=st.integers(-(2**31), 2**31 - 1))
@settings(**_FAST)
def test_int32_field_roundtrip(v):
    wire = _encode_field(1, "int32", v)
    got, pos = _decode_scalar("int32", wire, 1)
    assert got == v and pos == len(wire)


@given(s=st.text(max_size=80))
@settings(**_FAST)
def test_string_field_roundtrip(s):
    wire = _encode_field(2, "string", s)
    got, pos = _decode_scalar("string", wire, 1)
    assert got == s and pos == len(wire)


@given(b=st.binary(max_size=80))
@settings(**_FAST)
def test_bytes_field_roundtrip(b):
    wire = _encode_field(3, "bytes", b)
    got, pos = _decode_scalar("bytes", wire, 1)
    assert got == b and pos == len(wire)


@given(
    v=st.floats(
        allow_nan=True, allow_infinity=True, width=64
    )
)
@settings(**_FAST)
def test_double_field_bitexact_roundtrip(v):
    wire = _encode_field(4, "double", v)
    got, pos = _decode_scalar("double", wire, 1)
    assert pos == len(wire)
    # bit-exact including NaN payloads, infinities, and -0.0
    assert struct.pack("<d", got) == struct.pack("<d", v)


@given(v=st.floats(allow_nan=True, allow_infinity=True, width=32))
@settings(**_FAST)
def test_float_field_bitexact_roundtrip(v):
    wire = _encode_field(5, "float", v)
    got, pos = _decode_scalar("float", wire, 1)
    assert pos == len(wire)
    assert struct.pack("<f", got) == struct.pack("<f", v)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SLOW)
def test_jpeg_gray_ones_quant_near_lossless(h, w, seed):
    """With an all-ones quant table the only loss is DCT round-off:
    every pixel must land within 1 of the original, at ANY shape —
    including non-multiple-of-8 dimensions that exercise the edge-pad
    and crop paths."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dw, dh, c, arr = decode_jpeg(encode_jpeg_gray(img, quant=np.ones(64)))
    assert (dw, dh, c) == (w, h, 1)
    assert np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max() <= 1


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    interval=st.integers(1, 5),
)
@settings(**_SLOW)
def test_jpeg_restart_interval_invariant(h, w, seed, interval):
    """Restart markers partition the entropy stream without changing a
    single decoded pixel, for any interval and image shape."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    ones = np.ones(64)
    _, _, _, a = decode_jpeg(encode_jpeg_gray(img, quant=ones))
    _, _, _, b = decode_jpeg(
        encode_jpeg_gray(img, quant=ones, restart_interval=interval)
    )
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# WARC record codec (sources/corpus.py): arbitrary payloads — including
# bytes embedding the CRLF record separator and fake version lines —
# must round-trip through writer → parser on Content-Length framing
# alone, in any record order, and per-record gzip members must
# decompress to the identical stream.

from kafka_streams_dexcom_spark.sources.corpus import (  # noqa: E402
    http_response_bytes,
    iter_warc_records,
    parse_http_response,
    warc_record_bytes,
)

_warc_header_val = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=30,
)


@given(
    recs=st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "warcinfo", "metadata"]),
            _warc_header_val,
            st.binary(max_size=300),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_FAST)
def test_warc_stream_roundtrip(recs):
    data = b"".join(
        warc_record_bytes(t, {"WARC-Target-URI": uri}, payload)
        for t, uri, payload in recs
    )
    got = list(iter_warc_records(data))
    assert len(got) == len(recs)
    for (t, uri, payload), (headers, body) in zip(recs, got):
        assert headers["warc-type"] == t
        assert headers["warc-target-uri"] == uri
        assert body == payload
        assert int(headers["content-length"]) == len(payload)


@given(
    payloads=st.lists(st.binary(max_size=200), min_size=1, max_size=6),
    status=st.sampled_from([200, 301, 404, 500]),
)
@settings(**_FAST)
def test_warc_gzip_members_and_http_split(payloads, status):
    import gzip

    recs = [
        warc_record_bytes(
            "response",
            {"Content-Type": "application/http;msgtype=response"},
            http_response_bytes(p, status=status),
        )
        for p in payloads
    ]
    # per-record gzip members (Common Crawl layout) decompress to the
    # exact concatenated plain stream the reader parses
    gz = b"".join(gzip.compress(r, mtime=0) for r in recs)
    assert gzip.decompress(gz) == b"".join(recs)
    for payload, (_h, rec_payload) in zip(
        payloads, iter_warc_records(b"".join(recs))
    ):
        got_status, _ctype, body = parse_http_response(rec_payload)
        assert got_status == status
        assert body == payload


@given(cut=st.integers(1, 40), payload=st.binary(min_size=0, max_size=64))
@settings(**_FAST)
def test_warc_any_truncation_raises_never_silently_drops(cut, payload):
    rec = warc_record_bytes("response", {}, payload)
    truncated = rec[: max(0, len(rec) - 4 - cut)]  # keep it genuinely short
    if not truncated:
        return
    try:
        got = list(iter_warc_records(truncated))
    except ValueError:
        return  # loud failure is the contract
    # the only acceptable silent outcome is a clean whole-record prefix
    assert all(b == payload for _h, b in got) and len(got) <= 1


# --- RIFF/WAVE PCM codec ---------------------------------------------------

from kafka_streams_dexcom_spark.functions.wav import (  # noqa: E402
    wav_decode,
    wav_encode,
    wav_features,
)


@given(
    frames=st.integers(0, 300),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**32 - 1),
)
@settings(**_FAST)
def test_wav_roundtrip_any_geometry(frames, ch, rate, bits, seed):
    rng = np.random.default_rng(seed)
    lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
    samples = rng.integers(lo, hi, size=frames * ch, dtype=np.int64)
    payload = wav_encode(samples, rate, ch, bits)
    r_rate, r_ch, r_bits, got = wav_decode(payload)
    assert (r_rate, r_ch, r_bits) == (rate, ch, bits)
    np.testing.assert_array_equal(got, samples.astype(np.int16))
    # RIFF size field covers the whole payload minus the 8-byte header
    assert struct.unpack("<I", payload[4:8])[0] == len(payload) - 8


def test_wav_golden_header_bytes():
    """Hand-derived canonical file: 2 mono 16-bit samples at 8000 Hz.
    Pins the exact field layout (PCM code, byte rate, block align) so a
    struct-order regression cannot round-trip its way past the suite."""
    payload = wav_encode(np.array([1, -2]), 8000, 1, 16)
    assert payload == (
        b"RIFF" + struct.pack("<I", 40) + b"WAVE"
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 4) + b"\x01\x00\xfe\xff"
    )


def test_wav_odd_8bit_data_chunk_is_padded():
    payload = wav_encode(np.array([5, -5, 7]), 8000, 1, 8)
    assert len(payload) % 2 == 0  # pad byte after odd-sized data chunk
    _, _, bits, got = wav_decode(payload)
    assert bits == 8
    np.testing.assert_array_equal(got, [5, -5, 7])


def test_wav_decode_skips_unknown_chunks():
    """A LIST/INFO chunk (odd-sized, so its pad byte is exercised)
    between fmt and data must be skipped by declared size."""
    base = wav_encode(np.array([100, -100]), 16000, 1, 16)
    fmt_chunk = base[12:36]  # 'fmt ' + size + 16 body bytes
    data_chunk = base[36:]
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = fmt_chunk + info + data_chunk
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, ch, bits, got = wav_decode(payload)
    assert (rate, ch, bits) == (16000, 1, 16)
    np.testing.assert_array_equal(got, [100, -100])


@given(cut=st.integers(1, 43))
@settings(**_FAST)
def test_wav_truncation_raises(cut):
    payload = wav_encode(np.arange(-8, 8), 8000, 2, 16)
    import pytest

    with pytest.raises(ValueError):
        wav_decode(payload[: len(payload) - cut])


def test_wav_rejects_non_pcm_and_bad_depth():
    import pytest

    good = wav_encode(np.array([0, 1]), 8000, 1, 16)
    # flip format code to 3 (IEEE float)
    bad_code = good[:20] + struct.pack("<H", 3) + good[22:]
    with pytest.raises(ValueError, match="format code"):
        wav_decode(bad_code)
    bad_bits = good[:34] + struct.pack("<H", 24) + good[36:]
    with pytest.raises(ValueError, match="bit depth"):
        wav_decode(bad_bits)
    with pytest.raises(ValueError):
        wav_encode(np.array([0]), 8000, 1, 24)


def test_wav_features_integer_contract():
    # mono: samples [-32768, 32512]; mean_abs_milli floors exactly
    payload = wav_encode(np.array([-32768, 32512]), 8000, 1, 16)
    assert wav_features(payload) == (
        8000, 1, 2, 32768, (32768 + 32512) * 1000 // 2,
    )
    empty = wav_encode(np.array([], dtype=np.int64), 44100, 2, 16)
    assert wav_features(empty) == (44100, 2, 0, 0, 0)


# --- POSIX ustar / WebDataset codec ----------------------------------------

from kafka_streams_dexcom_spark.sources.corpus import (  # noqa: E402
    iter_tar_members,
    tar_end_bytes,
    tar_member_bytes,
)


@given(
    members=st.lists(
        st.tuples(
            st.integers(0, 10**8),
            st.sampled_from(["txt", "cls", "jpg", "seg.png"]),
            st.binary(max_size=1400),
        ),
        max_size=12,
    )
)
@settings(**_FAST)
def test_tar_roundtrip_members(members):
    names = [f"{k:08d}.{ext}" for k, ext, _ in members]
    blob = b"".join(
        tar_member_bytes(n, p) for n, (_, _, p) in zip(names, members)
    ) + tar_end_bytes()
    assert len(blob) % 512 == 0  # every member padded to block size
    got = list(iter_tar_members(blob))
    assert [n for n, _ in got] == names
    assert [p for _, p in got] == [p for _, _, p in members]


def test_tar_golden_header_fields():
    """Pin the exact ustar layout: octal size, spaced-out checksum,
    magic, typeflag — a field-offset regression must not round-trip."""
    m = tar_member_bytes("00000001.txt", b"hello")
    assert m[0:12] == b"00000001.txt"
    assert m[124:136] == b"00000000005\x00"
    assert m[156] == ord("0")
    assert m[257:263] == b"ustar\x00"
    stored = int(m[148:156].split(b"\x00")[0], 8)
    hdr = bytearray(m[:512])
    hdr[148:156] = b" " * 8
    assert stored == sum(hdr)
    assert m[512:517] == b"hello" and len(m) == 1024


@given(cut=st.integers(1, 2000))
@settings(**_FAST)
def test_tar_truncation_never_yields_wrong_data(cut):
    """Cutting into the data region (member header/payload/pad or the
    FIRST zero block) must raise; cutting only the tail of the end
    marker loses no data, so the member must come back intact — either
    way, never silently fewer/damaged samples."""
    import pytest

    blob = (
        tar_member_bytes("00000001.txt", b"x" * 700) + tar_end_bytes()
    )
    # layout: member blocks [0, 1536), end marker [1536, 2560)
    short = blob[: len(blob) - cut]
    if cut <= 512:  # first zero block still complete
        assert list(iter_tar_members(short)) == [
            ("00000001.txt", b"x" * 700)
        ]
    else:
        with pytest.raises(ValueError):
            list(iter_tar_members(short))


def test_tar_checksum_and_magic_rejected():
    import pytest

    good = tar_member_bytes("a.txt", b"data") + tar_end_bytes()
    bad_sum = bytes([good[0] ^ 1]) + good[1:]
    with pytest.raises(ValueError, match="checksum"):
        list(iter_tar_members(bad_sum))
    bad_magic = good[:257] + b"gnu??\x00" + good[263:]
    with pytest.raises(ValueError, match="magic"):
        list(iter_tar_members(bad_magic))


def test_tar_skips_non_regular_members():
    dirhdr = bytearray(tar_member_bytes("d/", b""))
    dirhdr[156] = ord("5")  # directory typeflag
    dirhdr[148:156] = b" " * 8
    dirhdr[148:156] = f"{sum(dirhdr[:512]):06o}".encode() + b"\x00 "
    blob = bytes(dirhdr) + tar_member_bytes("d/x.txt", b"y") + tar_end_bytes()
    got = list(iter_tar_members(blob))
    assert got == [("d/x.txt", b"y")]


# --- RIFF/AVI uncompressed video codec -------------------------------------

from kafka_streams_dexcom_spark.functions.avi import (  # noqa: E402
    avi_decode,
    avi_encode,
    avi_features,
)


@given(
    n_frames=st.integers(0, 6),
    w=st.sampled_from([4, 8, 12, 16]),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**32 - 1),
)
@settings(**_FAST)
def test_avi_roundtrip_any_geometry(n_frames, w, h, seed):
    """Round-trip across geometries INCLUDING widths whose 3-byte rows
    need DIB 4-byte padding (w=4: stride 12 ok; w=12: 36 ok; the
    padding logic itself is pinned by the stride formula) and the
    zero-frame empty-movi case."""
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (h, w)).astype(np.uint8)
        for _ in range(n_frames)
    ]
    p = avi_encode(frames)
    rw, rh, got = avi_decode(p)
    if n_frames:
        assert (rw, rh, len(got)) == (w, h, n_frames)
        for a, b in zip(frames, got):
            np.testing.assert_array_equal(a, b)
    else:
        assert got == []
    assert struct.unpack("<I", p[4:8])[0] == len(p) - 8


def test_avi_rejects_compressed_and_wrong_depth():
    import pytest

    good = avi_encode([np.zeros((8, 8), np.uint8)])
    strf_at = good.index(b"strf") + 8
    # biCompression lives 16 bytes into BITMAPINFOHEADER
    bad_comp = (
        good[: strf_at + 16]
        + struct.pack("<I", 0x44495658)  # 'XVID'
        + good[strf_at + 20 :]
    )
    with pytest.raises(ValueError, match="compressed"):
        avi_decode(bad_comp)
    bad_bits = (
        good[: strf_at + 14]
        + struct.pack("<H", 8)
        + good[strf_at + 16 :]
    )
    with pytest.raises(ValueError, match="bit depth"):
        avi_decode(bad_bits)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        avi_decode(b"RIFF\x04\x00\x00\x00WAVE")


@given(cut=st.integers(1, 200))
@settings(**_FAST)
def test_avi_truncation_raises(cut):
    import pytest

    p = avi_encode([np.full((8, 8), 9, np.uint8)] * 2)
    with pytest.raises(ValueError):
        avi_decode(p[: len(p) - cut])


def test_avi_features_integer_means():
    f0 = np.zeros((8, 8), np.uint8)
    f1 = np.full((8, 8), 255, np.uint8)
    f2 = np.arange(64, dtype=np.uint8).reshape(8, 8)
    w, h, n, means = avi_features(avi_encode([f0, f1, f2]))
    assert (w, h, n) == (8, 8, 3)
    assert means == [0, 255000, (63 * 64 // 2) * 1000 // 64]


def test_avi_flags_consistent_with_missing_index():
    """avih dwFlags must NOT advertise AVIF_HASINDEX (0x10): no idx1
    chunk is written, and a strict index-trusting player would fail on
    the missing index. dwFlags sits 12 bytes into the avih payload."""
    frames = [np.zeros((4, 4), np.uint8)]
    p = avi_encode(frames)
    at = p.find(b"avih")
    assert at > 0
    flags = struct.unpack_from("<I", p, at + 8 + 12)[0]
    assert flags & 0x10 == 0
    assert b"idx1" not in p
