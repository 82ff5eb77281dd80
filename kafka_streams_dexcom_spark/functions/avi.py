"""Vendored uncompressed-AVI codec (pure stdlib + numpy) — the video
leg of the multimodal format matrix, beside functions/png.py /
functions/jpeg.py (images) and functions/wav.py (audio). AVI is the
second RIFF container in the repo: the same chunk grammar as WAVE
(fourcc + little-endian size + word-aligned body) with LIST recursion.

Layout implemented (the canonical 'DIB ' / BI_RGB path every player
accepts): RIFF('AVI ') → LIST hdrl [avih main header, LIST strl
[strh 'vids', strf BITMAPINFOHEADER]] → LIST movi ['00db' raw frames].
Frames are bottom-up 24-bit BGR rows (positive biHeight, the DIB
convention), each row padded to a 4-byte boundary. The optional idx1
index is omitted on encode (AVIF_MUSTUSEINDEX is not set) and ignored
on decode.

Honest-failure contract (the functions/wav.py discipline): anything
that is not uncompressed 24-bit RGB — a compressed fourcc, a missing
header, a truncated frame — raises ValueError rather than guessing.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries


def avi_encode(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode grayscale HxW uint8 frames as an uncompressed 24-bit AVI
    (each gray value tripled into BGR). All frames must share one
    geometry; zero frames is legal (an empty movi list)."""
    if frames:
        h, w = frames[0].shape
        if any(f.shape != (h, w) for f in frames):
            raise ValueError("all frames must share one geometry")
    else:
        h = w = 8
    stride = _row_stride(w)
    size_image = stride * h
    movi_parts = []
    for f in frames:
        if f.dtype != np.uint8:
            raise ValueError("frames must be uint8")
        # bottom-up DIB row order, gray tripled to BGR, rows padded to
        # the 4-byte stride — one vectorized build per frame (a
        # per-row Python loop here dominated the whole encode at 65
        # frames/clip: measured x3.75 -> x2 on the video-phash probe)
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, : w * 3] = np.repeat(f[::-1], 3, axis=1)
        movi_parts.append(_chunk(b"00db", body.tobytes()))
    movi_body = b"".join(movi_parts)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        size_image * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: AVIF_HASINDEX off — no idx1 chunk is emitted, so
        # advertising one (0x10) would break strict index-trusting players
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        size_image,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
            size_image, 0xFFFFFFFF, 0,
        ) + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return AVI_MAGIC + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body_at = pos + 8
        if body_at + size > end:
            raise ValueError(f"AVI: chunk {cid!r} overruns container")
        yield cid, body_at, size
        pos = body_at + size + (size % 2)


def avi_decode(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode an uncompressed 24-bit AVI into (width, height, frames)
    with frames as top-down HxW uint8 grayscale (BGR averaged would be
    lossy for color; for the tripled-gray encoding any channel is the
    value — the blue channel is taken). Raises on compressed streams,
    non-24-bit depth, or truncation."""
    if (
        len(payload) < 12
        or payload[:4] != AVI_MAGIC
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    end = 8 + riff_size
    if end > len(payload):
        raise ValueError("truncated RIFF payload")
    w = h = None
    frames: list[np.ndarray] = []
    movi_ranges: list[tuple[int, int]] = []
    for cid, at, size in _iter_chunks(payload, 12, end):
        if cid == b"LIST":
            fourcc = payload[at : at + 4]
            if fourcc == b"hdrl":
                for c2, at2, sz2 in _iter_chunks(payload, at + 4, at + size):
                    if c2 == b"LIST" and payload[at2 : at2 + 4] == b"strl":
                        for c3, at3, sz3 in _iter_chunks(
                            payload, at2 + 4, at2 + sz2
                        ):
                            if c3 == b"strf":
                                (
                                    _bisz, bw, bh, _pl, bits, comp
                                ) = struct.unpack(
                                    "<IiiHHI", payload[at3 : at3 + 20]
                                )
                                if comp != 0:
                                    raise ValueError(
                                        "AVI: compressed stream "
                                        f"(biCompression={comp}); only "
                                        "uncompressed BI_RGB supported"
                                    )
                                if bits != 24:
                                    raise ValueError(
                                        f"AVI: bit depth {bits} "
                                        "unsupported (24 only)"
                                    )
                                w, h = bw, abs(bh)
            elif fourcc == b"movi":
                movi_ranges.append((at + 4, at + size))
    if w is None:
        raise ValueError("AVI: no strf video format header found")
    stride = _row_stride(w)
    for lo, hi in movi_ranges:
        for cid, at, size in _iter_chunks(payload, lo, hi):
            if cid in (b"00db", b"00dc"):
                if size != stride * h:
                    raise ValueError("AVI: frame size mismatch")
                raw = np.frombuffer(
                    payload[at : at + size], dtype=np.uint8
                ).reshape(h, stride)
                bgr = raw[:, : w * 3].reshape(h, w, 3)
                frames.append(bgr[::-1, :, 0].copy())  # un-flip, take B
    return w, h, frames


def avi_features(payload: bytes) -> tuple[int, int, int, list[int]]:
    """(width, height, n_frames, per-frame mean in milli-units) — the
    integer feature set a SQL oracle can replay exactly. The per-frame
    mean is over the frame's PIXELS: ⌊Σv·1000 / (w·h)⌋."""
    w, h, frames = avi_decode(payload)
    means = [
        int(f.astype(np.int64).sum() * 1000 // (w * h)) for f in frames
    ]
    return w, h, len(frames), means
