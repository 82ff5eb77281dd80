"""Vendored RIFF/WAVE PCM codec (pure stdlib + numpy) — the audio leg
of the multimodal format matrix, beside functions/png.py (stdlib PNG)
and functions/jpeg.py (numpy baseline JFIF).

Spec: RIFF chunks ("WAVE" form, Microsoft/IBM 1991; the container
ffmpeg/soundfile write for canonical PCM). Implemented honestly rather
than minimally:

- chunk WALK, not fixed offsets: readers that assume `data` at byte 44
  break on files with LIST/INFO, fact, or cue chunks — we skip unknown
  chunks by their declared size;
- RIFF word alignment: an odd-sized chunk is followed by one pad byte
  that is NOT counted in its size field;
- PCM format code 1 only, 8-bit (unsigned, offset-128) and 16-bit
  (signed little-endian) — the two canonical PCM widths; anything else
  (float32 code 3, extensible 0xFFFE, compressed) raises rather than
  mis-decoding;
- `fact`-less canonical layout on encode; decode tolerates any chunk
  order as long as `fmt ` precedes `data` (the spec's one ordering
  guarantee).

Reference parity anchor: the engine treats media payloads as opaque
binary columns with typed metadata (SURVEY.md §2 multimodal family);
this codec makes the audio decode step REAL on a bare cluster, the
same contract functions/png.py provides for images.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"
_WAVE = b"WAVE"
_PCM = 1


def wav_encode(
    samples: np.ndarray,
    sample_rate: int,
    n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Encode interleaved PCM samples as a canonical RIFF/WAVE file.

    ``samples``: 1-D interleaved int array, length = frames·channels.
    16-bit expects values in int16 range (stored signed LE); 8-bit
    expects values in [-128, 127] (stored unsigned, offset-128, per the
    WAV convention that 8-bit audio is unsigned)."""
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    if n_channels < 1:
        raise ValueError("n_channels must be >= 1")
    s = np.asarray(samples)
    if s.ndim != 1 or s.size % n_channels:
        raise ValueError("samples must be 1-D interleaved, len % channels == 0")
    if bits == 16:
        if s.size and (s.max() > 32767 or s.min() < -32768):
            raise ValueError("16-bit sample out of int16 range")
        data = s.astype("<i2").tobytes()
    else:
        if s.size and (s.max() > 127 or s.min() < -128):
            raise ValueError("8-bit sample out of [-128, 127]")
        data = (s.astype(np.int16) + 128).astype(np.uint8).tobytes()
    block_align = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        _PCM,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = b"".join(
        _chunk(cid, body)
        for cid, body in ((b"fmt ", fmt), (b"data", data))
    )
    return WAV_MAGIC + struct.pack("<I", 4 + len(chunks)) + _WAVE + chunks


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def wav_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a RIFF/WAVE PCM payload.

    Returns ``(sample_rate, n_channels, bits, samples)`` with samples a
    1-D int16 interleaved array (8-bit input is mapped back to signed
    by subtracting the 128 offset — values, not scale, so an 8↔16
    comparison needs the caller's own scaling). Raises ValueError on
    anything that is not canonical PCM rather than guessing."""
    if len(payload) < 12 or payload[:4] != WAV_MAGIC or payload[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, end = 12, 8 + riff_size
    fmt = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body_at = pos + 8
        if body_at + size > end:
            raise ValueError(f"chunk {cid!r} overruns the RIFF payload")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt = struct.unpack("<HHIIHH", payload[body_at : body_at + 16])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            code, ch, rate, _brate, _balign, bits = fmt
            if code != _PCM:
                raise ValueError(f"unsupported format code {code} (PCM only)")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits}")
            raw = payload[body_at : body_at + size]
            if bits == 16:
                if size % 2:
                    raise ValueError("odd 16-bit data chunk size")
                samples = np.frombuffer(raw, dtype="<i2").astype(np.int16)
            else:
                samples = (
                    np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
                )
            if ch < 1 or samples.size % ch:
                raise ValueError("data size not a whole number of frames")
            return rate, ch, bits, samples
        # skip unknown chunks (LIST, fact, cue …) + RIFF pad byte
        pos = body_at + size + (size % 2)
    raise ValueError("no data chunk found")


def wav_features(payload: bytes) -> tuple[int, int, int, int, int]:
    """(sample_rate, n_channels, n_frames, peak_abs, mean_abs_milli)
    from a PCM payload — integer features only, so a SQL oracle can
    replay them exactly. mean_abs_milli = ⌊Σ|s|·1000 / n⌋ (0 for an
    empty data chunk)."""
    rate, ch, _bits, samples = wav_decode(payload)
    n = int(samples.size)
    a = np.abs(samples.astype(np.int64))
    peak = int(a.max()) if n else 0
    mean_milli = int(a.sum() * 1000 // n) if n else 0
    return rate, ch, n // ch, peak, mean_milli
