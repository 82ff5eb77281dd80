"""Multimodal column support: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched Pandas stages.

Design (per the 100 TB pipeline shape):
- media payloads are `binary` columns with a `media_type` discriminator and
  a metadata struct; parquet stores them column-wise so metadata-only
  queries never read the bytes (column pruning).
- decode / feature-extract / resize / frame-sample run as `mapInPandas`
  stages: each task receives Arrow record batches, the payload bytes stay
  off the driver, and output is a flat typed schema.
- decode dispatches per availability: `_decode_real` (PIL for images,
  lazily imported) when codecs are installed, else `_decode_stub`'s
  deterministic fake features. Oracle-checked queries pin the stub
  explicitly (use_real_codecs=False) since DuckDB can replay its
  arithmetic but not real pixels. The Spark-side plumbing — schema,
  batching, partitioning — is identical on both paths and fully tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.sources.files import fan_out_small

DECODE_SCHEMA = (
    "doc_id bigint, media_type string, width bigint, height bigint, "
    "n_frames bigint, feature_mean double"
)

_HAVE_REAL_CODECS = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_REAL_CODECS = True
except Exception:
    pass


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal column set from the documents table: the text
    bytes stand in for an encoded media payload."""
    return fan_out_small(docs).select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col).cast("binary")).alias("byte_len"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, float]:
    """STUB decode — deterministic fake features from the raw bytes
    (the oracle-reproducible twin of _decode_real)."""
    n = len(payload)
    first = payload[0] if n else 0
    width = 64 + n % 256
    height = 64 + (n * 7) % 256
    n_frames = 1 + n % 7
    feature_mean = round(((first + n) % 1000) / 1000.0, 6)
    return width, height, n_frames, feature_mean


def _decode_real(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    """Real codec adapter: PIL for images when importable (it covers
    every format); otherwise the vendored codecs — stdlib PNG
    (functions/png.py) and numpy baseline JPEG (functions/jpeg.py) — so
    PNG and JPEG payloads decode to REAL pixels on a bare cluster with
    zero extra dependencies. Other image formats without PIL raise
    per-payload — an honest failure, never silent fake features.
    Audio/video would wire torchaudio/ffmpeg the same way; until those
    land they fall back to the stub so a mixed-media frame still
    decodes. Imports are lazy so executors only pay for a codec when
    this path is actually taken."""
    if media_type == "image":
        if _HAVE_REAL_CODECS:
            import io

            import numpy as np
            import PIL.Image

            with PIL.Image.open(io.BytesIO(payload)) as img:
                width, height = img.size
                n_frames = int(getattr(img, "n_frames", 1))
                arr = np.asarray(img.convert("L"), dtype=np.float64)
                feature_mean = round(float(arr.mean()) / 255.0, 6)
            return width, height, n_frames, feature_mean
        from kafka_streams_dexcom_spark.functions.jpeg import (
            JPEG_MAGIC,
            jpeg_features,
        )
        from kafka_streams_dexcom_spark.functions.png import (
            PNG_MAGIC,
            png_features,
        )

        if payload[:8] == PNG_MAGIC:
            return png_features(payload)
        if payload[:2] == JPEG_MAGIC:
            return jpeg_features(payload)
        raise ValueError(
            "real image decode without PIL supports PNG and baseline "
            "JPEG only (payload is neither)"
        )
    return _decode_stub(payload)


def decode_features(
    media: DataFrame, use_real_codecs: bool | None = None
) -> DataFrame:
    """Arrow-batched decode/feature-extraction over the payload column.

    mapInPandas: one pandas DataFrame per Arrow batch per task — payloads
    are processed executor-side in batch, never collected. Output rows are
    flat/typed so downstream stages are plain columnar ops again.

    ``use_real_codecs``: None = auto (real codecs when PIL is
    importable; the vendored PNG decoder is always available but is not
    auto-selected, because auto-mode payloads here are arbitrary bytes,
    not PNGs). True forces the real path: PIL when present, else the
    stdlib PNG codec — non-PNG images then fail per-payload instead of
    silently faking features. The oracle-checked queries pass False
    explicitly — the deterministic stub is what the DuckDB replay
    reproduces; real decoded pixels cannot be."""
    if use_real_codecs is None:
        use_real_codecs = _HAVE_REAL_CODECS
    decode = _decode_real if use_real_codecs else (
        lambda p, _mt: _decode_stub(p)
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            # a NULL payload (missing media) yields null features, not a
            # len(None) TypeError that kills the stage on one bad row
            feats = [
                (None, None, None, None)
                if p is None
                else decode(p, mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "feature_mean": [f[3] for f in feats],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=DECODE_SCHEMA
    )


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate bigint, n_channels bigint, "
    "n_frames bigint, peak_abs bigint, mean_abs_milli bigint"
)


def attach_wav_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a REAL RIFF/WAVE payload column from the documents
    table (Arrow-batched; the bytes never touch the driver): each text
    byte becomes one 16-bit sample, (b−128)·256, interleaved into
    1 + doc_id%2 channels at 8000 + (doc_id%3)·4000 Hz, trailing
    partial frame truncated. Deterministic byte-for-byte, so an oracle
    can recompute every downstream feature from the text column — while
    the payloads themselves are genuine WAV files any reader accepts.

    In production this column arrives from object storage; this
    synthesizer stands in for the crawler and doubles as the encoder
    half of the codec round trip (every decode below reads bytes the
    vendored encoder wrote)."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.wav import wav_encode

        for pdf in batches:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(
                    str(text).encode("utf-8"), dtype=np.uint8
                ).astype(np.int16)
                ch = 1 + int(did) % 2
                rate = 8000 + (int(did) % 3) * 4000
                frames = b.size // ch
                samples = (b[: frames * ch] - 128) * 256
                payloads.append(wav_encode(samples, rate, ch, bits=16))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return fan_out_small(docs).select("doc_id", text_col).mapInPandas(
        run, schema="doc_id bigint, payload binary"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over a binary WAV column:
    vendored RIFF/PCM decode (functions/wav.py) → integer features
    (rate, channels, frames, peak, milli-unit mean absolute amplitude).
    Same contract as decode_features for images: payload bytes stay
    executor-side, output is flat/typed, a malformed payload raises
    per-row (honest failure) rather than yielding fake features."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.wav import wav_features

        for pdf in batches:
            feats = [
                (None,) * 5 if p is None else wav_features(bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [f[0] for f in feats],
                    "n_channels": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "peak_abs": [f[3] for f in feats],
                    "mean_abs_milli": [f[4] for f in feats],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_SCHEMA
    )


VIDEO_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_frames bigint, "
    "frame_idx bigint, mean_milli bigint"
)


def attach_avi_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a REAL uncompressed-AVI payload column from the
    documents table (Arrow-batched): 1 + n_bytes%5 frames of 8×8
    grayscale, frame k pixel p = text byte (k·64+p) mod n — cyclic and
    byte-deterministic, so the oracle recomputes every frame mean from
    the text column while the payloads are genuine AVI files. A
    byte-free doc gets zero frames (an empty movi list, still a valid
    AVI). Same stand-in contract as attach_wav_payload."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.avi import avi_encode

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                b = np.frombuffer(
                    str(text).encode("utf-8"), dtype=np.uint8
                )
                if b.size == 0:
                    payloads.append(avi_encode([]))
                    continue
                n_frames = 1 + b.size % 5
                idx = (
                    np.arange(n_frames * 64).reshape(n_frames, 8, 8)
                    % b.size
                )
                payloads.append(
                    avi_encode([b[idx[k]] for k in range(n_frames)])
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return fan_out_small(docs).select("doc_id", text_col).mapInPandas(
        run, schema="doc_id bigint, payload binary"
    )


def video_features(media: DataFrame) -> DataFrame:
    """Arrow-batched video decode over a binary AVI column: vendored
    RIFF/AVI parse (functions/avi.py) → one row per FRAME with the
    integer milli-unit pixel mean — the per-frame feature stage a video
    curation pipeline fans out before embedding/filtering. Payload
    bytes stay executor-side; malformed payloads raise per-row."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.avi import avi_features

        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue
                w, h, n, means = avi_features(bytes(p))
                for k, m in enumerate(means):
                    rows.append((did, w, h, n, k, m))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames",
                    "frame_idx", "mean_milli",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_SCHEMA
    )


# ------------------------------------------------- perceptual hashing
# dHash geometry: source frames are PHASH_SRC_H x PHASH_SRC_W gray,
# box-downsampled 2x2 to 8 rows x 9 cols, then bit (r, c) = d[r][c] >
# d[r][c+1] -> the standard 64-bit difference hash, carried as four
# 16-bit band ints (b0..b3) so banded blocking and XOR popcounts stay
# sign-safe int arithmetic in BOTH engines.
PHASH_SRC_W = 18
PHASH_SRC_H = 16
PHASH_GROUP = 3  # docs per pixel-group: 3 encodings of the same frame
PHASH_PERTURB = 64  # variant 2's +64 on source pixel 0 (a re-compress)

PHASH_SCHEMA = (
    "doc_id bigint, variant bigint, b0 bigint, b1 bigint, b2 bigint, "
    "b3 bigint, phash_hex string"
)


def phash_src_pixels(g: int, perturb: bool) -> "np.ndarray":
    """The deterministic source frame of pixel-group ``g`` — byte p of
    the 16x18 gray raster is hex pair p%16 of md5('ph:<g>:<p//16>'),
    so the DuckDB oracle replays every pixel with its own md5. The
    perturbed variant bumps pixel 0 by PHASH_PERTURB (mod 256) — the
    'slightly recompressed' near-duplicate."""
    import hashlib

    import numpy as np

    n = PHASH_SRC_W * PHASH_SRC_H
    out = np.empty(n, dtype=np.int64)
    for row in range((n + 15) // 16):
        h = hashlib.md5(f"ph:{g}:{row}".encode()).digest()
        for k in range(min(16, n - row * 16)):
            out[row * 16 + k] = h[k]
    if perturb:
        out[0] = (out[0] + PHASH_PERTURB) % 256
    return out.reshape(PHASH_SRC_H, PHASH_SRC_W)


def dhash_bands(gray: "np.ndarray") -> tuple[int, int, int, int]:
    """64-bit dHash of an (even-H x even-W) gray raster as four 16-bit
    band ints: 2x2 integer box-downsample to 8x9, bit k (= r*8+c) set
    iff d[r][c] > d[r][c+1], band b = bits [16b, 16b+16)."""
    d = (
        gray[0::2, 0::2].astype("int64")
        + gray[0::2, 1::2]
        + gray[1::2, 0::2]
        + gray[1::2, 1::2]
    ) // 4
    bits = d[:, :-1] > d[:, 1:]  # (8, 8)
    flat = bits.reshape(-1)
    bands = []
    for b in range(4):
        v = 0
        for t in range(16):
            if flat[16 * b + t]:
                v |= 1 << t
        bands.append(v)
    return tuple(bands)


def attach_phash_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the re-encoded-duplicate image corpus (Arrow-batched;
    REAL PNG bytes, never touching the driver): pixel-group g =
    doc_id div 3 fixes the frame content; variant v = doc_id % 3 picks
    the ENCODING — v0 grayscale PNG, v1 RGB PNG with R=G=B (identical
    luma, zero shared payload bytes with v0: the re-encoded duplicate
    byte-exact dedup can never see), v2 grayscale PNG of the one-pixel
    perturbed frame (the slightly-recompressed near-duplicate,
    dHash hamming <= 1). Deterministic byte-for-byte — the
    attach_wav_payload stand-in contract."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.png import encode_png

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                g, v = did // PHASH_GROUP, did % PHASH_GROUP
                px = phash_src_pixels(g, perturb=(v == 2)).astype(
                    np.uint8
                )
                if v == 1:
                    rgb = np.repeat(px.reshape(-1), 3).tobytes()
                    payload = encode_png(
                        PHASH_SRC_W, PHASH_SRC_H, rgb, channels=3
                    )
                else:
                    payload = encode_png(
                        PHASH_SRC_W, PHASH_SRC_H, px.tobytes(), channels=1
                    )
                rows.append((did, v, payload))
            yield pd.DataFrame(
                rows, columns=["doc_id", "variant", "payload"]
            )

    return fan_out_small(docs).select("doc_id").mapInPandas(
        run, schema="doc_id bigint, variant bigint, payload binary"
    )


def phash_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode -> perceptual fingerprint over a
    binary PNG column: vendored codec (functions/png.py) -> integer
    luma (Pillow's exact (R*19595 + G*38470 + B*7471) >> 16 for RGB) ->
    2x2 box downsample -> 64-bit dHash as four 16-bit bands + the hex
    fingerprint. Payload bytes stay executor-side; a malformed payload
    raises per-row. Which encoding produced a frame is unobservable in
    the fingerprint — that IS the operator's point."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.png import decode_png

        for pdf in batches:
            rows = []
            for did, v, p in zip(
                pdf["doc_id"], pdf["variant"], pdf["payload"]
            ):
                w, h, ch, px = decode_png(bytes(p))
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                if ch == 1:
                    gray = arr.reshape(h, w)
                else:
                    rgb = arr.reshape(h, w, ch)
                    gray = (
                        rgb[:, :, 0] * 19595
                        + rgb[:, :, 1] * 38470
                        + rgb[:, :, 2] * 7471
                    ) >> 16
                b0, b1, b2, b3 = dhash_bands(gray)
                rows.append(
                    (
                        int(did),
                        int(v),
                        b0,
                        b1,
                        b2,
                        b3,
                        f"{b3:04X}{b2:04X}{b1:04X}{b0:04X}",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "variant", "b0", "b1", "b2", "b3",
                    "phash_hex",
                ],
            )

    return media.select("doc_id", "variant", "payload").mapInPandas(
        run, schema=PHASH_SCHEMA
    )


# Rotation-invariant DCT perceptual hash (functions/dct.py): 16x16
# gray corpus with planted DIHEDRAL re-posts + recompression dither —
# the duplicate classes the dHash family above provably misses /
# marginally catches. See the dct module docstring for the algebra.
DCTP_GROUP = 3
DCTP_DITHER = 4  # variant 2's per-pixel +/-4 (the re-compress artifact)
DCTP_BRIGHT = 8  # variant 2's +8 brightness (clipped at 255)

DCTP_SCHEMA = (
    "doc_id bigint, variant bigint, orient bigint, b0 bigint, "
    "b1 bigint, b2 bigint, b3 bigint, phash_hex string"
)


def dctp_src_pixels(g: int) -> "np.ndarray":
    """Deterministic 16x16 source frame of pixel-group ``g`` — byte p
    is hex pair p%16 of md5('phd:<g>:<p//16>') (the phash_src_pixels
    rule under its own tag), so the oracle replays every pixel."""
    import hashlib

    import numpy as np

    from kafka_streams_dexcom_spark.functions.dct import DCTP_N

    n = DCTP_N * DCTP_N
    out = np.empty(n, dtype=np.int64)
    for row in range((n + 15) // 16):
        h = hashlib.md5(f"phd:{g}:{row}".encode()).digest()
        for k in range(min(16, n - row * 16)):
            out[row * 16 + k] = h[k]
    return out.reshape(DCTP_N, DCTP_N)


def dctp_variant_pixels(g: int, v: int) -> "np.ndarray":
    """Pixel raster of doc variant ``v`` in group ``g``: v0 the base
    frame, v1 its 90-degree rotation (the rotated re-post — zero
    shared payload bytes, ~32/64 dHash bits away, EXACTLY the same
    DCT fingerprint set), v2 the dithered+brightened re-encode
    (per-pixel +/-DCTP_DITHER from md5('phdn:...') byte parity, then
    +DCTP_BRIGHT, clipped to [0, 255] — the recompression artifact,
    within DCT threshold)."""
    import hashlib

    import numpy as np

    from kafka_streams_dexcom_spark.functions.dct import DCTP_N

    img = dctp_src_pixels(g)
    if v == 1:
        return np.rot90(img)
    if v == 2:
        n = DCTP_N * DCTP_N
        d = np.empty(n, dtype=np.int64)
        for row in range((n + 15) // 16):
            h = hashlib.md5(f"phdn:{g}:{row}".encode()).digest()
            for k in range(min(16, n - row * 16)):
                d[row * 16 + k] = h[k]
        dither = np.where(d % 2 == 1, DCTP_DITHER, -DCTP_DITHER)
        return np.clip(
            img + dither.reshape(DCTP_N, DCTP_N) + DCTP_BRIGHT, 0, 255
        )
    return img


def attach_dct_phash_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the dihedral/recompressed duplicate image corpus as
    REAL PNG bytes (Arrow-batched, never on the driver): group
    g = doc_id div 3 fixes the content, variant v = doc_id % 3 picks
    the re-encode (base / rot90 / dither+brighten). All three PNGs of
    a group are pairwise byte-distinct — byte-exact dedup sees
    nothing."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.dct import DCTP_N
        from kafka_streams_dexcom_spark.functions.png import encode_png

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                g, v = did // DCTP_GROUP, did % DCTP_GROUP
                px = dctp_variant_pixels(g, v).astype(np.uint8)
                payload = encode_png(
                    DCTP_N, DCTP_N, px.tobytes(), channels=1
                )
                rows.append((did, v, payload))
            yield pd.DataFrame(
                rows, columns=["doc_id", "variant", "payload"]
            )

    return fan_out_small(docs).select("doc_id").mapInPandas(
        run, schema="doc_id bigint, variant bigint, payload binary"
    )


def dct_phash_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode -> the 8-orientation DCT fingerprint
    SET per image (functions/dct.py:dct_fingerprints): 8 rows per doc,
    (orient, b0..b3, hex). Payload bytes stay executor-side; which
    dihedral pose produced the bytes is unobservable in the SET —
    that IS the operator's point."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.dct import (
            dct_fingerprints,
        )
        from kafka_streams_dexcom_spark.functions.png import decode_png

        for pdf in batches:
            rows = []
            for did, v, p in zip(
                pdf["doc_id"], pdf["variant"], pdf["payload"]
            ):
                w, h, ch, px = decode_png(bytes(p))
                gray = (
                    np.frombuffer(px, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w)
                )
                for o, b0, b1, b2, b3, hx in dct_fingerprints(gray):
                    rows.append(
                        (int(did), int(v), o, b0, b1, b2, b3, hx)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "variant", "orient", "b0", "b1", "b2",
                    "b3", "phash_hex",
                ],
            )

    return media.select("doc_id", "variant", "payload").mapInPandas(
        run, schema=DCTP_SCHEMA
    )


# Audio perceptual hash: 65-frame energy contour -> 64 derivative-sign
# bits (the chromaprint/shazam family's simplest honest member). Same
# band/carry conventions as the image dHash above.
APH_FRAMES = 65
APH_FRAME = 16  # samples per frame per channel
APH_PERTURB = 64  # variant 2's +64 (mod 256) on source byte 0


def aph_src_bytes(g: int, perturb: bool) -> "np.ndarray":
    """Deterministic source bytes of audio pixel-group ``g``: byte i is
    byte i%16 of md5('aph:<g>:<i//16>') — md5-replayable in SQL, the
    phash_src_pixels discipline. Sample i = (byte−128)·256 (int16)."""
    import hashlib

    import numpy as np

    n = APH_FRAMES * APH_FRAME
    out = np.empty(n, dtype=np.int64)
    for row in range((n + 15) // 16):
        h = hashlib.md5(f"aph:{g}:{row}".encode()).digest()
        for k in range(min(16, n - row * 16)):
            out[row * 16 + k] = h[k]
    if perturb:
        out[0] = (out[0] + APH_PERTURB) % 256
    return out


def attach_audio_phash_payload(docs: DataFrame) -> DataFrame:
    """The audio re-encoded-duplicate corpus (Arrow-batched; REAL WAV
    bytes): group g = doc_id div 3 fixes the samples; v0 = mono 16-bit,
    v1 = STEREO with L=R (twice the bytes, identical per-frame energy —
    the re-encode byte dedup can't see), v2 = mono with sample 0
    perturbed (the near-dup)."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.wav import wav_encode

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                g, v = did // PHASH_GROUP, did % PHASH_GROUP
                s = (
                    aph_src_bytes(g, perturb=(v == 2)) - 128
                ) * 256  # int16 range
                if v == 1:
                    s = np.repeat(s, 2)  # interleaved stereo, L = R
                    payload = wav_encode(s, 8000, n_channels=2)
                else:
                    payload = wav_encode(s, 8000, n_channels=1)
                rows.append((did, v, payload))
            yield pd.DataFrame(
                rows, columns=["doc_id", "variant", "payload"]
            )

    return fan_out_small(docs).select("doc_id").mapInPandas(
        run, schema="doc_id bigint, variant bigint, payload binary"
    )


def contour_bands(energies: "np.ndarray") -> tuple[int, int, int, int]:
    """64-bit energy-contour hash of APH_FRAMES integer frame energies
    as four 16-bit band ints: bit k set iff e[k+1] > e[k]."""
    bits = energies[1:] > energies[:-1]
    bands = []
    for b in range(4):
        v = 0
        for t in range(16):
            if bits[16 * b + t]:
                v |= 1 << t
        bands.append(v)
    return tuple(bands)


def audio_phash_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode -> perceptual fingerprint: vendored
    codec (functions/wav.py) -> per-frame integer mean-abs energy
    (channel-count invariant: an L=R stereo re-encode yields the exact
    same contour) -> 64 derivative-sign bits as four 16-bit bands +
    the hex fingerprint. Malformed payloads raise per-row."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.wav import wav_decode

        for pdf in batches:
            rows = []
            for did, v, p in zip(
                pdf["doc_id"], pdf["variant"], pdf["payload"]
            ):
                _rate, ch, _bits, s = wav_decode(bytes(p))
                a = np.abs(s.astype(np.int64))
                per = APH_FRAME * ch
                n_frames = a.size // per
                e = a[: n_frames * per].reshape(n_frames, per).sum(
                    axis=1
                ) // per
                b0, b1, b2, b3 = contour_bands(e)
                rows.append(
                    (
                        int(did),
                        int(v),
                        b0,
                        b1,
                        b2,
                        b3,
                        f"{b3:04X}{b2:04X}{b1:04X}{b0:04X}",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "variant", "b0", "b1", "b2", "b3",
                    "phash_hex",
                ],
            )

    return media.select("doc_id", "variant", "payload").mapInPandas(
        run, schema=PHASH_SCHEMA
    )


# Video perceptual hash: 65-frame brightness contour -> 64
# derivative-sign bits — the third modality of the phash family. The
# per-frame energy is floor(sum(pixels) / (w*h)), which is EXACTLY
# invariant under integer pixel-doubling (4S // 4A == S // A), so a
# 2x-upscaled re-encode fingerprints identically while sharing zero
# frame bytes with the original.
VPH_FRAMES = 65
VPH_W = 4
VPH_H = 4
VPH_PERTURB = 64  # variant 2's +64 (mod 256) on frame 0, pixel 0


def vph_src_bytes(g: int, perturb: bool) -> "np.ndarray":
    """Deterministic source bytes of video pixel-group ``g``: pixel j of
    frame f is byte j of md5('vph:<g>:<f>') — one digest per 16-pixel
    frame, md5-replayable in SQL (the aph_src_bytes discipline)."""
    import hashlib

    import numpy as np

    out = np.concatenate(
        [
            np.frombuffer(
                hashlib.md5(f"vph:{g}:{f}".encode()).digest(),
                dtype=np.uint8,
            )
            for f in range(VPH_FRAMES)
        ]
    ).astype(np.int64)
    if perturb:
        out[0] = (out[0] + VPH_PERTURB) % 256
    return out


def attach_video_phash_payload(docs: DataFrame) -> DataFrame:
    """The video re-encoded-duplicate corpus (Arrow-batched; REAL
    uncompressed-AVI bytes): group g = doc_id div 3 fixes the 65-frame
    clip; v0 = 4x4 gray frames, v1 = the SAME clip upscaled 2x to 8x8
    (pixel-doubled — four times the frame bytes, zero shared with v0,
    identical floor-mean contour: the upscaled re-encode byte dedup
    can't see), v2 = 4x4 with frame-0 pixel 0 perturbed (the near-dup)."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.avi import avi_encode

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                g, v = did // PHASH_GROUP, did % PHASH_GROUP
                px = (
                    vph_src_bytes(g, perturb=(v == 2))
                    .astype(np.uint8)
                    .reshape(VPH_FRAMES, VPH_H, VPH_W)
                )
                if v == 1:
                    frames = [
                        np.repeat(np.repeat(px[f], 2, axis=0), 2, axis=1)
                        for f in range(VPH_FRAMES)
                    ]
                else:
                    frames = [px[f] for f in range(VPH_FRAMES)]
                rows.append((did, v, avi_encode(frames)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "variant", "payload"]
            )

    return fan_out_small(docs).select("doc_id").mapInPandas(
        run, schema="doc_id bigint, variant bigint, payload binary"
    )


def video_phash_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL AVI decode -> perceptual fingerprint: vendored
    codec (functions/avi.py) -> per-frame integer brightness
    floor(sum/area) (resolution-invariant under exact pixel-doubling,
    so an upscaled re-encode yields the same contour) -> 64
    derivative-sign bits as four 16-bit bands + the hex fingerprint.
    Clips shorter than VPH_FRAMES raise per-row (honest failure — a
    64-bit contour needs 65 frames)."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kafka_streams_dexcom_spark.functions.avi import avi_decode

        for pdf in batches:
            rows = []
            for did, v, p in zip(
                pdf["doc_id"], pdf["variant"], pdf["payload"]
            ):
                w, h, frames = avi_decode(bytes(p))
                if len(frames) < VPH_FRAMES:
                    raise ValueError(
                        f"video phash needs >= {VPH_FRAMES} frames, "
                        f"got {len(frames)}"
                    )
                e = (
                    np.stack(frames[:VPH_FRAMES])
                    .astype(np.int64)
                    .sum(axis=(1, 2))
                    // (w * h)
                )
                b0, b1, b2, b3 = contour_bands(e)
                rows.append(
                    (
                        int(did),
                        int(v),
                        b0,
                        b1,
                        b2,
                        b3,
                        f"{b3:04X}{b2:04X}{b1:04X}{b0:04X}",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "variant", "b0", "b1", "b2", "b3",
                    "phash_hex",
                ],
            )

    return media.select("doc_id", "variant", "payload").mapInPandas(
        run, schema=PHASH_SCHEMA
    )


def frame_sample(
    media: DataFrame,
    every_n: int = 2,
    use_real_codecs: bool | None = None,
) -> DataFrame:
    """Frame-sampling plumbing demo: expand each video payload into frame
    rows (stub: one row per fake frame index), keeping every n-th. The
    explode happens executor-side; at scale this is the fan-out stage
    before per-frame feature extraction."""
    frames = decode_features(
        media.filter(F.col("media_type") == "video"),
        use_real_codecs=use_real_codecs,
    )
    return (
        frames.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias(
                "frame_idx"
            ),
            "feature_mean",
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )
