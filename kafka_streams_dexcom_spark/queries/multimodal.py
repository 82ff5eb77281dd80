"""Multimodal-column queries: metadata-only access (column pruning keeps
the payload bytes unread) and the Arrow-batched decode stub. The decode
features are deterministic functions of the payload bytes, so the oracle
can replay them in SQL even though Spark runs them through mapInPandas —
this checks the full binary-column plumbing end-to-end. Oracle string
ops are BYTE-exact (encode(text) + hex slicing), matching Spark's
byte-based payload arithmetic even on multi-byte/non-ASCII text —
char-based ascii()/substring() would diverge on e.g. 'Ärzte…'."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators import multimodal as mm
from kafka_streams_dexcom_spark.sources.files import load_table


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "media_type",
        F.col("meta.byte_len").cast("bigint").alias("byte_len"),
        F.col("meta.source").alias("source"),
        F.upper(F.expr("hex(substring(payload, 1, 4))")).alias("header_hex"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.decode_features(media, use_real_codecs=False)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.frame_sample(media, every_n=2, use_real_codecs=False)


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical media dedup: group payloads by md5 content hash
    (per media type), keep the min doc_id — the first pass of any media
    corpus pipeline (identical files recrawled under different URLs).
    Scale: the shuffle moves 16-byte hashes + tiny aggregates, never the
    payload bytes; the hash itself is scan-side."""
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return (
        media.select(
            "doc_id",
            "media_type",
            F.md5("payload").alias("content_hash"),
            F.col("meta.byte_len").alias("byte_len"),
        )
        .groupBy("content_hash", "media_type")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sum("byte_len").cast("bigint").alias("total_bytes"),
        )
    )


def q_audio_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end-to-end: synthesize genuine RIFF/WAVE PCM
    payloads from the text bytes (operators/multimodal.py:
    attach_wav_payload — Arrow-batched, deterministic byte-for-byte),
    then run the production audio feature extractor (audio_features →
    functions/wav.py vendored codec: chunk walk, pad bytes, 8/16-bit
    PCM). The oracle recomputes every integer feature from the text
    bytes directly, so a codec that mis-framed channels, dropped the
    trailing partial frame wrong, or mixed up the 8-bit offset would
    hash-mismatch. Completes the multimodal matrix: PNG/JPEG real
    (images), WAV real (audio), frame plumbing (video)."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.audio_features(mm.attach_wav_payload(docs))


def q_video_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video decode end-to-end: synthesize genuine uncompressed
    AVI payloads (1+n%5 frames of 8×8 gray built cyclically from the
    text bytes), decode with the vendored RIFF/AVI codec, and emit one
    row per frame with its exact integer pixel mean. With PNG/JPEG
    (image), WAV (audio), and this (video), every media_type in the
    multimodal family now has a REAL decoder behind it — the stub path
    remains only as the oracle twin for the legacy decode queries."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.video_features(mm.attach_avi_payload(docs))


_MEDIA_TYPE = "['image', 'audio', 'video'][(doc_id % 3) + 1]"

QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_dedup": q_multimodal_dedup,
    "audio_wav_stats": q_audio_wav_stats,
    "video_avi_frames": q_video_avi_frames,
}

ORACLES = {
    "video_avi_frames": """
        WITH b AS (
            SELECT doc_id, octet_length(encode(text)) AS n,
                   hex(encode(text)) AS hx
            FROM documents
        ),
        f AS (
            SELECT doc_id, n, hx,
                   CAST(1 + n % 5 AS BIGINT) AS n_frames
            FROM b WHERE n > 0
        ),
        fr AS (
            SELECT doc_id, n, hx, n_frames,
                   CAST(unnest(range(0, n_frames)) AS BIGINT)
                       AS frame_idx
            FROM f
        )
        SELECT doc_id,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               n_frames, frame_idx,
               CAST(list_reduce(list_transform(range(0, 64),
                       p -> CAST('0x' || substr(hx,
                            CAST(2 * ((frame_idx * 64 + p) % n) + 1
                                 AS INT), 2) AS BIGINT)),
                    (a, v) -> a + v) * 1000 // 64 AS BIGINT)
                   AS mean_milli
        FROM fr
    """,
    "audio_wav_stats": """
        WITH b AS (
            SELECT doc_id, octet_length(encode(text)) AS nb,
                   hex(encode(text)) AS hx
            FROM documents
        ),
        p AS (
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS BIGINT)
                       AS sample_rate,
                   CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
                   hx,
                   CAST(nb // (1 + doc_id % 2) AS BIGINT) AS n_frames
            FROM b
        ),
        s AS (
            SELECT doc_id, sample_rate, n_channels, n_frames,
                   list_transform(
                       range(1, n_frames * n_channels + 1),
                       i -> abs((CAST('0x' || substr(hx,
                                CAST(2 * i - 1 AS INT), 2) AS INT)
                                - 128) * 256)) AS a
            FROM p
        )
        SELECT doc_id, sample_rate, n_channels, n_frames,
               CAST(coalesce(list_aggregate(a, 'max'), 0) AS BIGINT)
                   AS peak_abs,
               CAST(CASE WHEN len(a) = 0 THEN 0 ELSE
                   CAST(list_aggregate(a, 'sum') AS BIGINT) * 1000
                       // len(a)
               END AS BIGINT) AS mean_abs_milli
        FROM s
    """,
    "multimodal_meta": f"""
        SELECT doc_id,
               {_MEDIA_TYPE} AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               source,
               upper(substr(hex(encode(text)), 1, 8)) AS header_hex
        FROM documents
    """,
    "multimodal_decode": f"""
        SELECT doc_id,
               {_MEDIA_TYPE} AS media_type,
               CAST(64 + octet_length(encode(text)) % 256 AS BIGINT) AS width,
               CAST(64 + (octet_length(encode(text)) * 7) % 256 AS BIGINT)
                   AS height,
               CAST(1 + octet_length(encode(text)) % 7 AS BIGINT) AS n_frames,
               round(((CASE WHEN octet_length(encode(text)) = 0 THEN 0 ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) END + octet_length(encode(text))) % 1000)
                     / 1000.0, 6) AS feature_mean
        FROM documents
    """,
    "multimodal_frame_sample": f"""
        WITH frames AS (
            SELECT doc_id,
                   CAST(1 + octet_length(encode(text)) % 7 AS BIGINT)
                       AS n_frames,
                   round(((CASE WHEN octet_length(encode(text)) = 0 THEN 0 ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) END + octet_length(encode(text))) % 1000)
                         / 1000.0, 6) AS feature_mean
            FROM documents
            WHERE {_MEDIA_TYPE} = 'video'
        )
        SELECT doc_id, frame_idx, feature_mean FROM (
            SELECT doc_id,
                   CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_idx,
                   feature_mean
            FROM frames
        )
        WHERE frame_idx % 2 = 0
    """,
    "multimodal_dedup": f"""
        SELECT md5(text) AS content_hash,
               {_MEDIA_TYPE} AS media_type,
               min(doc_id) AS keeper,
               count(*) AS n_copies,
               CAST(sum(octet_length(encode(text))) AS BIGINT)
                   AS total_bytes
        FROM documents
        GROUP BY content_hash, media_type
    """,
}
