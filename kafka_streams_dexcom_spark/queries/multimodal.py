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


_MEDIA_TYPE = "['image', 'audio', 'video'][(doc_id % 3) + 1]"

QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_dedup": q_multimodal_dedup,
}

ORACLES = {
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
