"""Kafka stream/table sources, Spark-first.

Mirrors the reference's three source shapes (SURVEY.md §2.1):

- stream source        → ``spark.readStream.format("kafka")`` with
  key/value cast to string (reference: StreamsFilterEgvs.java:27).
- stream source w/serde → same + ``from_json`` with a declared schema
  (reference: CategorizeWithSimpleRule.java:58-59).
- **table** source (KTable: latest value per key, upsert view —
  reference: CategorizeWithKTableLookup.java:60-62) → read the changelog
  topic, then reduce to latest-per-key (operators.core.latest_per_key).

The Kafka connector jars may be absent in offline test environments, so
everything degrades to clear errors and the tests exercise the same
transforms through file/memory sources instead (streaming/harness.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Producer tuning the reference uses; passed through to the Kafka sink/source
# (reference: ProducerDexcom.java:66-89).
REFERENCE_PRODUCER_OPTIONS = {
    "kafka.enable.idempotence": "true",
    "kafka.acks": "all",
    "kafka.retries": str(2**31 - 1),
    "kafka.max.in.flight.requests.per.connection": "5",
    "kafka.compression.type": "snappy",
    "kafka.linger.ms": "20",
    "kafka.batch.size": "32768",
}


def _project_records(
    df: DataFrame, value_schema: T.StructType | None
) -> DataFrame:
    """Shared wire-format projection for both the streaming and the
    batch reader — ONE place for the key/value casts and the optional
    from_json parse, so the two paths cannot drift."""
    df = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    )
    if value_schema is not None:
        df = df.withColumn("parsed", F.from_json("value", value_schema))
    return df


def kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    value_schema: T.StructType | None = None,
) -> DataFrame:
    """KStream equivalent: streaming DataFrame of (key, value[, parsed])."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return _project_records(raw, value_schema)


def kafka_batch(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    value_schema: T.StructType | None = None,
) -> DataFrame:
    """Bounded read of a topic (batch replay of a stream)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
    return _project_records(raw, value_schema)


def kafka_stream_avro(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    schema_json: str | None = None,
    starting_offsets: str = "earliest",
    confluent_schema_id: int | None = None,
) -> DataFrame:
    """KStream with Avro value serde — the reference's own TODO
    (ProducerDexcom.java:42 "TODO: use avro"). The value stays BINARY
    (no string cast) and decodes via functions.avro.from_avro_column:
    native spark-avro when the package is loaded, the vendored
    wire-compatible codec otherwise. ``confluent_schema_id`` strips the
    Schema-Registry framing header. Defaults to the EGV record schema
    (schemas.py twin)."""
    from kafka_streams_dexcom_spark.functions.avro import (
        EGV_AVRO_SCHEMA,
        from_avro_column,
    )

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
        from_avro_column(
            F.col("value"),
            schema_json or EGV_AVRO_SCHEMA,
            spark=spark,
            confluent_schema_id=confluent_schema_id,
        ).alias("parsed"),
    )


def kafka_stream_protobuf(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    fields: list[tuple[str, int, str]] | None = None,
    starting_offsets: str = "earliest",
    message_name: str | None = None,
    desc_file: str | None = None,
) -> DataFrame:
    """KStream with protobuf value serde — the protobuf twin of
    kafka_stream_avro, completing the topic-boundary serde matrix
    (CategorizeWithSimpleRule.java:58-59 configures the Serde pair per
    topic). The value stays BINARY and decodes via
    functions.protobuf.from_protobuf_column: native spark-protobuf when
    the package is loaded and (``message_name``, ``desc_file``) are
    given, the vendored wire-format codec otherwise. Defaults to the
    EGV message fields (schemas.py twin)."""
    from kafka_streams_dexcom_spark.functions.protobuf import (
        EGV_PROTO_FIELDS,
        from_protobuf_column,
    )

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
        from_protobuf_column(
            F.col("value"),
            fields or EGV_PROTO_FIELDS,
            spark=spark,
            message_name=message_name,
            desc_file=desc_file,
        ).alias("parsed"),
    )


def kafka_table(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    value_schema: T.StructType,
) -> DataFrame:
    """KTable equivalent: batch-read the changelog topic and keep only the
    latest record per key (upsert view). For streaming use, re-read this
    inside foreachBatch so each micro-batch sees a fresh snapshot and
    broadcast it into the join (reference state-store restore analog,
    CategorizeWithKTableLookup.java:60-62)."""
    from kafka_streams_dexcom_spark.operators.core import latest_per_key

    raw = kafka_batch(spark, bootstrap, topic, value_schema)
    return latest_per_key(raw, key_cols=["key"], order_col="offset")
