"""kafka_streams_dexcom_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of robertzych/kafka-streams-dexcom.

The reference is a Kafka Streams (Java) application suite that filters,
projects, categorizes and interval-joins Dexcom continuous-glucose-monitor
events (SURVEY.md). This package re-expresses those semantics Spark-first:
declarative DataFrame plans optimized by Catalyst, Structured Streaming for
the streaming topologies, and scale-oriented extension operators
(deduplication, similarity search, text analysis, multimodal columns) for
large training-data pipelines.

Layout:
    session.py    SparkSession builder (AQE, Arrow, UTC, sane shuffles)
    schemas.py    EGV / envelope / ranges / testdata StructTypes
    sources/      parquet/kafka/REST readers, latest-per-key (KTable) view
    operators/    core parity ops + dedup/similarity/text/multimodal
    functions/    portable hashing, json, time-of-day helpers
    plans/        plan-inspection helpers (pushdown/broadcast assertions)
    streaming/    micro-batch harness, sinks (kafka/ES-style idempotent)
"""

__version__ = "0.1.0"
