"""Config-driven sink wrapper — the Kafka Connect shape (reference P7:
kafka-connect/elasticsearch.properties:1-7 declares an ES sink with
topics, connection, key.ignore; connect-standalone runs it).

`run_sink_config` interprets the same declarative surface on Spark: a
properties dict selects a sink class and its options; the runner wires
source → sink with checkpointing. New sink types register in SINKS."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from kafka_streams_dexcom_spark.streaming.sinks import (
    EsBulkFileSink,
    IdempotentParquetSink,
)


def _es_sink(cfg: dict[str, str]):
    # mirrors elasticsearch.properties: connection.url -> output path in
    # the offline runner; topic.index.map/type.name default as reference
    return EsBulkFileSink(
        cfg["output.path"],
        batch_size=int(cfg.get("batch.size", "100")),
    )


def _parquet_sink(cfg: dict[str, str]):
    return IdempotentParquetSink(cfg["output.path"])


SINKS: dict[str, Callable[[dict[str, str]], Callable]] = {
    "elasticsearch": _es_sink,
    "parquet": _parquet_sink,
}


def run_sink_config(
    source: DataFrame, cfg: dict[str, str], checkpoint: str
):
    """Declarative runner: `connector.class` picks the sink, remaining
    keys configure it. Returns the started streaming query."""
    kind = cfg["connector.class"]
    if kind not in SINKS:
        raise ValueError(
            f"unknown connector.class {kind!r}; known: {sorted(SINKS)}"
        )
    sink = SINKS[kind](cfg)
    return (
        source.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
