"""Streaming exact dedup with bounded state: dropDuplicatesWithinWatermark
— the streaming twin of the batch ``dedup_exact`` / ``dedup_by_id``
queries (ES doc-id semantics, StreamsFilterEgvs pipeline shape). The
watermark bounds how long a key is retained, so state does not grow with
the stream — the property that makes exact dedup viable on an unbounded
100 TB/day feed (batch dedup retains ALL keys; streaming retains one
watermark-window's worth)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _write_batch(spark, rows, path):
    src = spark.createDataFrame(
        rows, "ts_s string, event_id long, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_id", "value")
    src.coalesce(1).write.mode("append").parquet(path)
    return src.schema


def test_drop_duplicates_within_watermark(spark):
    rows = [
        ("2024-01-01 00:01:00", 1, 10.0),
        ("2024-01-01 00:02:00", 2, 20.0),
        ("2024-01-01 00:03:00", 1, 10.0),   # duplicate id within window
        ("2024-01-01 00:04:00", 3, 30.0),
        ("2024-01-01 00:05:30", 2, 20.0),   # duplicate id within window
    ]
    with tempfile.TemporaryDirectory() as d:
        schema = _write_batch(spark, rows, f"{d}/in")
        stream = spark.readStream.schema(schema).parquet(f"{d}/in")
        deduped = stream.withWatermark(
            "ts", "10 minutes"
        ).dropDuplicatesWithinWatermark(["event_id"])
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(
        (r.event_id, r.ts.minute)
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    )
    # first occurrence of each id survives; in-window repeats are dropped
    assert got == [(1, 1), (2, 2), (3, 4)]


def test_dedup_state_expires_after_watermark(spark):
    """A key reappearing AFTER the watermark passes is emitted again —
    the bounded-state contract (and why the ES sink's deterministic doc
    id remains the idempotency backstop downstream). Three micro-batches
    (one file each): the middle batch advances the watermark past the
    first key's retention window, so the third batch's repeat of id 7 is
    fresh state, not a duplicate."""
    from kafka_streams_dexcom_spark.streaming.harness import run_stream

    rows = [
        ("2024-01-01 00:01:00", 7, 1.0),
        # the watermark a batch computes takes effect NEXT batch, and
        # eviction runs at end-of-batch — so id 7's state (expires
        # 00:11) is gone only after the batch that runs with a watermark
        # past 00:11; the repeat must arrive one batch after that
        ("2024-01-01 01:00:00", 8, 2.0),
        ("2024-01-01 01:10:00", 9, 3.0),
        ("2024-01-01 01:11:00", 7, 1.0),  # same id, state expired
    ]
    src = spark.createDataFrame(
        rows, "ts_s string, event_id long, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_id", "value")
    out = run_stream(
        spark,
        src,
        lambda s: s.withWatermark(
            "ts", "10 minutes"
        ).dropDuplicatesWithinWatermark(["event_id"]),
        num_chunks=4,
    )
    assert sorted(r.event_id for r in out) == [7, 7, 8, 9]


def test_dedup_identical_under_rocksdb_state_store(spark):
    """Same topology, RocksDB state backend: at 100 TB/day the dedup
    state outgrows executor heap, and RocksDB is the provider that
    spills it to local disk with incremental checkpointing — the
    production configuration. The provider must be a pure swap: output
    identical to the default HDFS-backed store. providerClass is a
    runtime SQL conf, so it applies per started query."""
    rows = [
        ("2024-01-01 00:01:00", 1, 10.0),
        ("2024-01-01 00:02:00", 2, 20.0),
        ("2024-01-01 00:03:00", 1, 10.0),
        ("2024-01-01 00:04:00", 3, 30.0),
        ("2024-01-01 00:05:30", 2, 20.0),
    ]
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        with tempfile.TemporaryDirectory() as d:
            schema = _write_batch(spark, rows, f"{d}/in")
            stream = spark.readStream.schema(schema).parquet(f"{d}/in")
            deduped = stream.withWatermark(
                "ts", "10 minutes"
            ).dropDuplicatesWithinWatermark(["event_id"])
            q = (
                deduped.writeStream.outputMode("append")
                .format("memory")
                .queryName("dedup_rocks")
                .option("checkpointLocation", f"{d}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = sorted(
        (r.event_id, r.ts.minute)
        for r in spark.sql("SELECT * FROM dedup_rocks").collect()
    )
    assert got == [(1, 1), (2, 2), (3, 4)]
