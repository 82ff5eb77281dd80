"""Streaming session_window must agree with the batch sessionize operator
(same gap) — the session boundaries are the engine-level vs hand-rolled
implementations of the same semantics."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.temporal import sessionize

ROWS = [
    # user 1: 3 events tight, 25-min gap, then 2 more → 2 sessions
    ("2024-01-01 10:00:00", 1),
    ("2024-01-01 10:05:00", 1),
    ("2024-01-01 10:10:00", 1),
    ("2024-01-01 10:40:00", 1),
    ("2024-01-01 10:45:00", 1),
    # user 2: single event
    ("2024-01-01 09:00:00", 2),
]
GAP_S = 15 * 60  # 15 minutes


def _fixture(spark):
    return spark.createDataFrame(
        [(ts, u, i) for i, (ts, u) in enumerate(ROWS)],
        "ts_s string, user_id long, event_id long",
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "event_id")


def test_streaming_session_window_matches_batch_sessionize(spark):
    src = _fixture(spark)

    # batch: hand-rolled lag+cumsum sessionization
    batch_sessions = (
        sessionize(src, ["user_id"], "ts", "event_id", GAP_S)
        .groupBy("user_id", "session_idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    batch = sorted(
        (r.user_id, r.n) for r in batch_sessions.collect()
    )

    # streaming: engine-native session_window
    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("append").parquet(f"{d}/in")
        stream = spark.readStream.schema(src.schema).parquet(f"{d}/in")
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(
                F.session_window("ts", f"{GAP_S} seconds"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("sess_out")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    streaming = sorted(
        (r.user_id, r.n)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    # both must agree on the exact per-user session-size multiset,
    # and match the hand-computed expectation
    assert batch == streaming
    assert sorted(n for u, n in batch if u == 1) == [2, 3]
    assert [n for u, n in batch if u == 2] == [1]
