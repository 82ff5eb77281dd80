"""Watermarked tumbling-window aggregation under Structured Streaming —
the standard late-data pattern (the reference has no windows, SURVEY.md
§2.5; this is engine capability beyond parity)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_watermarked_tumbling_window_agg(spark):
    rows = [
        ("2024-01-01 00:01:00", "click", 1.0),
        ("2024-01-01 00:02:00", "click", 2.0),
        ("2024-01-01 00:07:00", "click", 4.0),
        ("2024-01-01 00:11:00", "view", 8.0),
    ]
    src = spark.createDataFrame(rows, "ts_s string, event_type string, value double")
    src = src.select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("append").parquet(f"{d}/in")
        stream = spark.readStream.schema(src.schema).parquet(f"{d}/in")
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("sum_value"),
            )
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_out")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {
        (r["window"].start.minute, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got == {
        (0, "click"): (2, 3.0),   # 00:00-00:05
        (5, "click"): (1, 4.0),   # 00:05-00:10
        (10, "view"): (1, 8.0),   # 00:10-00:15
    }
