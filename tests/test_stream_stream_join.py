"""Stream-stream join with watermarks and a time-range condition — the
join mode the reference's stack cannot express at all (Kafka Streams
stream-stream joins need co-partitioned topics + join windows; here the
engine handles buffering/expiry via watermarks)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_stream_stream_interval_join(spark):
    # clicks joined to purchases by the same user within 30 minutes AFTER
    # the click — classic attribution join.
    clicks = [
        (1, "2024-01-01 10:00:00", "c1"),
        (1, "2024-01-01 12:00:00", "c2"),  # no purchase within window
        (2, "2024-01-01 09:00:00", "c3"),
    ]
    purchases = [
        (1, "2024-01-01 10:20:00", "p1"),  # 20 min after c1 → attributed
        (2, "2024-01-01 11:00:00", "p2"),  # 2h after c3 → NOT attributed
    ]
    with tempfile.TemporaryDirectory() as d:
        cdf = spark.createDataFrame(
            clicks, "user_id long, ts_s string, click_id string"
        ).select("user_id", F.to_timestamp("ts_s").alias("click_ts"), "click_id")
        pdf = spark.createDataFrame(
            purchases, "user_id long, ts_s string, purchase_id string"
        ).select(
            "user_id", F.to_timestamp("ts_s").alias("purchase_ts"), "purchase_id"
        )
        cdf.coalesce(1).write.mode("append").parquet(f"{d}/clicks")
        pdf.coalesce(1).write.mode("append").parquet(f"{d}/purchases")

        cs = (
            spark.readStream.schema(cdf.schema)
            .parquet(f"{d}/clicks")
            .withWatermark("click_ts", "1 hour")
        )
        ps = (
            spark.readStream.schema(pdf.schema)
            .parquet(f"{d}/purchases")
            .withWatermark("purchase_ts", "1 hour")
        )
        joined = cs.alias("c").join(
            ps.alias("p"),
            F.expr(
                """
                c.user_id = p.user_id AND
                p.purchase_ts >= c.click_ts AND
                p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTES
                """
            ),
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("attrib")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT click_id, purchase_id FROM attrib").collect()
    }
    assert got == {("c1", "p1")}
