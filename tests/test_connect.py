"""Config-driven sink runner (the Kafka Connect-shaped surface, P7) and
the hh->HH time parse normalization (SURVEY.md quirk #5)."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.timeofday import (
    time_of_day,
    time_of_day_from_iso_string,
)
from kafka_streams_dexcom_spark.streaming.connect import run_sink_config


def test_declarative_es_sink_config(spark):
    rows = [("egvs", 0, 1, 250), ("egvs", 0, 2, 100)]
    with tempfile.TemporaryDirectory() as d:
        src_df = spark.createDataFrame(
            rows, "topic string, partition int, offset long, value int"
        )
        src_df.coalesce(1).write.mode("append").parquet(f"{d}/in")
        stream = spark.readStream.schema(src_df.schema).parquet(f"{d}/in")
        q = run_sink_config(
            stream,
            {
                "connector.class": "elasticsearch",
                "output.path": f"{d}/es_bulk",
                "batch.size": "100",
            },
            checkpoint=f"{d}/ckpt",
        )
        q.awaitTermination()
        lines = []
        for f in glob.glob(f"{d}/es_bulk/**/*.txt", recursive=True):
            with open(f) as fh:
                lines.extend(l for l in fh.read().splitlines() if l)
    assert len(lines) == 4  # 2 records x (action + doc)


def test_unknown_connector_class_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown connector.class"):
        run_sink_config(None, {"connector.class": "nope"}, "/tmp/x")


def test_time_of_day_is_24h_normalized(spark):
    """SURVEY.md §2.6 #5: the reference parses 'hh:mm:ss' (12-hour,
    lenient) — plainly intended as 24-hour. We implement HH: 19:00:00
    stays 19:00:00, and evening EGVs land in the active range (2), not a
    rolled-over morning slot."""
    df = spark.createDataFrame(
        [("2020-11-02T19:00:00",)], "systemTime string"
    ).select(
        time_of_day_from_iso_string("systemTime").alias("tod_str"),
        time_of_day(F.to_timestamp("systemTime")).alias("tod_ts"),
    )
    r = df.collect()[0]
    assert r.tod_str == "19:00:00" == r.tod_ts
