"""Partitioned data-lake writer tests: layout, idempotent backfill,
partition pruning in the read plan."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.plans import explain_str
from kafka_streams_dexcom_spark.sources.files import load_table
from kafka_streams_dexcom_spark.streaming.datalake import (
    overwrite_partitions,
    read_partitioned,
    with_date_partitions,
    write_partitioned,
)


def test_write_read_roundtrip_with_pruning(spark, sf_dir):
    e = with_date_partitions(load_table(spark, sf_dir, "events"))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/events_lake"
        write_partitioned(e, path, ("dt",))
        assert any(p.startswith("dt=") for p in os.listdir(path))
        back = read_partitioned(spark, path)
        assert back.count() == e.count()
        # partition pruning: dt filter appears as PartitionFilters, and the
        # scan only touches that directory
        pruned = back.filter(F.col("dt") == "2024-01-01")
        plan = explain_str(pruned)
        assert "PartitionFilters" in plan and "dt" in plan, plan


def test_overwrite_partitions_is_idempotent_backfill(spark, sf_dir):
    e = with_date_partitions(load_table(spark, sf_dir, "events"))
    days = [r.dt for r in e.select("dt").distinct().limit(2).collect()]
    day0 = e.filter(F.col("dt") == days[0])
    day1 = e.filter(F.col("dt") == days[1])
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/lake"
        write_partitioned(day0, path, ("dt",))
        write_partitioned(day1, path, ("dt",))
        total = read_partitioned(spark, path).count()
        # re-run day0's backfill twice: replaces, never duplicates
        overwrite_partitions(day0, path, ("dt",))
        overwrite_partitions(day0, path, ("dt",))
        assert read_partitioned(spark, path).count() == total
