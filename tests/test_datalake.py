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


def test_ts_range_predicate_prunes_partitions(spark, sf_dir):
    """The temporal-query discipline SCALE.md claims, pinned in the plan:
    filter_ts_range over a partitioned copy of events must (a) show the
    dt bounds as PartitionFilters, (b) push the ts residual to the scan,
    (c) actually open FEWER files than the full table, and (d) return
    exactly the rows a plain ts filter returns."""
    from kafka_streams_dexcom_spark.streaming.datalake import filter_ts_range

    e = with_date_partitions(load_table(spark, sf_dir, "events"))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/events_lake"
        write_partitioned(e, path, ("dt",))
        back = read_partitioned(spark, path)
        n_days = back.select("dt").distinct().count()
        assert n_days >= 3, "need multiple dt partitions to observe pruning"
        lo, hi = "2024-01-02 06:00:00", "2024-01-03 18:00:00"
        pruned = filter_ts_range(back, lo, hi)
        plan = explain_str(pruned)
        part_section = plan[plan.index("PartitionFilters") :].split("\n")[0]
        assert "dt" in part_section, plan
        assert "PushedFilters" in plan and "ts" in plan, plan
        # lossless: same rows as the plain ts predicate
        expect = (
            back.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .select("event_id")
            .collect()
        )
        # pruning is real, proven behaviorally: poison a partition OUTSIDE
        # the range with a corrupt parquet file — a pruned scan never
        # opens it; an unpruned scan dies on it
        poison_dir = f"{path}/dt=2024-01-05"
        assert os.path.isdir(poison_dir), os.listdir(path)
        with open(f"{poison_dir}/part-poison.parquet", "wb") as fh:
            fh.write(b"this is not a parquet file")
        back2 = read_partitioned(spark, path)
        got = filter_ts_range(back2, lo, hi).select("event_id").collect()
        import pytest as _pytest

        with _pytest.raises(Exception):
            back2.select("event_id").collect()  # unpruned scan hits poison
        assert sorted(r.event_id for r in got) == sorted(
            r.event_id for r in expect
        )
