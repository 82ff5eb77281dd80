"""Incremental materialized aggregate, compaction, and schema-evolution
reads."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.streaming.incremental import (
    IncrementalCounts,
    compact_small_files,
)


def test_incremental_counts_across_batches(spark):
    with tempfile.TemporaryDirectory() as d:
        view = IncrementalCounts(spark, f"{d}/view", "user_id")
        b1 = spark.createDataFrame(
            [(1, 10.0), (1, 20.0), (2, 5.0)], "user_id long, value double"
        )
        b2 = spark.createDataFrame(
            [(1, 1.0), (3, 7.0)], "user_id long, value double"
        )
        view(b1, 0)
        view(b2, 1)
        got = {
            r.user_id: (r.n_events, r.sum_value)
            for r in view.read().collect()
        }
        assert got == {1: (3, 31.0), 2: (1, 5.0), 3: (1, 7.0)}


def test_incremental_equals_full_recompute(spark, sf_dir):
    from kafka_streams_dexcom_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    full = {
        r.user_id: (r.n_events, round(r.sum_value, 2))
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    with tempfile.TemporaryDirectory() as d:
        view = IncrementalCounts(spark, f"{d}/view", "user_id")
        rows = e.collect()
        third = len(rows) // 3 + 1
        for i, start in enumerate(range(0, len(rows), third)):
            view(
                spark.createDataFrame(rows[start : start + third], e.schema),
                i,
            )
        inc = {
            r.user_id: (r.n_events, round(r.sum_value, 2))
            for r in view.read().collect()
        }
    assert inc == full


def test_compact_small_files(spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/frag"
        df = spark.range(1000).withColumn("v", F.col("id") * 2)
        df.repartition(24).write.parquet(path)  # 24 tiny files
        assert len(glob.glob(f"{path}/*.parquet")) == 24
        compact_small_files(spark, path, target_file_mb=128)
        assert len(glob.glob(f"{path}/*.parquet")) == 1  # tiny data → 1 file
        back = spark.read.parquet(path)
        assert back.count() == 1000
        assert back.agg(F.sum("v")).collect()[0][0] == 999 * 1000


def test_schema_evolution_merge_read(spark):
    """New columns appearing in later files read seamlessly with
    mergeSchema — the forward-compatible ingestion contract."""
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame([(1, "a")], "id long, x string").write.parquet(
            f"{d}/t/p1"
        )
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, x string, score double"
        ).write.parquet(f"{d}/t/p2")
        merged = spark.read.option("mergeSchema", "true").parquet(
            f"{d}/t/p1", f"{d}/t/p2"
        )
        rows = {r.id: (r.x, r.score) for r in merged.collect()}
        assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_swap_directory_and_crash_recovery(tmp_path):
    """swap publishes staging by rename (live never delete-rewritten);
    recover_directory restores the .old copy if a crash stranded it."""
    import os

    from kafka_streams_dexcom_spark.streaming.incremental import (
        recover_directory,
        swap_directory,
    )

    live, staging = str(tmp_path / "view"), str(tmp_path / "view.staging")
    os.makedirs(live), os.makedirs(staging)
    open(os.path.join(live, "v1"), "w").write("old")
    open(os.path.join(staging, "v2"), "w").write("new")
    swap_directory(staging, live)
    assert os.listdir(live) == ["v2"]
    assert not os.path.exists(staging)
    assert not os.path.exists(live + ".old")

    # simulate a crash between the two renames: live missing, .old present
    os.rename(live, live + ".old")
    recover_directory(live)
    assert os.listdir(live) == ["v2"]


def test_incremental_replay_is_idempotent(spark):
    """foreachBatch is at-least-once: a crash between view publish and
    checkpoint commit replays the last micro-batch. The view records the
    applied batch_id and must skip the replay, or every key in that
    batch double-counts."""
    with tempfile.TemporaryDirectory() as d:
        view = IncrementalCounts(spark, f"{d}/view", "user_id")
        b1 = spark.createDataFrame(
            [(1, 10.0), (2, 5.0)], "user_id long, value double"
        )
        view(b1, 0)
        view(b1, 0)  # replayed batch: must be a no-op
        b2 = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
        view(b2, 1)
        view(b2, 1)  # and again for a later batch
        got = {
            r.user_id: (r.n_events, r.sum_value)
            for r in view.read().collect()
        }
        assert got == {1: (2, 11.0), 2: (1, 5.0)}


def test_incremental_string_keyed_view(spark):
    """The empty bootstrap frame derives the key TYPE from the batch —
    a string-keyed view must not be forced through a long-typed merge."""
    with tempfile.TemporaryDirectory() as d:
        view = IncrementalCounts(spark, f"{d}/view", "status")
        b = spark.createDataFrame(
            [("ok", 1.0), ("ok", 2.0), ("err", 5.0)],
            "status string, value double",
        )
        view(b, 0)
        got = {
            r.status: (r.n_events, r.sum_value)
            for r in view.read().collect()
        }
        assert got == {"ok": (2, 3.0), "err": (1, 5.0)}


def test_fresh_view_read_returns_empty_dataframe(spark, tmp_path):
    """read() always returns a DataFrame: collect() on a fresh view is an
    empty result, never an AttributeError (r3 ADVICE contract fix)."""
    view = IncrementalCounts(spark, f"{tmp_path}/view", "user_id")
    assert view.read().collect() == []


def test_lineage_mismatch_fails_loudly(spark, tmp_path):
    """A NEW streaming query (fresh checkpoint, batch ids restarting at 0)
    pointed at an EXISTING view directory must error, not silently drop
    its early batches through the replay guard (r3 ADVICE item)."""
    import pytest

    path = f"{tmp_path}/view"
    b = spark.createDataFrame([(1, 10.0)], "user_id long, value double")
    view_a = IncrementalCounts(spark, path, "user_id", lineage_id="ckpt-a")
    view_a(b, 0)
    view_a(b, 1)

    # same lineage resumes fine (replay of batch 1 skipped, batch 2 applied)
    view_a2 = IncrementalCounts(spark, path, "user_id", lineage_id="ckpt-a")
    view_a2(b, 1)
    view_a2(b, 2)
    got = {r.user_id: r.n_events for r in view_a2.read().collect()}
    assert got == {1: 3}

    # a different lineage restarting at batch 0 is rejected
    view_b = IncrementalCounts(spark, path, "user_id", lineage_id="ckpt-b")
    with pytest.raises(ValueError, match="lineage"):
        view_b(b, 0)


def test_legacy_marker_requires_explicit_adoption(spark, tmp_path):
    """A pre-lineage marker is ambiguous: binding a lineage to it must
    fail loudly, and adopt_legacy() is the explicit upgrade path
    (review finding r4)."""
    import pytest

    path = f"{tmp_path}/view"
    b = spark.createDataFrame([(1, 10.0)], "user_id long, value double")
    legacy = IncrementalCounts(spark, path, "user_id")  # no lineage
    legacy(b, 0)
    upgraded = IncrementalCounts(spark, path, "user_id", lineage_id="ck-a")
    with pytest.raises(ValueError, match="legacy"):
        upgraded(b, 1)
    upgraded.adopt_legacy()
    upgraded(b, 1)  # now resumes cleanly
    got = {r.user_id: r.n_events for r in upgraded.read().collect()}
    assert got == {1: 2}
