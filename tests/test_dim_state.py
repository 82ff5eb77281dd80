"""P5 with a changelog-maintained stateful dimension (streaming/dim_state):
mid-stream range updates must change subsequent joins — the reference's
current-state reads (EgvTransformer.java:51) at micro-batch granularity —
with the dimension living in engine state, not reloaded per batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.schemas import GOLDEN_RANGES
from kafka_streams_dexcom_spark.streaming.dim_state import (
    TAGGED_FIELDS,
    ktable_lookup_stateful,
    range_json,
    replay_reference,
    tag_egvs,
    tag_range_updates,
)
from kafka_streams_dexcom_spark.streaming.harness import run_stream

# logical history: golden ranges, events, a bounds update on range 2,
# more events, a tombstone on range 1, a now-unmatched event.
# (kind, seq, key, system_time, value, range_id, range_json)
HISTORY = (
    [
        ("dim", rid - 1, None, None, None, rid, range_json(st, et, lo, hi))
        for rid, st, et, lo, hi in GOLDEN_RANGES
    ]
    + [
        ("egv", 3, "u1", "2021-01-01T02:00:00", 100, None, None),  # r1 true
        ("egv", 4, "u2", "2021-01-01T10:00:00", 130, None, None),  # r2 true
        ("egv", 5, "u3", "2021-01-01T23:00:00", 100, None, None),  # r3 true
        # bounds update: range 2 tightens to 100..120
        ("dim", 6, None, None, None, 2,
         range_json("06:00:00", "21:59:59", 100, 120)),
        ("egv", 7, "u2", "2021-01-01T10:00:00", 130, None, None),  # now false
        ("egv", 8, "u2", "2021-01-01T12:00:00", 110, None, None),  # now true
        ("dim", 9, None, None, None, 1, None),  # tombstone range 1
        ("egv", 10, "u4", "2021-01-01T02:30:00", 100, None, None),  # no match
    ]
)


def _tagged_df(spark, n_buckets: int):
    dims = spark.createDataFrame(
        [(r[1], r[5], r[6]) for r in HISTORY if r[0] == "dim"],
        "seq long, range_id int, range_json string",
    )
    egvs = spark.createDataFrame(
        [(r[1], r[2], r[3], r[4]) for r in HISTORY if r[0] == "egv"],
        "seq long, key string, system_time string, value int",
    )
    return (
        tag_range_updates(dims, n_buckets)
        .unionByName(tag_egvs(egvs, n_buckets))
        .orderBy("seq", "bucket")
    )


def _expected():
    return sorted(replay_reference(list(HISTORY)), key=str)


def test_mid_stream_update_changes_subsequent_joins(spark):
    """Single-bucket run, 4 micro-batches: the same (key, time-of-day)
    categorizes differently before and after the changelog update, the
    tombstone un-matches later events, and the whole output equals the
    pure seq-order replay."""
    got = run_stream(
        spark, _tagged_df(spark, 1), ktable_lookup_stateful, num_chunks=4
    )
    got_t = sorted((tuple(r) for r in got), key=str)
    assert got_t == _expected()
    by_seq = {(r.key, r.system_time, r.value): r for r in got}
    assert by_seq[("u2", "2021-01-01T10:00:00", 130)].in_range is not None
    # same key+tod+value appears twice with DIFFERENT outcomes: that is
    # the state update being read by later batches
    u2 = [tuple(r) for r in got if r.key == "u2"]
    assert ("u2", "2021-01-01T10:00:00", 130, 2, 70, 180, "true") in u2
    assert ("u2", "2021-01-01T10:00:00", 130, 2, 100, 120, "false") in u2
    # tombstoned range: left-join null-enrichment policy
    assert (
        "u4", "2021-01-01T02:30:00", 100, None, None, None, None
    ) in {tuple(r) for r in got}


def test_multi_bucket_partitioning_is_transparent(spark):
    """Buckets are a parallelism knob, not a semantics knob: with the
    changelog replicated to every bucket and events hash-routed, the
    union across buckets equals the single-bucket replay."""
    got = run_stream(
        spark, _tagged_df(spark, 2), ktable_lookup_stateful, num_chunks=4
    )
    assert sorted((tuple(r) for r in got), key=str) == _expected()


def test_tag_functions_shapes(spark):
    tagged = _tagged_df(spark, 3)
    assert tagged.columns == list(TAGGED_FIELDS)
    rows = tagged.collect()
    # every dim row replicated to all 3 buckets
    dim_rows = [r for r in rows if r.kind == "dim"]
    assert len(dim_rows) == 5 * 3
    assert {r.bucket for r in dim_rows} == {0, 1, 2}
    # each event appears exactly once, in a stable bucket
    ev = [r for r in rows if r.kind == "egv"]
    assert len(ev) == 6
    again = {
        (r.key, r.seq): r.bucket for r in _tagged_df(spark, 3).collect()
        if r.kind == "egv"
    }
    assert {(r.key, r.seq): r.bucket for r in ev} == again


def test_stateful_dim_with_rocksdb_provider(spark):
    """The dimension store runs on the RocksDB state-store provider (the
    100 TB/day configuration, SURVEY §4) as a pure config swap."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = run_stream(
            spark, _tagged_df(spark, 1), ktable_lookup_stateful, num_chunks=4
        )
        assert sorted((tuple(r) for r in got), key=str) == _expected()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_null_value_matches_batch_operator_policy(spark):
    """Matched range + null value → \"false\", exactly what
    in_range_or_null's otherwise-branch produces; only an UNMATCHED row
    yields null in_range (review finding r4)."""
    from kafka_streams_dexcom_spark.streaming.dim_state import _lookup

    ranges = {"1": {"start_time": "00:00:00", "end_time": "23:59:59",
                    "lower_bound": 80, "upper_bound": 150}}
    rid, lo, hi, in_range = _lookup(ranges, "2021-01-01T10:00:00", None)
    assert (rid, lo, hi, in_range) == (1, 80, 150, "false")
    # cross-check against the real batch operator on the same inputs
    from pyspark.sql import functions as F

    from kafka_streams_dexcom_spark.operators.core import in_range_or_null

    got = spark.range(1).select(
        in_range_or_null(
            F.lit(None).cast("int"), F.lit(80), F.lit(150)
        ).alias("x")
    ).collect()[0].x
    assert got == in_range
