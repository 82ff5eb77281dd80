"""as-of join unit tests: inclusive at-or-before semantics, multiple
payload types (the bigint-only-payload regression), no-prior-match nulls."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.temporal import asof_join


def test_asof_inclusive_and_no_prior(spark):
    # shared column names: key k, timestamp ts, tiebreak eid
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100),
            (1, "2024-01-01 11:00:00", 101),
            (2, "2024-01-01 09:00:00", 200),  # before any right row
        ],
        "k long, ts_s string, eid long",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "eid")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, 1.5),  # same instant as eid=100
            (1, "2024-01-01 10:30:00", 8, 2.5),
            (2, "2024-01-01 12:00:00", 9, 3.5),  # after key-2's only left row
        ],
        "k long, ts_s string, eid long, score double",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "eid", "score")
    out = asof_join(
        left,
        right,
        key_cols=["k"],
        ts_col="ts",
        right_payload={
            "last_eid": F.col("eid"),
            "last_score": F.col("score"),  # double payload (regression)
        },
        tiebreak_col="eid",
    )
    rows = {
        r.eid: (r.last_eid, r.last_score)
        for r in out.collect()
        if r.eid in (100, 101, 200)
    }
    assert rows[100] == (7, 1.5)      # inclusive: same-instant right counts
    assert rows[101] == (8, 2.5)      # latest at-or-before 11:00
    assert rows[200] == (None, None)  # nothing at-or-before 09:00 for key 2


def test_asof_null_payload_on_winning_row_is_preserved(spark):
    """merge_asof semantics: the latest at-or-before right ROW wins even
    when its payload value is NULL — an older row's non-null value must
    NOT leak through (per-column last(ignorenulls) would do that)."""
    from pyspark.sql import functions as F

    from kafka_streams_dexcom_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u1", 100, 1)], "k string, ts long, seq int"
    )
    right = spark.createDataFrame(
        [("u1", 10, 1, 7), ("u1", 50, 2, None)],
        "k string, ts long, seq int, payload int",
    )
    out = asof_join(
        left,
        right,
        key_cols=["k"],
        ts_col="ts",
        right_payload={"payload": F.col("payload")},
        tiebreak_col="seq",
    ).collect()
    assert len(out) == 1
    # winning right row is ts=50 whose payload is NULL — must stay NULL
    assert out[0]["payload"] is None
