"""Property test: pairs_within_buckets must emit exactly the unordered
within-bucket pairs a naive self-join would — for random bucket shapes
including duplicates-in-bucket and singleton buckets."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.dedup import pairs_within_buckets


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 30)),  # (bucket, id)
        min_size=0,
        max_size=25,
        unique=True,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_pairs_within_buckets_matches_reference(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "bucket int, id long")
    got = sorted(
        (r.pair_a.id, r.pair_b.id)
        for r in pairs_within_buckets(
            df, ["bucket"], F.struct(F.col("id").alias("id"))
        ).collect()
    )
    # reference: all unordered pairs within each bucket
    buckets: dict[int, list[int]] = {}
    for b, i in rows:
        buckets.setdefault(b, []).append(i)
    want = sorted(
        (min(a, b), max(a, b))
        for members in buckets.values()
        for a, b in combinations(sorted(members), 2)
    )
    assert got == want
    assert all(a < b for a, b in got)  # id-ascending normalization


def test_max_bucket_drops_hot_bucket(spark):
    """Scale guard: a degenerate hot bucket (stop-shingle / empty-doc
    band value) is dropped entirely when it exceeds max_bucket, while
    normal buckets are unaffected — and dropped_buckets reports exactly
    the dropped one with its size."""
    from kafka_streams_dexcom_spark.operators.dedup import dropped_buckets

    rows = [(0, i) for i in range(50)] + [(1, 100), (1, 101), (1, 102)]
    df = spark.createDataFrame(rows, "bucket int, id long")
    capped = pairs_within_buckets(
        df, ["bucket"], F.struct(F.col("id").alias("id")), max_bucket=10
    )
    got = sorted((r.pair_a.id, r.pair_b.id) for r in capped.collect())
    # only the 3-member bucket survives: its 3 pairs
    assert got == [(100, 101), (100, 102), (101, 102)]
    diag = dropped_buckets(df, ["bucket"], max_bucket=10).collect()
    assert [(r.bucket, r.bucket_size) for r in diag] == [(0, 50)]
