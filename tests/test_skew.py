"""Salting correctness: salted two-phase aggregation must equal the plain
aggregation; salted join must equal the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.skew import (
    replicate_for_salted_join,
    salted_agg,
    with_salt,
)
from kafka_streams_dexcom_spark.sources.files import load_table


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        (r.user_id): (r.n, round(r.s, 6))
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r.user_id): (r.n, round(r.s, 6))
        for r in salted_agg(
            e.select("user_id", "value"),
            ["user_id"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "s": (F.sum("value"), F.sum("s")),
            },
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("tag", F.col("user_id") * 10)
    )
    plain = set(
        (r.event_id, r.tag) for r in e.join(dim, "user_id").collect()
    )
    big = with_salt(e)
    small = replicate_for_salted_join(dim)
    salted = set(
        (r.event_id, r.tag)
        for r in big.join(small, ["user_id", "__salt"]).collect()
    )
    assert plain == salted


def test_salt_is_deterministic_on_recompute(spark, sf_dir):
    """The salt feeds a shuffle key, so it must re-derive identically on
    task retry (SPARK-23207 class: an indeterminate map stage under
    shuffle-fetch failure can double-count or drop rows). Hash of
    (partition id, content) recomputes stably over a deterministic scan."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    a = {r["event_id"]: r["__salt"] for r in with_salt(e).collect()}
    b = {r["event_id"]: r["__salt"] for r in with_salt(e).collect()}
    assert a == b
    assert set(a.values()) > {0}  # actually spreads across salts


def test_salt_works_on_streaming_frames(spark, tmp_path):
    """monotonically_increasing_id() is rejected on streaming DataFrames;
    the deterministic salt must not be."""
    from pyspark.sql.types import StructField, StructType, LongType

    schema = StructType([StructField("user_id", LongType())])
    src = str(tmp_path / "in")
    import os

    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(src)
    salted = with_salt(stream)  # must not raise at analysis time
    assert salted.isStreaming


def test_salt_tolerates_map_columns(spark):
    """Map-typed columns are unhashable for xxhash64; with_salt must
    exclude them from the hash input instead of failing analysis."""
    df = spark.createDataFrame(
        [(1, {"a": 1})], "k long, m map<string,int>"
    )
    out = with_salt(df).collect()
    assert 0 <= out[0]["__salt"] < 16
