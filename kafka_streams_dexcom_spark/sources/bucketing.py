"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

At 100 TB, the dominant recurring cost of a star-schema workload is
re-shuffling the fact table for every join on the same key. Bucketing
pays that shuffle ONCE at write time: both sides stored hash-partitioned
by the join key into the same bucket count join with NO exchange — the
scan itself satisfies the join's distribution requirement (and sortBy
satisfies the sort requirement of a sort-merge join).

Rules that make it work (asserted in tests/test_bucketing.py):
- same bucket count on both sides (or a divisor, Spark 3.1+),
- join key == bucket key,
- spark.sql.sources.bucketing.enabled=true (default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
