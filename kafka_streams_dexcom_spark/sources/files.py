"""Parquet table loaders for the driver testdata (TESTDATA.md).

Columnar parquet scans are the batch stand-in for the reference's Kafka
topic sources; Catalyst pushes filters and prunes columns into the scan,
which is the property the 100 TB design depends on (verify with
plans.assert_pushed_filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_dexcom_spark.schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # parquet TIMESTAMP(NANOS) read as long (see session.py); truncate
        # to µs exactly as DuckDB does so oracle comparisons agree.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
