"""Declared schemas for the reference's record types and the test tables.

EGV record fields mirror the reference POJO
(reference: src/main/java/com/github/robertzych/kafka/Egv.java:4-11);
the REST envelope mirrors DexcomEgvsResponse.java:5-9; the ranges
dimension mirrors the JSON piped at CategorizeWithKTableLookupTest.java:54-73.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Core EGV event (values are JSON documents on the wire; this is the
# schema-on-read StructType used with from_json on the strict path).
EGV_SCHEMA = T.StructType(
    [
        T.StructField("systemTime", T.StringType()),
        T.StructField("displayTime", T.StringType()),
        T.StructField("value", T.IntegerType()),
        T.StructField("realtimeValue", T.IntegerType()),
        T.StructField("smoothedValue", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("trend", T.StringType()),
        T.StructField("trendRate", T.FloatType()),
    ]
)

# REST API response envelope: nested array-of-struct, flattened with explode.
EGV_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("unit", T.StringType()),
        T.StructField("rateUnit", T.StringType()),
        T.StructField("egvs", T.ArrayType(EGV_SCHEMA)),
    ]
)

# OAuth token response (ingestion plumbing; DexcomTokenResponse.java:4-8).
TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("id_token", T.StringType()),
        T.StructField("access_token", T.StringType()),
        T.StructField("expires_in", T.IntegerType()),
        T.StructField("token_type", T.StringType()),
        T.StructField("refresh_token", T.StringType()),
    ]
)

# Time-of-day ranges dimension (KTable in the reference).
RANGE_SCHEMA = T.StructType(
    [
        T.StructField("range_id", T.IntegerType()),
        T.StructField("start_time", T.StringType()),  # "HH:mm:ss"
        T.StructField("end_time", T.StringType()),  # "HH:mm:ss"
        T.StructField("lower_bound", T.IntegerType()),
        T.StructField("upper_bound", T.IntegerType()),
    ]
)

# Golden ranges rows from the reference test corpus
# (CategorizeWithKTableLookupTest.java:54-73 via FIXTURES.md F2).
GOLDEN_RANGES = [
    (1, "00:00:00", "05:59:59", 80, 150),
    (2, "06:00:00", "21:59:59", 70, 180),
    (3, "22:00:00", "23:59:59", 80, 150),
]

# Driver testdata table names (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
