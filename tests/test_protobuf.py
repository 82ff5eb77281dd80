"""Protobuf topic serde (functions/protobuf.py): spec-compliant wire
bytes, Spark round-trip fidelity (nulls, NaN-vs-null floats, 64-bit
ints, negative ints), unknown-field skipping, tombstone passthrough."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.protobuf import (
    EGV_PROTO_FIELDS,
    from_protobuf_column,
    to_protobuf_column,
    validate_fields,
)


def test_protobuf_wire_format_is_spec_compliant(spark):
    """The vendored encoder must emit proto3 SPEC bytes (tag =
    field_number<<3 | wire_type, varint ints, little-endian IEEE
    floats, length-prefixed utf8, unset fields omitted) — golden bytes
    assembled by hand from the spec, so produced messages are readable
    by any real protobuf consumer with the message schema."""
    df = spark.createDataFrame(
        [("2021-01-01T00:00:00", None, 154, None, None, None, None, 1.5)],
        "systemTime string, displayTime string, value int, "
        "realtimeValue int, smoothedValue int, status string, "
        "trend string, trendRate float",
    )
    out = df.select(
        to_protobuf_column(
            F.struct(*[f[0] for f in EGV_PROTO_FIELDS]),
            EGV_PROTO_FIELDS,
            force_fallback=True,
        ).alias("wire")
    ).collect()[0]["wire"]
    ts = b"2021-01-01T00:00:00"
    golden = (
        b"\x0a" + bytes([len(ts)]) + ts      # field 1, wire 2 (LEN)
        # displayTime unset -> omitted
        + b"\x18\x9a\x01"                    # field 3, varint 154
        # realtimeValue/smoothedValue/status/trend unset -> omitted
        + b"\x45" + struct.pack("<f", 1.5)   # field 8, wire 5 (32BIT)
    )
    assert bytes(out) == golden


def test_protobuf_roundtrip_with_nulls_and_nan(spark):
    rows = [
        ("a", "b", 1, -1, None, "ok", None, float("nan")),
        (None, None, None, None, 2147483647, None, "flat", None),
        ("c", None, -2147483648, 7, 0, "", "up", -0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "systemTime string, displayTime string, value int, "
        "realtimeValue int, smoothedValue int, status string, "
        "trend string, trendRate float",
    )
    wire = df.select(
        to_protobuf_column(
            F.struct(*[f[0] for f in EGV_PROTO_FIELDS]),
            EGV_PROTO_FIELDS,
            force_fallback=True,
        ).alias("w")
    )
    back = wire.select(
        from_protobuf_column(
            F.col("w"), EGV_PROTO_FIELDS, force_fallback=True
        ).alias("r")
    ).select("r.*")
    got = back.collect()
    for want, g in zip(rows, got):
        gd = g.asDict()
        names = [f[0] for f in EGV_PROTO_FIELDS]
        for name, w in zip(names, want):
            v = gd[name]
            if isinstance(w, float):
                import math

                if math.isnan(w):
                    # NaN is a wire VALUE, not presence-omitted
                    assert v is not None and math.isnan(v)
                else:
                    assert v == w
            else:
                assert v == w


def test_protobuf_int64_exact_past_double(spark):
    """int64 values beyond 2^53 must survive the pandas transit exactly
    (the float64-coercion hazard the string detour exists to dodge)."""
    fields = [("big", 1, "int64"), ("neg", 2, "int64")]
    big = 2**62 + 12345
    df = spark.createDataFrame([(big, -big), (None, 5)], "big long, neg long")
    back = (
        df.select(
            to_protobuf_column(
                F.struct("big", "neg"), fields, force_fallback=True
            ).alias("w")
        )
        .select(
            from_protobuf_column(
                F.col("w"), fields, force_fallback=True
            ).alias("r")
        )
        .select("r.*")
        .collect()
    )
    assert (back[0]["big"], back[0]["neg"]) == (big, -big)
    assert (back[1]["big"], back[1]["neg"]) == (None, 5)


def test_protobuf_negative_int_is_ten_byte_varint(spark):
    """Standard (non-zigzag) int32 negatives are 64-bit two's-complement
    varints — 10 bytes plus the tag, per the spec."""
    fields = [("v", 1, "int32")]
    df = spark.createDataFrame([(-1,)], "v int")
    wire = df.select(
        to_protobuf_column(
            F.struct("v"), fields, force_fallback=True
        ).alias("w")
    ).collect()[0]["w"]
    assert bytes(wire) == b"\x08" + b"\xff" * 9 + b"\x01"


def test_protobuf_unknown_fields_skipped(spark):
    """A payload carrying extra (schema-evolved) fields decodes the
    known subset and skips the rest — the forward-compat contract."""
    known = [("value", 3, "int32")]
    # field 1 (string "xx"), field 3 (value 7), field 9 (double 2.5)
    payload = (
        b"\x0a\x02xx" + b"\x18\x07" + b"\x49" + struct.pack("<d", 2.5)
    )
    df = spark.createDataFrame([(bytearray(payload),)], "w binary")
    got = (
        df.select(
            from_protobuf_column(
                F.col("w"), known, force_fallback=True
            ).alias("r")
        )
        .select("r.*")
        .collect()[0]
    )
    assert got["value"] == 7


def test_protobuf_out_of_order_and_duplicate_fields(spark):
    """Fields may arrive in any order; duplicates are last-one-wins."""
    fields = [("a", 1, "int32"), ("b", 2, "string")]
    payload = b"\x12\x01y" + b"\x08\x05" + b"\x08\x09"  # b, a=5, a=9
    df = spark.createDataFrame([(bytearray(payload),)], "w binary")
    got = (
        df.select(
            from_protobuf_column(
                F.col("w"), fields, force_fallback=True
            ).alias("r")
        )
        .select("r.*")
        .collect()[0]
    )
    assert got["a"] == 9 and got["b"] == "y"


def test_protobuf_tombstone_decodes_to_null_struct(spark):
    df = spark.createDataFrame(
        [(None,), (bytearray(b"\x08\x01"),)], "w binary"
    )
    got = df.select(
        from_protobuf_column(
            F.col("w"), [("a", 1, "int32")], force_fallback=True
        ).alias("r")
    ).collect()
    assert got[0]["r"] is None
    assert got[1]["r"]["a"] == 1


def test_protobuf_schema_validation():
    with pytest.raises(ValueError, match="duplicate"):
        validate_fields([("a", 1, "int32"), ("b", 1, "string")])
    with pytest.raises(ValueError, match="unsupported"):
        validate_fields([("a", 1, "sint96")])
    with pytest.raises(ValueError, match=">= 1"):
        validate_fields([("a", 0, "int32")])


def test_protobuf_stream_source_shape(spark, tmp_path):
    """kafka_stream_protobuf wiring: the decode column analyzes against
    a kafka-shaped STREAMING frame (no broker in the sandbox — same
    harness discipline as the Avro source); schema must be the EGV
    struct."""
    import os

    from kafka_streams_dexcom_spark.functions.protobuf import (
        spark_struct_for,
    )
    from kafka_streams_dexcom_spark.schemas import EGV_SCHEMA

    assert spark_struct_for(EGV_PROTO_FIELDS) == EGV_SCHEMA
    src = str(tmp_path / "kafkaish")
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(
        "key string, value binary, topic string, partition int, "
        "offset long, timestamp timestamp"
    ).parquet(src)
    decoded = stream.select(
        "key",
        from_protobuf_column(
            F.col("value"), EGV_PROTO_FIELDS, spark=spark
        ).alias("parsed"),
    )
    assert decoded.isStreaming
    assert decoded.schema["parsed"].dataType == EGV_SCHEMA

def test_skip_unknown_truncated_raises():
    """A corrupt/overlong unknown-field length must raise like the
    known-field decoders do — not silently end the loop and NULL out
    the remaining fields."""
    from kafka_streams_dexcom_spark.functions.protobuf import _skip_unknown

    # length-delimited (wire 2) claiming 100 bytes in a 3-byte buffer
    buf = b"\x64ab"
    with pytest.raises(ValueError, match="truncated"):
        _skip_unknown(2, buf, 0)
    # fixed 8/4-byte skips past the end
    with pytest.raises(ValueError, match="truncated"):
        _skip_unknown(1, b"\x01\x02", 0)
    with pytest.raises(ValueError, match="truncated"):
        _skip_unknown(5, b"\x01\x02", 0)
    # in-bounds skips still land exactly past the field
    assert _skip_unknown(2, b"\x02abXY", 0) == 3
    assert _skip_unknown(5, b"abcdE", 0) == 4


def test_truncated_unknown_field_fails_loudly(spark):
    """End-to-end: the decode task must FAIL on the corrupt payload,
    not decode it to a row of NULLs."""
    # valid field 1 (int32=5), then unknown field 7 wire 2 with an
    # overlong length
    payload = b"\x08\x05" + b"\x3a\x7fonly-a-few-bytes"
    df = spark.createDataFrame([(bytearray(payload),)], "w binary")
    out = df.select(
        from_protobuf_column(
            F.col("w"), [("a", 1, "int32")], force_fallback=True
        ).alias("r")
    )
    with pytest.raises(Exception, match="truncated unknown field"):
        out.collect()
