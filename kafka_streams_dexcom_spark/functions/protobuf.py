"""Protobuf topic-boundary serde — completes the serde matrix at the
reference's topic boundary (reference:
src/main/java/com/github/robertzych/kafka/CategorizeWithSimpleRule.java:58-59
configures the Serde pair per topic; Avro landed in functions/avro.py,
this is the protobuf twin).

Dispatch mirrors functions/avro.py: Spark's native ``from_protobuf``/
``to_protobuf`` (the spark-protobuf package, JVM-side) are used when the
package is loaded AND the caller supplies descriptor information
(``desc_file`` + ``message_name``) — always the right choice on a real
cluster. Otherwise the serde falls back to a vendored pure-Python
protobuf **wire-format** codec running as Arrow-batched pandas UDFs.
The fallback writes spec-compliant proto3 wire bytes (tag =
field_number<<3 | wire_type, two's-complement varints for int32/int64,
little-endian IEEE floats, length-prefixed utf8), so bytes produced
here are readable by any protobuf consumer given the message schema —
the wire format, not a lookalike.

Scope of the vendored codec (the EGV-message shape): flat messages with
string / bytes / int32 / int64 / float / double / bool fields, proto3
explicit-presence semantics (an unset field is OMITTED from the wire;
a missing field decodes to NULL). Unknown fields are SKIPPED on decode
per the spec (forward compatibility), and fields may arrive in any
order.

Pandas round-trip fidelity (same hazards as the Avro fallback):
int32/int64 transit as decimal strings (a null in a pandas int column
silently coerces to float64, destroying |v| >= 2^53); float/double
carry a Spark-computed isNull mask on encode (NaN is a VALUE on the
wire, only SQL NULL means unset) and return as exact decimal strings
rebuilt with a Spark cast on decode.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# wire types per scalar type
_WIRE_VARINT = 0
_WIRE_64BIT = 1
_WIRE_LEN = 2
_WIRE_32BIT = 5

_PTYPES = {
    "string": _WIRE_LEN,
    "bytes": _WIRE_LEN,
    "int32": _WIRE_VARINT,
    "int64": _WIRE_VARINT,
    "bool": _WIRE_VARINT,
    "float": _WIRE_32BIT,
    "double": _WIRE_64BIT,
}

_SPARK_TYPES = {
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "bool": T.BooleanType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
}

# The reference's EGV POJO as a proto3 message (Egv.java:4-11), field
# numbers in declaration order — the wire contract a protobuf-speaking
# producer/consumer of the egvs topic would use.
EGV_PROTO_FIELDS: list[tuple[str, int, str]] = [
    ("systemTime", 1, "string"),
    ("displayTime", 2, "string"),
    ("value", 3, "int32"),
    ("realtimeValue", 4, "int32"),
    ("smoothedValue", 5, "int32"),
    ("status", 6, "string"),
    ("trend", 7, "string"),
    ("trendRate", 8, "float"),
]


def validate_fields(fields: list[tuple[str, int, str]]) -> None:
    """Raise at schema-declaration time, not per-record: duplicate or
    non-positive field numbers and unsupported types are schema bugs."""
    seen: set[int] = set()
    for name, num, typ in fields:
        if typ not in _PTYPES:
            raise ValueError(f"field {name!r}: unsupported type {typ!r}")
        if num <= 0:
            raise ValueError(f"field {name!r}: field number must be >= 1")
        if num in seen:
            raise ValueError(f"duplicate field number {num}")
        seen.add(num)


def spark_struct_for(fields: list[tuple[str, int, str]]) -> T.StructType:
    """The Spark StructType a decoded message lands in."""
    return T.StructType(
        [
            T.StructField(name, _SPARK_TYPES[typ], nullable=True)
            for name, _num, typ in fields
        ]
    )


def _varint_encode(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _encode_field(num: int, typ: str, v) -> bytes:
    tag = _varint_encode((num << 3) | _PTYPES[typ])
    if typ in ("int32", "int64"):
        # standard (non-zigzag) ints: negatives are 64-bit
        # two's-complement, always 10 varint bytes — the spec encoding
        return tag + _varint_encode(int(v) & 0xFFFFFFFFFFFFFFFF)
    if typ == "bool":
        return tag + _varint_encode(1 if v else 0)
    if typ == "float":
        return tag + struct.pack("<f", float(v))
    if typ == "double":
        return tag + struct.pack("<d", float(v))
    raw = str(v).encode("utf-8") if typ == "string" else bytes(v)
    return tag + _varint_encode(len(raw)) + raw


def _decode_scalar(typ: str, buf: bytes, pos: int):
    if typ in ("int32", "int64"):
        u, pos = _varint_decode(buf, pos)
        # interpret as 64-bit two's-complement, then narrow
        if u >= 1 << 63:
            u -= 1 << 64
        if typ == "int32":
            u = ((u + (1 << 31)) % (1 << 32)) - (1 << 31)
        return u, pos
    if typ == "bool":
        u, pos = _varint_decode(buf, pos)
        return u != 0, pos
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    n, pos = _varint_decode(buf, pos)
    raw = buf[pos : pos + n]
    if len(raw) != n:
        raise ValueError("truncated length-delimited field")
    return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n


def _skip_unknown(wire: int, buf: bytes, pos: int) -> int:
    """Spec-compliant unknown-field skip — forward compatibility is the
    point of field numbers; failing on an unknown tag would break the
    rolling-upgrade story protobuf exists to provide."""
    if wire == _WIRE_VARINT:
        _, pos = _varint_decode(buf, pos)
        return pos
    # skips must bounds-check like _decode_scalar does: returning
    # pos > len(buf) silently ends the decode loop and drops every
    # remaining field to NULL instead of raising on the corrupt byte
    if wire == _WIRE_64BIT:
        end = pos + 8
    elif wire == _WIRE_32BIT:
        end = pos + 4
    elif wire == _WIRE_LEN:
        n, pos = _varint_decode(buf, pos)
        end = pos + n
    else:
        raise ValueError(f"unsupported wire type {wire}")
    if end > len(buf):
        raise ValueError("truncated unknown field")
    return end


_PROTOBUF_PROBE_CACHE: dict[str, bool] = {}


def protobuf_datasource_loaded(spark: SparkSession) -> bool:
    """True when the spark-protobuf package is usable. Probed by
    ANALYZING a tiny to_protobuf expression (same rationale as
    functions/avro.avro_datasource_loaded: runtime-added jars live in
    the mutable user classloader a Class.forName probe misses). Cached
    per application."""
    key = spark.sparkContext.applicationId
    cached = _PROTOBUF_PROBE_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        from pyspark.sql.protobuf.functions import to_protobuf

        # an arbitrary-but-wellformed descriptor reference: analysis
        # raises PROTOBUF_NOT_LOADED (or a descriptor error AFTER the
        # classpath check) when the package is absent
        spark.range(1).select(
            to_protobuf(
                F.struct(F.lit(1).alias("x")), "probe", b"\x00"
            )
        )
        ok = True
    except Exception as e:  # noqa: BLE001
        # descriptor errors mean the package IS loaded
        ok = "CANNOT_PARSE_PROTOBUF_DESCRIPTOR" in str(e)
    _PROTOBUF_PROBE_CACHE[key] = ok
    return ok


def to_protobuf_column(
    data: Column,
    fields: list[tuple[str, int, str]],
    *,
    spark: SparkSession | None = None,
    message_name: str | None = None,
    desc_file: str | None = None,
    force_fallback: bool = False,
) -> Column:
    """Struct column → protobuf wire-format binary column. Native
    to_protobuf when the spark-protobuf package is loaded and the
    caller supplies (``message_name``, ``desc_file``); else the
    vendored pandas-UDF codec over ``fields``."""
    validate_fields(fields)
    if (
        not force_fallback
        and spark is not None
        and message_name is not None
        and desc_file is not None
        and protobuf_datasource_loaded(spark)
    ):
        from pyspark.sql.protobuf.functions import to_protobuf

        return to_protobuf(data, message_name, descFilePath=desc_file)

    # pandas transit shaping — see module docstring (same discipline as
    # functions/avro.to_avro_column)
    shaped_fields = []
    float_masks = []
    for name, _num, typ in fields:
        if typ in ("int32", "int64"):
            shaped_fields.append(
                data.getField(name).cast("string").alias(name)
            )
        else:
            shaped_fields.append(data.getField(name).alias(name))
            if typ in ("float", "double"):
                float_masks.append(
                    data.getField(name).isNull().alias(f"__mask_{name}")
                )
    shaped = F.struct(*shaped_fields, *float_masks)

    @F.pandas_udf("binary")
    def enc(s):
        import pandas as pd

        out = []
        for i in range(len(s)):
            buf = bytearray()
            for name, num, typ in fields:
                v = s[name].iloc[i]
                if typ in ("float", "double"):
                    is_null = bool(s[f"__mask_{name}"].iloc[i])
                elif typ in ("int32", "int64"):
                    is_null = v is None  # string detour: object dtype
                else:
                    is_null = v is None or (
                        not isinstance(v, (str, bytes)) and pd.isna(v)
                    )
                if is_null:
                    continue  # proto3 presence: unset = omitted
                if typ in ("int32", "int64"):
                    v = int(v)  # exact: parsed from the decimal string
                buf += _encode_field(num, typ, v)
            out.append(bytes(buf))
        return pd.Series(out)

    return enc(shaped)


def from_protobuf_column(
    data: Column,
    fields: list[tuple[str, int, str]],
    *,
    spark: SparkSession | None = None,
    message_name: str | None = None,
    desc_file: str | None = None,
    force_fallback: bool = False,
) -> Column:
    """Protobuf binary column → struct column (inverse of
    to_protobuf_column)."""
    validate_fields(fields)
    if (
        not force_fallback
        and spark is not None
        and message_name is not None
        and desc_file is not None
        and protobuf_datasource_loaded(spark)
    ):
        from pyspark.sql.protobuf.functions import from_protobuf

        return from_protobuf(data, message_name, descFilePath=desc_file)

    out_type = spark_struct_for(fields)
    by_num = {num: (name, typ) for name, num, typ in fields}
    _PD_DTYPES = {"int32": "Int32", "int64": "Int64", "bool": "boolean"}
    inter_type = T.StructType(
        [
            T.StructField(
                name,
                T.StringType()
                if typ in ("float", "double")
                else _SPARK_TYPES[typ],
                nullable=True,
            )
            for name, _num, typ in fields
        ]
    )

    def _float_str(v) -> str:
        import math

        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(v)

    @F.pandas_udf(returnType=inter_type)
    def dec(s):
        import pandas as pd

        cols: dict[str, list] = {name: [] for name, _, _ in fields}
        for payload in s:
            row = {name: None for name, _, _ in fields}
            if payload is not None:
                pos = 0
                while pos < len(payload):
                    key, pos = _varint_decode(payload, pos)
                    num, wire = key >> 3, key & 0x07
                    hit = by_num.get(num)
                    if hit is None or _PTYPES[hit[1]] != wire:
                        # unknown number OR wire-type mismatch (a
                        # schema-evolved field): skip per spec
                        pos = _skip_unknown(wire, payload, pos)
                        continue
                    name, typ = hit
                    v, pos = _decode_scalar(typ, payload, pos)
                    if typ in ("float", "double"):
                        v = _float_str(v)
                    # last-one-wins on duplicates, per the spec
                    row[name] = v
            for name, _num, _typ in fields:
                cols[name].append(row[name])
        return pd.DataFrame(
            {
                name: pd.array(
                    [pd.NA if v is None else v for v in cols[name]],
                    dtype=_PD_DTYPES[typ],
                )
                if typ in _PD_DTYPES
                else pd.Series(cols[name], dtype="object")
                for name, typ in ((n, t) for n, _u, t in fields)
            }
        )

    inter = dec(data)
    rebuilt = F.struct(
        *[
            inter.getField(name).cast(_SPARK_TYPES[typ]).alias(name)
            if typ in ("float", "double")
            else inter.getField(name).alias(name)
            for name, _num, typ in fields
        ]
    )
    # Kafka tombstone / absent value → true NULL struct (matches the
    # native function's null passthrough), not a query-killing error
    return F.when(data.isNull(), F.lit(None).cast(out_type)).otherwise(
        rebuilt
    )
