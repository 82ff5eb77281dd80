"""Avro topic-boundary serde — the reference's own TODO
(reference: src/main/java/com/github/robertzych/kafka/ProducerDexcom.java:42
"TODO: use avro"), completing the dual-schema story of SURVEY §1.2.

Dispatch: Spark's native ``from_avro``/``to_avro`` (the spark-avro
package, JVM-side, codegen'd) are used whenever the datasource is loaded
— that is always the right choice on a real cluster. When the package is
NOT on the classpath (this sandbox, ad-hoc local runs), the serde falls
back to a vendored pure-Python Avro **binary** codec running as
Arrow-batched pandas UDFs. The fallback writes spec-compliant Avro
binary (zigzag varint longs, length-prefixed utf8, little-endian IEEE
floats, union index prefixes), so bytes produced here are readable by
any Avro consumer given the writer schema — the wire format, not a
lookalike.

Scope of the vendored codec (the EGV-record shape): flat records whose
fields are string / bytes / int / long / float / double / boolean or the
nullable union ["null", <primitive>]. Anything else raises at
schema-parse time.

Confluent framing: Kafka Avro payloads usually carry the Schema-Registry
wire header (magic 0x00 + 4-byte schema id) before the Avro body;
``confluent_schema_id`` prepends/strips it.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRIMITIVES = {
    "string",
    "bytes",
    "int",
    "long",
    "float",
    "double",
    "boolean",
}

_SPARK_TYPES = {
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}

# The reference's EGV POJO as an Avro record (Egv.java:4-11); every field
# nullable, the standard POJO-derived-schema convention.
EGV_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Egv",
        "namespace": "com.github.robertzych.kafka",
        "fields": [
            {"name": "systemTime", "type": ["null", "string"]},
            {"name": "displayTime", "type": ["null", "string"]},
            {"name": "value", "type": ["null", "int"]},
            {"name": "realtimeValue", "type": ["null", "int"]},
            {"name": "smoothedValue", "type": ["null", "int"]},
            {"name": "status", "type": ["null", "string"]},
            {"name": "trend", "type": ["null", "string"]},
            {"name": "trendRate", "type": ["null", "float"]},
        ],
    }
)


def parse_record_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """[(field name, primitive type, nullable)] from an Avro record
    schema; raises on anything outside the supported subset."""
    schema = json.loads(schema_json)
    if schema.get("type") != "record":
        raise ValueError("vendored Avro codec supports record schemas only")
    out: list[tuple[str, str, bool]] = []
    for f in schema["fields"]:
        name, typ = f["name"], f["type"]
        if isinstance(typ, list):
            if len(typ) != 2 or typ[0] != "null" or typ[1] not in _PRIMITIVES:
                raise ValueError(
                    f"field {name!r}: only [\"null\", <primitive>] unions "
                    f"are supported, got {typ!r}"
                )
            out.append((name, typ[1], True))
        elif typ in _PRIMITIVES:
            out.append((name, typ, False))
        else:
            raise ValueError(f"field {name!r}: unsupported type {typ!r}")
    return out


def spark_struct_for(schema_json: str) -> T.StructType:
    """The Spark StructType a decoded record lands in."""
    return T.StructType(
        [
            T.StructField(name, _SPARK_TYPES[typ], nullable=True)
            for name, typ, _ in parse_record_schema(schema_json)
        ]
    )


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(typ: str, v) -> bytes:
    if typ in ("int", "long"):
        return _zigzag_encode(int(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(typ)


def _decode_value(typ: str, buf: bytes, pos: int):
    if typ in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "boolean":
        return buf[pos] != 0, pos + 1
    if typ in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise ValueError(typ)


_AVRO_PROBE_CACHE: dict[str, bool] = {}


def avro_datasource_loaded(spark: SparkSession) -> bool:
    """True when the spark-avro package is usable (native from_avro/
    to_avro). Probed by ANALYZING a tiny to_avro expression, not by
    Class.forName from the py4j entry point — jars added at runtime
    (addJar, --packages, cluster userClassPath) live in Spark's mutable
    user classloader, which a bare system-classloader lookup misses and
    would silently force the slow Python fallback. Cached per
    application (analysis costs a few ms)."""
    key = spark.sparkContext.applicationId
    cached = _AVRO_PROBE_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct(F.lit(1).alias("x")))
        )  # analysis raises AVRO_NOT_LOADED when the package is absent
        ok = True
    except Exception:
        ok = False
    _AVRO_PROBE_CACHE[key] = ok
    return ok


def to_avro_column(
    data: Column,
    schema_json: str,
    *,
    spark: SparkSession | None = None,
    confluent_schema_id: int | None = None,
    force_fallback: bool = False,
) -> Column:
    """Struct column → Avro binary column. Native to_avro when the
    spark-avro package is loaded, else the vendored pandas-UDF codec."""
    header = (
        b"" if confluent_schema_id is None
        else b"\x00" + struct.pack(">I", confluent_schema_id)
    )
    if not force_fallback and spark is not None and avro_datasource_loaded(spark):
        from pyspark.sql.avro.functions import to_avro

        body = to_avro(data, schema_json)
        return F.concat(F.lit(header), body) if header else body

    fields = parse_record_schema(schema_json)
    # Two Spark->pandas conversion hazards, both fixed by reshaping the
    # struct BEFORE it crosses Arrow:
    # 1. int/long columns containing a null coerce to float64 in pandas,
    #    silently destroying |v| >= 2^53 (epoch-micros territory) — so
    #    every int/long field transits as a decimal STRING and is parsed
    #    back exactly in the UDF.
    # 2. a null float and a genuine NaN both land as NaN in a float64
    #    column, but native to_avro encodes NaN as a valid IEEE payload
    #    and only SQL NULL as the Avro null branch — so each float/double
    #    field carries a Spark-computed __mask_<name> isNull companion.
    shaped_fields = []
    float_fields = []
    for name, typ, _ in fields:
        if typ in ("int", "long"):
            shaped_fields.append(
                data.getField(name).cast("string").alias(name)
            )
        else:
            shaped_fields.append(data.getField(name).alias(name))
            if typ in ("float", "double"):
                float_fields.append(
                    data.getField(name).isNull().alias(f"__mask_{name}")
                )
    shaped = F.struct(*shaped_fields, *float_fields)

    @F.pandas_udf("binary")
    def enc(s):  # s: pd.DataFrame (struct columns)
        import pandas as pd

        out = []
        for i in range(len(s)):
            buf = bytearray(header)
            for name, typ, nullable in fields:
                v = s[name].iloc[i]
                if typ in ("float", "double"):
                    # NaN is a VALUE here; only SQL NULL (the mask) is null
                    is_null = bool(s[f"__mask_{name}"].iloc[i])
                elif typ in ("int", "long"):
                    is_null = v is None  # string detour: object dtype
                else:
                    is_null = v is None or (
                        not isinstance(v, (str, bytes)) and pd.isna(v)
                    )
                if nullable:
                    if is_null:
                        buf += _zigzag_encode(0)
                        continue
                    buf += _zigzag_encode(1)
                elif is_null:
                    raise ValueError(f"null in non-nullable field {name!r}")
                if typ in ("int", "long"):
                    v = int(v)  # exact: parsed from the decimal string
                buf += _encode_value(typ, v)
            out.append(bytes(buf))
        return pd.Series(out)

    return enc(shaped)


def from_avro_column(
    data: Column,
    schema_json: str,
    *,
    spark: SparkSession | None = None,
    confluent_schema_id: int | None = None,
    force_fallback: bool = False,
) -> Column:
    """Avro binary column → struct column (inverse of to_avro_column)."""
    skip = 0 if confluent_schema_id is None else 5
    if not force_fallback and spark is not None and avro_datasource_loaded(spark):
        from pyspark.sql.avro.functions import from_avro

        body = F.substr(data, F.lit(skip + 1)) if skip else data
        return from_avro(body, schema_json)

    fields = parse_record_schema(schema_json)
    out_type = spark_struct_for(schema_json)
    expected_id = confluent_schema_id
    # Return-trip hazards mirror the encode side: int/long go back as
    # pandas nullable Int32/Int64 (never float64, exact past 2^53);
    # float/double go back as exact decimal STRINGS ("NaN"/"Infinity"/
    # repr — repr of a double is shortest-exact) rebuilt with a Spark
    # cast, because both plain float64 columns and pandas' masked Float
    # arrays collapse a genuine IEEE NaN into null on the pandas->Arrow
    # trip, while native from_avro keeps NaN as a value.
    _PD_DTYPES = {
        "int": "Int32",
        "long": "Int64",
        "boolean": "boolean",
    }
    inter_type = T.StructType(
        [
            T.StructField(
                name,
                T.StringType()
                if typ in ("float", "double")
                else _SPARK_TYPES[typ],
                nullable=True,
            )
            for name, typ, _ in fields
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
    def dec(s):  # s: pd.Series of bytes -> pd.DataFrame
        import pandas as pd

        cols: dict[str, list] = {name: [] for name, _, _ in fields}
        for payload in s:
            if payload is None:
                # Kafka tombstone / absent value: placeholder row here,
                # masked to a true NULL struct by the when() wrapper —
                # matching native from_avro's null passthrough instead
                # of killing the query on one record
                for name, _, _ in fields:
                    cols[name].append(None)
                continue
            if skip:
                # validate the Confluent wire framing instead of blind
                # positional stripping — absent or foreign framing must
                # fail per-payload, not silently decode garbage
                if len(payload) < 5:
                    raise ValueError(
                        "payload shorter than the 5-byte Confluent header"
                    )
                if payload[0] != 0x00:
                    raise ValueError(
                        f"bad Confluent magic byte 0x{payload[0]:02x}"
                    )
                embedded = struct.unpack(">I", payload[1:5])[0]
                if embedded != expected_id:
                    raise ValueError(
                        f"Confluent schema id {embedded} != expected "
                        f"{expected_id}"
                    )
            pos = skip
            for name, typ, nullable in fields:
                if nullable:
                    idx, pos = _zigzag_decode(payload, pos)
                    if idx == 0:
                        cols[name].append(None)
                        continue
                v, pos = _decode_value(typ, payload, pos)
                if typ in ("float", "double"):
                    v = _float_str(v)
                cols[name].append(v)
        return pd.DataFrame(
            {
                name: pd.array(
                    [pd.NA if v is None else v for v in cols[name]],
                    dtype=_PD_DTYPES[typ],
                )
                if typ in _PD_DTYPES
                else pd.Series(cols[name], dtype="object")
                for name, typ, _ in fields
            }
        )

    inter = dec(data)
    # rebuild the declared numeric types from the exact strings; the same
    # `inter` expression is referenced per field, and ExtractPythonUDFs
    # deduplicates identical UDF expressions into one evaluation node
    rebuilt = F.struct(
        *[
            inter.getField(name).cast(_SPARK_TYPES[typ]).alias(name)
            if typ in ("float", "double")
            else inter.getField(name).alias(name)
            for name, typ, _ in fields
        ]
    )
    return F.when(data.isNull(), F.lit(None).cast(out_type)).otherwise(
        rebuilt
    )
