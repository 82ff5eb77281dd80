"""JSON field access with the reference's missing-field semantics.

The reference's filter app parses raw JSON strings and maps a missing or
unparseable ``value`` field to 0 before comparing
(reference: kafka-streams-filter-egvs/.../StreamsFilterEgvs.java:43-52).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_int(col: Column | str, path: str) -> Column:
    """Extract an int field from a JSON string column; NULL if absent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path).cast("bigint")


def json_int_or_zero(col: Column | str, path: str) -> Column:
    """Extract an int field; missing/unparseable → 0 (reference semantics,
    StreamsFilterEgvs.java:49-51)."""
    return F.coalesce(json_int(col, path), F.lit(0))
