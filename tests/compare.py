"""Replicates the driver's correctness gate locally: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
from typing import Any

import duckdb

from kafka_streams_dexcom_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _sortable(row: tuple) -> tuple:
    # total order across None/mixed types for deterministic row sort
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    result: dict[str, Any] = {
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
    }
    result["cols_match"] = sorted(s_cols) == sorted(o_cols)
    result["count_match"] = len(s_rows) == len(o_rows)
    if not (result["cols_match"] and result["count_match"]):
        result["values_match"] = False
        return result

    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_sorted = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=_sortable
    )
    o_sorted = sorted(
        (tuple(_norm(r[i]) for i in o_idx) for r in o_rows), key=_sortable
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, o_sorted)) if a != b
    ]
    result["values_match"] = not mismatches
    result["first_mismatches"] = mismatches[:3]
    return result
