"""Replicates the driver's correctness gate locally: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
import os
import tempfile
from typing import Any

import duckdb

from kafka_streams_dexcom_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle's RAM so heavy sf1/sf10 replays SPILL instead of
    # racing co-tenant JVMs to a system OOM (boilerplate_rewrite at
    # sf10 died at a 16 KB allocation while two Spark drivers were
    # resident; with a limit DuckDB degrades to disk). 24 GB (r10,
    # down from 32): the r9 "~30 GB non-spillable peak" does not
    # reproduce solo — the sf10 gram-coverage replay passes at 24 GB
    # in ~23 s with spill available (r9's OOM was co-tenant memory
    # pressure, not an unspillable operator). temp_directory is set
    # EXPLICITLY: DuckDB's default is the cwd-relative '.tmp', which
    # silently disables spilling when the harness runs from a
    # read-only working directory.
    # SPARK_GRAFT_ORACLE_MEM overrides for known-heavy solo replays
    # (dedup_best_survivors at sf1 spills past the local disk at 24 GB
    # — its window-heavy survivor election wants RAM, and solo runs
    # have no co-tenant to protect).
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_ORACLE_MEM", "24GB")
        + "'"
    )
    con.execute(
        "SET temp_directory='"
        + os.path.join(tempfile.gettempdir(), "spark_graft_duck_spill")
        + "'"
    )
    # thread cap for lambda-heavy replays: DuckDB's list-lambda
    # intermediates are NOT tracked by memory_limit, and per-thread
    # vector memory on the 8e7-row Lloyd/pair replays reached ~70-95 GB
    # RSS at 32 threads (r12 sf10 gate OOM); halving threads roughly
    # halves the untracked footprint for a modest wall-clock cost
    thr = os.environ.get("SPARK_GRAFT_ORACLE_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
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


# The driver's hash check is serialization-type-sensitive (Arrow-level), so
# value equality alone is not enough: a DuckDB HUGEINT vs Spark BIGINT column
# hashes differently even when every value matches (round-2 lesson:
# corpus_rollup / pagerank_centrality red rows). Map DuckDB DESCRIBE types
# onto Spark simpleString types and demand exact agreement.
_DUCK_SCALARS = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "HUGEINT": "hugeint",  # no Spark equivalent — always a mismatch, by design
    "UBIGINT": "ubigint",
    "UINTEGER": "uint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "REAL": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIME": "time",
    "BLOB": "binary",
}

# DuckDB TIMESTAMP is Arrow timestamp[us] (no tz); Spark's session-tz
# timestamp and timestamp_ntz both serialize as timestamp[us] under the
# driver's UTC runner, so accept either.
_TS_EQUIV = {"timestamp", "timestamp_ntz"}


def duck_to_spark_type(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{duck_to_spark_type(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return "decimal" + t[len("DECIMAL") :].replace(" ", "").lower()
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT(") and t.endswith(")"):
        inner = t[len("STRUCT(") : -1]
        fields = []
        depth = 0
        buf = ""
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                fields.append(buf)
                buf = ""
            else:
                buf += ch
        if buf:
            fields.append(buf)
        parts = []
        for f in fields:
            name, _, ft = f.strip().partition(" ")
            parts.append(f"{name.strip(chr(34))}:{duck_to_spark_type(ft)}")
        return "struct<" + ",".join(parts) + ">"
    return _DUCK_SCALARS.get(t, t.lower())


def _types_equiv(spark_t: str, duck_mapped: str) -> bool:
    if spark_t == duck_mapped:
        return True
    if spark_t in _TS_EQUIV and duck_mapped == "timestamp":
        return True
    return False


def type_mismatches(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> list[tuple]:
    """(col, spark_type, duckdb_type) for every column whose oracle output
    type would not Arrow-serialize identically to the Spark output type."""
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    d_types = {
        r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    out = []
    for col, dt in d_types.items():
        st = s_types.get(col)
        if st is None:
            continue  # column-name mismatch is reported separately
        mapped = duck_to_spark_type(dt)
        if not _types_equiv(st, mapped):
            out.append((col, st, f"{dt} -> {mapped}"))
    return out


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
    tm = type_mismatches(spark_df, con, sql)
    result["types_match"] = not tm
    result["type_mismatches"] = tm
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
