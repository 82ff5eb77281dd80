#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` at the given
scale factor (default sf0.01, the driver's) and prints a PASS/FAIL line per
query. Usage: python check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from tests.compare import compare, duckdb_con  # noqa: E402


def vanilla_spark() -> SparkSession:
    """A deliberately *unconfigured* session, mirroring the external
    driver's: no nanosAsLong, no UTC pin, no excluded optimizer rules.
    Queries must work here — session hardening lives in load_table, not in
    get_spark() (round-1 lesson: 20/47 driver ERRs from exactly this skew).
    """
    b = (
        SparkSession.builder.appName("check_parity_vanilla")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    # sf1+ runs need a bigger single JVM than the 1g local default (a
    # real cluster's executors are tens of GB); unset = the driver's
    # exact vanilla environment
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        b = b.config("spark.driver.memory", mem)
    return b.getOrCreate()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs_all = queries()
    unknown = only - set(qs_all)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    spark = vanilla_spark()
    con = duckdb_con(sf_dir)
    qs, oracles = queries(), oracle_sql()
    failed = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            if name in oracles:
                res = compare(fn(spark, sf_dir), con, oracles[name])
                ok = res["values_match"] and res["types_match"]
                detail = (
                    f"rows={res['spark_rows']}"
                    if ok
                    else {k: v for k, v in res.items() if k != "first_mismatches"}
                )
                if not ok and res.get("first_mismatches"):
                    detail["examples"] = res["first_mismatches"]  # type: ignore[index]
            else:
                n = fn(spark, sf_dir).count()
                # the external driver flags 0-row results; match it
                ok, detail = n > 0, f"rows-only n={n}"
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"EXC {type(exc).__name__}: {exc}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.2f}s  {detail}")
        if not ok:
            failed.append(name)
    print(f"\n{ran - len(failed)}/{ran} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
