"""Runs every registered query against its DuckDB oracle at the test SF —
the same comparison the driver performs at sf0.01 (tests/compare.py)."""

from __future__ import annotations

import pytest

from kafka_streams_dexcom_spark.queries import all_oracles, all_queries
from tests.compare import compare, duckdb_con


def _cases():
    qs, os_ = all_queries(), all_oracles()
    return [(name, qs[name], os_.get(name)) for name in qs]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, name, fn, oracle):
    df = fn(spark, sf_dir)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    con = duckdb_con(sf_dir)
    res = compare(df, con, oracle)
    assert res["values_match"], res
    # driver's hash is serialization-type-sensitive — enforce the same contract
    assert res["types_match"], res["type_mismatches"]
