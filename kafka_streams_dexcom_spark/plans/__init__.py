"""Plan-inspection helpers: the 'did Catalyst do what we designed for'
audit surface (pushdown, pruning, broadcast, codegen) used by
tests/test_plans.py and the bench plan report."""

from kafka_streams_dexcom_spark.plans.audit import (  # noqa: F401
    explain_str,
    plan_has,
    scan_read_schema,
)
