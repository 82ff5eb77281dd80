"""Data-quality constraint checking (deequ/dbt-test-style): violation
counts for declarative rules over a fact table, the gate every 100 TB
ingest runs before publishing a partition.

Scale shape: all row-local rules (not-null, range, set-membership,
regex) fold into ONE aggregate pass over the scan — adding a rule adds
a conditional-count expression, not a pass. Only two rule classes need
more: key uniqueness (one distinct aggregate on the key columns) and
referential integrity (one broadcast/shuffle anti join per foreign
key). The report is a handful of rows regardless of input size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rowlocal_violations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """(rule, violations) for predicate rules, ONE pass: each rule is a
    condition that is true when the row VIOLATES it."""
    if not rules:  # stack(0) is invalid SQL — empty report instead
        return df.sparkSession.createDataFrame(
            [], "rule string, violations bigint"
        )
    # rule names are arbitrary display strings: backtick-quote the
    # column reference and escape quotes in the literal, so names like
    # "quantity > 0" or "shipper's id set" are valid
    aggs = [
        F.count(F.when(cond, 1)).cast("bigint").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        "'{lit}', `{ident}`".format(
            lit=n.replace("\\", "\\\\").replace("'", "\\'"),
            ident=n.replace("`", "``"),
        )
        for n in rules
    )
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stacked}) AS (rule, violations)"
        )
    )


def duplicate_key_violations(
    df: DataFrame, key_cols: Sequence[str], rule: str
) -> DataFrame:
    """(rule, violations): rows beyond the first per key — the unique-key
    test. One distinct-style aggregate (map-side combined)."""
    dups = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n") > 1, F.col("n") - 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("violations")
        )
    )
    return dups.select(F.lit(rule).alias("rule"), "violations")


def orphan_violations(
    facts: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    rule: str,
) -> DataFrame:
    """(rule, violations): fact rows whose foreign key has no parent —
    referential integrity as a LEFT ANTI join (null-safe, unlike NOT
    IN; broadcasts when the dim key set is small, AQE otherwise)."""
    orphans = facts.select(fk_col).join(
        dim.select(F.col(pk_col).alias(fk_col)).distinct(),
        fk_col,
        "left_anti",
    )
    return orphans.agg(
        F.lit(rule).alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("violations"),
    )
