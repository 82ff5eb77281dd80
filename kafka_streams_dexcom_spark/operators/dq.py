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


# Alarm when an epoch's quarantine rate exceeds FACTOR x the corpus-wide
# rate AND at least MIN rows were quarantined (absolute floor so a
# 1-in-10 epoch on a tiny corpus doesn't page anyone).
QUARANTINE_ALARM_FACTOR = 3
QUARANTINE_ALARM_MIN = 5


def quarantine_rate_alarm(
    df: DataFrame,
    epoch_col: str = "epoch",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Per-epoch quarantine *rate over time* with a burst alarm — the
    corrupt-record twin of value_drift_psi: a quarantine spike means an
    upstream FORMAT break (fix the producer), which per-epoch totals
    alone don't surface once the corpus is large.

    Input is the raw PERMISSIVE parse (one row per input record, the
    corrupt column NULL on valid rows) carrying an epoch column — a
    partition directory, an ingest batch id, a date. Output: one row
    per epoch with row/quarantine counts, the rate in ppm, and
    ``alarm`` = 1 when the epoch's rate exceeds
    ``QUARANTINE_ALARM_FACTOR`` x the corpus-wide rate with at least
    ``QUARANTINE_ALARM_MIN`` quarantined rows. The comparison is exact
    integer cross-multiplication (n_q·g_rows > FACTOR·g_q·n_rows) — no
    float thresholds to replay differently cross-engine.

    Scale: one map-side-combined aggregate over the landing scan
    (epoch-count cardinality output), plus a broadcast 1-row global —
    the bounded-agg shape every DQ query here uses.
    """
    per = df.groupBy(epoch_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(corrupt_col).isNotNull().cast("long")).alias(
            "n_quarantined"
        ),
    )
    return quarantine_alarm_from_counts(per, epoch_col=epoch_col)


def quarantine_alarm_from_counts(
    per: DataFrame, epoch_col: str = "epoch"
) -> DataFrame:
    """The alarm tail of :func:`quarantine_rate_alarm` over
    PRE-AGGREGATED per-epoch counts ``(epoch, n_rows, n_quarantined)``.

    This is the streaming-ledger entry point: a micro-batch pipeline
    that routes corrupt rows per epoch already holds one count pair per
    batch (the quarantine sink's bookkeeping), so re-scanning raw rows
    to re-derive them would be a second pass over the landing. Both
    entry points share this tail, so the alarm rule (exact integer
    cross-multiplication, absolute floor) can't drift between the
    batch query and the streaming monitor."""
    glob = per.agg(
        F.sum("n_rows").alias("g_rows"),
        F.sum("n_quarantined").alias("g_quarantined"),
    )
    alarm = (
        (
            F.col("n_quarantined") * F.col("g_rows")
            > F.lit(QUARANTINE_ALARM_FACTOR)
            * F.col("g_quarantined")
            * F.col("n_rows")
        )
        & (F.col("n_quarantined") >= QUARANTINE_ALARM_MIN)
    ).cast("int")
    return per.crossJoin(F.broadcast(glob)).select(
        epoch_col,
        "n_rows",
        "n_quarantined",
        F.expr("n_quarantined * 1000000 div n_rows").alias("rate_ppm"),
        alarm.alias("alarm"),
    )
