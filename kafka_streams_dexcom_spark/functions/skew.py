"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; salting is the explicit tool for the two cases AQE can't fix:
a skewed *aggregation* (one reducer owns the hot key) and a skewed join
where the hot side must pair with a replicated build side.

Two-phase salted aggregation: groupBy(key, salt) partial → groupBy(key)
final. Works for any algebraic aggregate; the hot key's rows spread over
``n_salts`` reducers in phase 1 and phase 2 touches n_salts rows per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, n_salts: int = 16, deterministic: bool = True
) -> DataFrame:
    """Salt in [0, n_salts) from a DETERMINISTIC hash of (partition id,
    row content) — not monotonically_increasing_id(): a stateful /
    nondeterministic expression feeding a shuffle key means a
    shuffle-fetch failure forces a full rerun of the indeterminate map
    stage, and mixed-attempt fetches (the SPARK-23207 class) can
    double-count or drop rows; it is also rejected on streaming frames.
    Hashing partition id + content re-derives the SAME salt on task
    retry (a re-scanned input partition yields the same rows and the
    same partition id), so the stage stays deterministic over
    deterministic sources, and works on streaming DataFrames. Unhashable
    column types (maps) are excluded from the hash input.

    Spreading: byte-identical hot rows in DIFFERENT partitions get
    different salts (partition id is mixed in); identical rows WITHIN
    one partition share a salt. That is harmless for salted_agg —
    phase 1 has map-side partial aggregation, so each input partition
    contributes at most one partial row per (key, salt) group — and for
    the salted-JOIN path the residual concentration is bounded by ONE
    input partition's rows (~a split, not the whole hot key). If a
    batch-only pipeline really does funnel millions of byte-identical
    rows into single input partitions, pass ``deterministic=False`` to
    get position-derived salts, accepting the indeterminate-stage-retry
    caveat above (never on streaming frames). The final salted_agg
    result is salt-independent either way (phase 2 re-merges)."""
    if not deterministic:
        return df.withColumn(
            "__salt",
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)),
        )
    hashable = [
        c for c, t in df.dtypes if not t.startswith("map<")
    ] or []
    return df.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), *hashable), F.lit(n_salts)
        ),
    )


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name to
    (partial_agg_expr, final_agg_expr-over-partial). Example:

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),  F.sum("n")),
            "s":   (F.sum("v"),         F.sum("s")),
        })
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def replicate_for_salted_join(
    small: DataFrame, n_salts: int = 16
) -> DataFrame:
    """Build side for a salted join: replicate each small-side row once
    per salt so `big.join(replicated, key_cols + ["__salt"])` spreads the
    hot key across n_salts tasks. Build-side size multiplies by n_salts —
    keep it for genuinely small dimensions."""
    return small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
