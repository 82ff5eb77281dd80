"""Temporal/event-stream operators beyond the reference's surface:
as-of join, sessionization, top-k per group.

These are the standard event-analytics building blocks a user of the
reference would reach for next; each is a single-shuffle window pipeline
(shuffle on the entity key — unavoidable and AQE-managed), never a
driver-side loop or a per-row subquery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_payload: dict[str, Column],
    tiebreak_col: str,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right.ts <= left.ts within the key (inclusive).

    Spark has no native as-of join; the scalable form is the union trick:
    tag both sides, sort by (key, ts, side, tiebreak) — right rows sort
    before left rows at equal ts so 'at-or-before' is inclusive — and
    carry the right payload forward with last(..., ignorenulls) over an
    unbounded-preceding frame. ONE shuffle+sort on the key, streaming
    through the sorted partition; a pd.merge_asof via applyInPandas needs
    the same shuffle plus Python serialization, so this is strictly
    better until per-group state exceeds memory.
    """
    payload_names = list(right_payload)
    keep_nulls = [
        F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__keep_{c}")
        for c in left.columns
        if c not in (*key_cols, ts_col, tiebreak_col)
    ]
    # the payloads ride in ONE struct that is non-null exactly on right
    # rows: last(ignorenulls) then selects the latest right ROW, so a
    # genuinely-NULL payload value on the winning row is preserved
    # (merge_asof semantics) instead of falling back to an older row's
    # value, which per-column last(ignorenulls) would do.
    r_tagged = right.select(
        *key_cols,
        ts_col,
        tiebreak_col,
        F.lit(0).alias("__is_left"),
        F.struct(
            *[expr.alias(n) for n, expr in right_payload.items()]
        ).alias("__r"),
        *keep_nulls,
    )
    r_struct_type = dict(r_tagged.dtypes)["__r"]
    l_tagged = left.select(
        *key_cols,
        ts_col,
        tiebreak_col,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        *[
            F.col(c).alias(f"__keep_{c}")
            for c in left.columns
            if c not in (*key_cols, ts_col, tiebreak_col)
        ],
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "__is_left", tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "__r_last", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    for n in payload_names:
        merged = merged.withColumn(n, F.col(f"__r_last.{n}"))
    out = merged.filter(F.col("__is_left") == 1)
    renames = [
        F.col(f"__keep_{c}").alias(c)
        for c in left.columns
        if c not in (*key_cols, ts_col, tiebreak_col)
    ]
    return out.select(
        *key_cols, ts_col, tiebreak_col, *renames, *payload_names
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session indexes: a new session starts when the gap from the
    previous event (per key) exceeds ``gap_seconds``. Classic lag + cumsum
    over one keyed sort; batch analog of session_window in streaming."""
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(F.col(ts_col)).over(w)
    )
    new_sess = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    cum = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new_sess", new_sess).withColumn(
        "session_idx", F.sum("__new_sess").over(cum).cast("bigint")
    ).drop("__new_sess")


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    k: int,
) -> DataFrame:
    """Deterministic top-k rows per group via row_number (callers provide
    a total order). For huge groups prefer the two-level pattern in
    operators.similarity._topk; this is the simple declarative form."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def cdc_apply(
    log: DataFrame,
    key_cols: list[str],
    ord_col: Column,
    tombstone: Column,
) -> DataFrame:
    """Changelog → snapshot materialization with delete semantics: the
    latest record per key wins, and keys whose latest record is a
    TOMBSTONE disappear — exactly a compacted Kafka topic / KTable with
    null-value deletes (the reference's ranges KTable semantics,
    CategorizeWithKTableLookup.java:60-62, extended with the tombstone
    rule the DSL applies to null values), and the apply step of any
    CDC ingest (upsert/delete log → table state).

    One shuffle on the key; the tombstone filter runs AFTER the
    latest-per-key election (a deleted-then-reinserted key correctly
    survives). The election itself IS core.latest_per_key — one upsert
    rule in the codebase, with the delete semantics composed on top.
    A record on which the tombstone predicate is NULL (malformed op
    column) is NOT a delete: only an explicit true tombstone removes
    the key — ~NULL would silently drop it."""
    from kafka_streams_dexcom_spark.operators.core import latest_per_key

    return latest_per_key(log, key_cols, ord_col).filter(
        ~F.coalesce(tombstone, F.lit(False))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed diff of two table snapshots: (key, change) where change ∈
    added | removed | changed — the audit primitive behind incremental
    publishes and time-travel comparisons. One full-outer join on the
    key (both sides hash-partitioned; unchanged keys drop out before
    any further processing)."""
    o = old.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    changed = None
    for c in compare_cols:
        neq = ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
        changed = neq if changed is None else (changed | neq)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def gap_fill(
    events: DataFrame,
    slots: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-series resample + forward fill: for every (key, slot)
    row in ``slots``, carry forward the last observed ``value_col`` at
    or before the slot timestamp — the gap-filling step that turns an
    irregular sensor stream into a regular grid (the reference's EGV
    stream is exactly such a feed; this is the batch twin of a
    stream-side latest-value state store).

    Shape: union(events, slots) → ONE window pass per key ordered by
    (ts, is_slot, value) — the same union+window trick as asof_join
    (operators/temporal.py:16), so no per-slot range join and no
    events×slots blowup; cost is one hash shuffle of events+slots on
    the key. The trailing ``value`` sort key makes duplicate-(key, ts)
    events resolve identically on both engines. Output per slot:
    filled value (null if nothing precedes it), the source event's
    timestamp, and integer staleness minutes (exact µs arithmetic).
    """
    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("k_ts"),
        F.lit(0).alias("k_tag"),
        F.col(value_col).alias("v"),
        F.lit(None).cast("timestamp").alias("slot_ts"),
    )
    sl = slots.select(
        F.col(key_col).alias("k"),
        F.col("slot_ts").alias("k_ts"),
        F.lit(1).alias("k_tag"),
        F.lit(None).cast("double").alias("v"),
        F.col("slot_ts"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("k_ts", "k_tag", "v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        ev.unionByName(sl)
        .withColumn("fv", F.last("v", ignorenulls=True).over(w))
        .withColumn(
            "last_ts",
            F.max(
                F.when(F.col("v").isNotNull(), F.col("k_ts"))
            ).over(w),
        )
        .filter(F.col("slot_ts").isNotNull())
    )
    return filled.select(
        F.col("k").alias(key_col),
        "slot_ts",
        F.col("fv").alias("value"),
        "last_ts",
        F.expr(
            "(unix_micros(slot_ts) - unix_micros(last_ts)) div 60000000"
        ).alias("staleness_min"),
    )


def gap_fill_linear(
    events: DataFrame,
    slots: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Linear-interpolation gap fill: like :func:`gap_fill` but each
    slot blends the nearest observation on each side,
    ``prev + (next - prev) · (slot - prev_ts)/(next_ts - prev_ts)``,
    falling back to forward fill (only prev exists), backward fill
    (only next), or null (neither) — the resampling mode model-feature
    pipelines usually want over a slowly-moving sensor signal.

    Same single union per key as gap_fill, with TWO window passes over
    the one sort order (a preceding frame for prev, a following frame
    for next) — still no per-slot range join. An observation exactly on
    the slot timestamp sorts before the slot row, so it lands on the
    prev side and interpolation degenerates to the exact value (the
    fraction's denominator is never 0 because next is strictly after
    the slot). Both engines evaluate the identical IEEE expression on
    identical inputs; the result is truncated to 6 decimals.
    """
    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("k_ts"),
        F.lit(0).alias("k_tag"),
        F.col(value_col).alias("v"),
        F.lit(None).cast("timestamp").alias("slot_ts"),
    )
    sl = slots.select(
        F.col(key_col).alias("k"),
        F.col("slot_ts").alias("k_ts"),
        F.lit(1).alias("k_tag"),
        F.lit(None).cast("double").alias("v"),
        F.col("slot_ts"),
    )
    order = [F.col("k_ts"), F.col("k_tag"), F.col("v")]
    wp = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ev_ts = F.when(F.col("v").isNotNull(), F.col("k_ts"))
    f = (
        ev.unionByName(sl)
        .withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("pt", F.max(ev_ts).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nt", F.min(ev_ts).over(wn))
        .filter(F.col("slot_ts").isNotNull())
    )
    frac = (
        F.unix_micros(F.col("slot_ts")) - F.unix_micros(F.col("pt"))
    ).cast("double") / (
        F.unix_micros(F.col("nt")) - F.unix_micros(F.col("pt"))
    ).cast(
        "double"
    )
    both = F.col("pv").isNotNull() & F.col("nv").isNotNull()
    exact = F.col("pt") == F.col("slot_ts")
    value = (
        F.when(both & exact, F.col("pv"))
        .when(both, F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    mode = (
        F.when(both & exact, F.lit("exact"))
        .when(both, F.lit("interp"))
        .when(F.col("pv").isNotNull(), F.lit("ffill"))
        .when(F.col("nv").isNotNull(), F.lit("bfill"))
        .otherwise(F.lit("empty"))
    )
    return f.select(
        F.col("k").alias(key_col),
        "slot_ts",
        (F.floor(value * 1000000) / 1000000.0).alias("value"),
        mode.alias("fill_mode"),
    )
