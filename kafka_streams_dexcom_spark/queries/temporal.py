"""Temporal/analytical queries over `events` with DuckDB oracles:
as-of join, sessionization, top-k per group, quantiles, pivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.rounding import trunc6
from kafka_streams_dexcom_spark.operators import temporal as tp
from kafka_streams_dexcom_spark.sources.files import load_table

SESSION_GAP_S = 1800
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's latest purchase at-or-before it."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    out = tp.asof_join(
        e.select("user_id", "ts", "event_id", "event_type"),
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        right_payload={"last_purchase_id": F.col("event_id")},
        tiebreak_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "last_purchase_id",
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session stats per (user, session): gap > 30 min starts a session."""
    e = load_table(spark, sf_dir, "events")
    s = tp.sessionize(e, ["user_id"], "ts", "event_id", SESSION_GAP_S)
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 highest-value events per event_type (deterministic order)."""
    e = load_table(spark, sf_dir, "events")
    out = tp.topk_per_group(
        e.select("event_type", "event_id", "value"),
        ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        3,
    )
    return out.select("event_type", "event_id", "value", "rnk")


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of value per event_type."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts pivoted to columns (fixed column set so
    the pivot is a single pass — no distinct-values pre-query)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .select(
            "user_id",
            *[F.col(t).cast("bigint").alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


GAP_THRESHOLD_S = 3600


def q_sensor_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-dropout detection: per-user inter-event gaps longer than an
    hour — the CGM monitoring question behind the reference's domain
    (missed Dexcom readings). lag over (user, ts) is a single shuffle on
    user_id; ties at equal ts order by event_id so the gap chain is
    deterministic cross-engine."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    gaps = e.withColumn("prev_ts_us", F.lag("ts_us").over(w)).withColumn(
        "gap_us", (F.col("ts_us") - F.col("prev_ts_us")).cast("bigint")
    )
    return gaps.filter(
        F.col("gap_us") > GAP_THRESHOLD_S * 1_000_000
    ).select(
        "user_id",
        F.col("prev_ts_us").alias("gap_start_us"),
        F.col("ts_us").alias("gap_end_us"),
        "gap_us",
    )


def q_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per event, count/sum/avg of the same
    user's values in the trailing hour — the event-time analytic a
    row-count frame (`moving_avg`) can't express when events are
    irregularly spaced (exactly the CGM cadence problem).

    The frame bound is on unix_micros (Spark range frames need a numeric
    order key); ties at equal ts are frame *peers* in both engines, so
    no tiebreak column is needed. Float discipline: frame sum on
    DECIMAL, divide as double, truncate (see moving_avg)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc())
        .rangeBetween(-3_600_000_000, 0)
    )
    s = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    c = F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        c.cast("bigint").alias("n_1h"),
        F.round(s.cast("double"), 2).alias("sum_1h"),
        trunc6(s.cast("double") / c.cast("double")).alias("avg_1h"),
    )


def q_stateful_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced high-value alerts per user — per-key sequential state via
    applyInPandas (batch twin of the streaming applyInPandasWithState
    operator; see streaming/stateful.py). The carried-state recurrence is
    not window-expressible, but it IS replayable as a recursive CTE (each
    recursion step = the next emission per user), so it gets a full SQL
    oracle; ties at equal ts break on value in both engines."""
    from kafka_streams_dexcom_spark.operators.stateful_batch import (
        debounced_alerts_batch,
    )

    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return debounced_alerts_batch(e, threshold=200.0, debounce_s=3600)


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase): per user, the
    earliest view, the earliest click at-or-after that view, the earliest
    purchase at-or-after that click; output = users surviving each stage.

    Scale shape: ONE scan (pre-filtered to the three funnel types, so the
    predicate reaches parquet) and ONE exchange on user_id. The three
    stage times are successive whole-partition window minima over that
    single shuffle — a join-free formulation; the naive
    filter-join-filter-join version scans the event log once per stage
    and re-shuffles each slice, which is exactly what cannot happen when
    the log is the 100 TB side. The per-user rollup after the windows
    reuses the same partitioning (no further exchange)."""
    types = ("view", "click", "purchase")
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*types))
        .select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
    )
    w = Window.partitionBy("user_id")
    e = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
    )
    e = e.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts_us") >= F.col("t_view")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_us") >= F.col("t_click")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    per_user = e.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("nv"),
        F.count("t_click").alias("nc"),
        F.count("t_purchase").alias("np"),
    )
    return counts.selectExpr(
        "stack(3, '1_view', nv, '2_click', nc, '3_purchase', np)"
        " AS (step, n_users)"
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; for each (cohort week, weeks-since-cohort offset), how many
    cohort members were active. The standard growth-analytics triangle.

    Scale shape: first-event agg (1 shuffle on user_id), distinct
    (user, week) activity (1 shuffle), a co-partitioned user_id join,
    then a bounded agg (weeks × offsets rows). Week arithmetic is pure
    integer microseconds so Spark and DuckDB agree exactly."""
    wk = 7 * 86_400 * 1_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    # epoch 0 is a Thursday; weeks bucket from the first Monday ≥ 0 like
    # date_trunc('week') would, but plain integer division keeps both
    # engines trivially identical (bucket boundary choice is arbitrary
    # for retention offsets).
    firsts = e.groupBy("user_id").agg(
        (F.floor(F.min("ts_us") / wk) * wk).alias("cohort_week_us")
    )
    active = e.select(
        "user_id", (F.floor(F.col("ts_us") / wk) * wk).alias("week_us")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week_us",
            ((F.col("week_us") - F.col("cohort_week_us")) / wk)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


Z_THRESHOLD = 3.0


def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly screen: events whose value deviates more
    than 3σ from that user's mean — the glucose-spike alert done
    statistically rather than with a fixed threshold (the reference's
    value >= 200 rule, StreamsFilterEgvs.java:28-31, generalized).

    Per-user moments as whole-partition window aggregates over ONE
    user_id exchange (no sort: the window has no ordering) — the
    groupBy-then-join-back formulation pays a second exchange for the
    probe side; the window formulation annotates rows in place (same
    trick as funnel_steps). Sums are decimal-exact (order-independent);
    variance = (Σx² − (Σx)²/n)/n in fixed-order double math, so the σ
    cut is bit-identical cross-engine; users with σ = 0 never flag."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id")
    vd = F.col("value").cast("decimal(18,2)")
    n_d = F.count(F.lit(1)).over(w).cast("double")
    s1_d = F.sum(vd).over(w).cast("double")
    s2_d = F.sum((vd * vd).cast("decimal(38,4)")).over(w).cast("double")
    mean = s1_d / n_d
    sd = F.sqrt((s2_d - s1_d * s1_d / n_d) / n_d)
    z = (F.col("value") - mean) / sd
    return (
        e.select(
            "event_id",
            "user_id",
            "ts_us",
            "value",
            mean.alias("mean"),
            sd.alias("sd"),
            z.alias("z"),
        )
        .filter((F.col("sd") > 0) & (F.abs(F.col("z")) > Z_THRESHOLD))
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "value",
            trunc6(F.col("mean")).alias("user_mean"),
            trunc6(F.col("z")).alias("z_score"),
        )
    )



CDC_CUTOFF = "1999-01-01"


def q_cdc_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog materialization with tombstones (operators/temporal.py:
    cdc_apply): the per-user event log compacts to latest state; users
    whose LATEST event is an 'error' (the tombstone op — an account
    purge in this fixture) disappear from the snapshot."""
    e = load_table(spark, sf_dir, "events")
    out = tp.cdc_apply(
        e,
        ["user_id"],
        F.struct(F.col("ts"), F.col("event_id")),
        F.col("event_type") == "error",
    )
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "value",
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff (operators/temporal.py:snapshot_diff): the
    per-user latest-state table as of CDC_CUTOFF vs the full-range
    state — (user_id, added|removed|changed), the incremental-publish
    audit. 'removed' is impossible in an append-only log and its
    absence is part of the oracle-checked contract."""
    e = load_table(spark, sf_dir, "events")

    def state(df):
        return tp.cdc_apply(
            df,
            ["user_id"],
            F.struct(F.col("ts"), F.col("event_id")),
            F.lit(False),
        ).select("user_id", "event_id", "value")

    old = state(
        e.filter(F.col("ts") < F.lit(CDC_CUTOFF).cast("timestamp_ntz"))
    )
    new = state(e)
    return tp.snapshot_diff(
        old, new, ["user_id"], ["event_id", "value"]
    )



GROUP_SAMPLE_K = 20
MAD_MULT = 5.0


def q_group_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k uniform sample per group WITHOUT replacement: rank events
    per event_type by an md5-derived key and keep the first
    GROUP_SAMPLE_K — the deterministic per-stratum reservoir (every
    group gets exactly k rows, unlike rate-based sampling whose group
    sizes fluctuate). Narrow per-row hash + one per-group top-k window;
    two-level pruning applies at scale. No RNG anywhere — the draw is
    reproducible and exactly oracle-replayable."""
    e = load_table(spark, sf_dir, "events")
    key = F.md5(F.concat_ws(":", F.lit("gsk"), F.col("event_id")))
    return tp.topk_per_group(
        e.withColumn("__key", key),
        ["event_type"],
        [F.col("__key").asc(), F.col("event_id").asc()],
        GROUP_SAMPLE_K,
    ).select(
        "event_type",
        "event_id",
        "user_id",
        "value",
        F.col("rnk").cast("bigint").alias("rnk"),
    )


def q_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier screen: median + MAD instead of mean +
    stddev (value_anomalies), so a user's own outliers cannot mask
    themselves by inflating the spread — the estimator breaks down at
    50% contamination instead of 0%.

    Shape: two exact per-user percentile aggregations (median, then the
    median of absolute deviations — the second necessarily re-joins the
    per-user median back to the rows: one key-partitioned shuffle each,
    co-partitioned so the join is exchange-free after the first). Both
    engines interpolate percentiles identically ((n-1)*q linear rule)
    over exact doubles, so flags replay without rounding tricks."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    med = e.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(med, "user_id").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .filter(
            (F.col("mad") > 0)
            & (F.col("absdev") > F.lit(MAD_MULT) * F.col("mad"))
        )
        .select(
            "event_id",
            "user_id",
            "value",
            trunc6(F.col("med")).alias("med"),
            trunc6(F.col("absdev") / F.col("mad")).alias("mad_units"),
        )
    )


# Reference rule bounds (CategorizeWithSimpleRule.java:45-47 — the
# 75..180 INCLUSIVE in-range band, SURVEY §2.6 quirk #2) and a credited
# interval cap of 10 minutes per reading (2× the Dexcom 5-minute
# cadence: a reading "covers" time until the next one, but a gap longer
# than the cap is sensor dropout, not time at that glucose level).
TIR_LOW = 75.0
TIR_HIGH = 180.0
TIR_CAP_US = 600 * 1_000_000


def q_time_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-range — THE clinical summary metric of the reference's
    CGM domain: per user, the fraction of credited wear time spent
    below / inside / above the reference's categorize band. Duration
    weighting, not reading counting: each reading is credited the time
    until the user's next reading, capped at TIR_CAP_US so dropout
    gaps (sensor_gaps' subject) don't inflate the last value seen; the
    final reading gets the cap. pct is exact integer milli-percent
    (dur·100000 div total), partition-order independent.

    Scale: one shuffle on user_id serves the lead window, the
    category aggregation, and the per-user total (subset rule) — the
    same single-exchange discipline as funnel_steps."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    dur = F.least(
        F.coalesce(
            F.lead("ts_us").over(w) - F.col("ts_us"),
            F.lit(TIR_CAP_US),
        ),
        F.lit(TIR_CAP_US),
    )
    cat = (
        F.when(F.col("value") < TIR_LOW, "low")
        .when(F.col("value") <= TIR_HIGH, "in_range")
        .otherwise("high")
    )
    per = (
        e.select("user_id", cat.alias("category"), dur.alias("dur_us"))
        .groupBy("user_id", "category")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.sum("dur_us").alias("dur_us"),
        )
    )
    tot = Window.partitionBy("user_id")
    return per.withColumn(
        "tot_us", F.sum("dur_us").over(tot)
    ).select(
        "user_id",
        "category",
        "n_readings",
        "dur_us",
        F.expr("dur_us * 100000 div tot_us").alias("pct_milli"),
    )


QUERIES = {
    "time_in_range": q_time_in_range,
    "group_sample_k": q_group_sample_k,
    "robust_anomalies": q_robust_anomalies,
    "cdc_user_state": q_cdc_user_state,
    "snapshot_diff": q_snapshot_diff,
    "value_anomalies": q_value_anomalies,
    "funnel_steps": q_funnel_steps,
    "retention_cohorts": q_retention_cohorts,
    "rolling_1h": q_rolling_1h,
    "sensor_gaps": q_sensor_gaps,
    "stateful_debounce": q_stateful_debounce,
    "asof_join": q_asof_join,
    "sessionize": q_sessionize,
    "topk_per_group": q_topk_per_group,
    "value_quantiles": q_value_quantiles,
    "event_type_pivot": q_event_type_pivot,
}

ORACLES = {
    "time_in_range": f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
            FROM events
        ),
        d AS (
            SELECT user_id, value,
                   least(coalesce(lead(ts_us) OVER (
                       PARTITION BY user_id
                       ORDER BY ts_us ASC, event_id ASC
                   ) - ts_us, {TIR_CAP_US}), {TIR_CAP_US}) AS dur_us
            FROM e
        ),
        c AS (
            SELECT user_id,
                   CASE WHEN value < {TIR_LOW} THEN 'low'
                        WHEN value <= {TIR_HIGH} THEN 'in_range'
                        ELSE 'high' END AS category,
                   dur_us
            FROM d
        ),
        a AS (
            SELECT user_id, category,
                   count(*) AS n_readings,
                   CAST(sum(dur_us) AS BIGINT) AS dur_us
            FROM c GROUP BY user_id, category
        )
        SELECT user_id, category, n_readings, dur_us,
               CAST(dur_us * 100000 // CAST(sum(dur_us) OVER (
                   PARTITION BY user_id) AS BIGINT) AS BIGINT)
                   AS pct_milli
        FROM a
    """,
    "group_sample_k": """
        SELECT event_type, event_id, user_id, value, rnk FROM (
            SELECT event_type, event_id, user_id, value,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY md5('gsk:' || CAST(event_id AS VARCHAR))
                                ASC, event_id ASC
                   ) AS BIGINT) AS rnk
            FROM events
        ) WHERE rnk <= 20
    """,
    "robust_anomalies": """
        WITH med AS (
            SELECT user_id, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY user_id
        ),
        dev AS (
            SELECT e.event_id, e.user_id, e.value, m.med,
                   abs(e.value - m.med) AS absdev
            FROM events e JOIN med m ON e.user_id = m.user_id
        ),
        mad AS (
            SELECT user_id, quantile_cont(absdev, 0.5) AS mad
            FROM dev GROUP BY user_id
        )
        SELECT d.event_id, d.user_id, d.value,
               floor(d.med * 1000000) / 1000000.0 AS med,
               floor(d.absdev / m.mad * 1000000) / 1000000.0
                   AS mad_units
        FROM dev d JOIN mad m ON d.user_id = m.user_id
        WHERE m.mad > 0 AND d.absdev > 5.0 * m.mad
    """,
    "cdc_user_state": """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
               value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
        AND event_type <> 'error'
    """,
    "snapshot_diff": """
        WITH old AS (
            SELECT user_id, event_id, value FROM events
            WHERE ts < TIMESTAMP '1999-01-01'
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) = 1
        ),
        new AS (
            SELECT user_id, event_id, value FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) = 1
        )
        SELECT COALESCE(o.user_id, n.user_id) AS user_id,
               CASE WHEN o.user_id IS NULL THEN 'added'
                    WHEN n.user_id IS NULL THEN 'removed'
                    WHEN o.event_id IS DISTINCT FROM n.event_id
                         OR o.value IS DISTINCT FROM n.value
                         THEN 'changed' END AS change
        FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
        WHERE CASE WHEN o.user_id IS NULL THEN 'added'
                   WHEN n.user_id IS NULL THEN 'removed'
                   WHEN o.event_id IS DISTINCT FROM n.event_id
                        OR o.value IS DISTINCT FROM n.value
                        THEN 'changed' END IS NOT NULL
    """,
    "value_anomalies": """
        WITH m AS (
            SELECT user_id, count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,2))) AS s1,
                   sum(CAST(CAST(value AS DECIMAL(18,2))
                       * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                       AS s2
            FROM events GROUP BY user_id
        ),
        st AS (
            SELECT user_id,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                   sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS sd
            FROM m
        )
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.value,
               floor(st.mean * 1000000) / 1000000.0 AS user_mean,
               floor((e.value - st.mean) / st.sd * 1000000) / 1000000.0
                   AS z_score
        FROM events e JOIN st ON e.user_id = st.user_id
        WHERE st.sd > 0 AND abs((e.value - st.mean) / st.sd) > 3.0
    """,
    "funnel_steps": """
        WITH e AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        ),
        v AS (
            SELECT user_id, min(ts_us) AS t_view
            FROM e WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts_us) AS t_click
            FROM e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts_us >= v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts_us) AS t_purchase
            FROM e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts_us >= c.t_click
            GROUP BY e.user_id
        )
        SELECT '1_view' AS step, count(*) AS n_users FROM v
        UNION ALL
        SELECT '2_click', count(*) FROM c
        UNION ALL
        SELECT '3_purchase', count(*) FROM p
    """,
    "retention_cohorts": """
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS ts_us FROM events
        ),
        firsts AS (
            SELECT user_id,
                   CAST(floor(min(ts_us) / 604800000000.0) AS BIGINT)
                       * 604800000000 AS cohort_week_us
            FROM e GROUP BY user_id
        ),
        active AS (
            SELECT DISTINCT user_id,
                   CAST(floor(ts_us / 604800000000.0) AS BIGINT)
                       * 604800000000 AS week_us
            FROM e
        )
        SELECT cohort_week_us,
               CAST((week_us - cohort_week_us) / 604800000000 AS BIGINT)
                   AS week_offset,
               count(*) AS n_users
        FROM active JOIN firsts USING (user_id)
        GROUP BY cohort_week_us, week_offset
    """,
    "rolling_1h": """
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               CAST(count(*) OVER w AS BIGINT) AS n_1h,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w
                   AS DOUBLE), 2) AS sum_1h,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w
                     AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)
                     * 1000000) / 1000000.0 AS avg_1h
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
        )
    """,
    "sensor_gaps": f"""
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS prev_ts_us
            FROM events
        )
        SELECT user_id, prev_ts_us AS gap_start_us, ts_us AS gap_end_us,
               (ts_us - prev_ts_us) AS gap_us
        FROM e
        WHERE ts_us - prev_ts_us > {GAP_THRESHOLD_S * 1_000_000}
    """,
    # debounce as a recursive CTE: seed = each user's first qualifying
    # event; step = the earliest event >= last emission + debounce. The
    # recursion advances one emission per level — exactly the Python
    # loop's carried state, replayed set-at-a-time.
    "stateful_debounce": """
        WITH RECURSIVE
        f AS (
            SELECT user_id, epoch_us(ts) AS ts_us, value
            FROM events WHERE value >= 200
        ),
        e AS (
            SELECT user_id, ts_us, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts_us, value
                   ) AS rn
            FROM f
        ),
        r AS (
            SELECT user_id, ts_us, value FROM e WHERE rn = 1
            UNION ALL
            SELECT nxt.user_id, nxt.ts_us, nxt.value
            FROM r, LATERAL (
                SELECT e.user_id, e.ts_us, e.value
                FROM e
                WHERE e.user_id = r.user_id
                  AND e.ts_us >= r.ts_us + 3600000000
                ORDER BY e.ts_us, e.value
                LIMIT 1
            ) nxt
        )
        SELECT user_id, ts_us, value FROM r
    """,
    "asof_join": """
        WITH u AS (
            SELECT user_id, ts, event_id, event_type, 1 AS is_left,
                   CAST(NULL AS BIGINT) AS pid
            FROM events
            UNION ALL
            SELECT user_id, ts, event_id, event_type, 0 AS is_left,
                   event_id AS pid
            FROM events WHERE event_type = 'purchase'
        ),
        m AS (
            SELECT *,
                   last_value(pid IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, is_left, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_purchase_id
            FROM u
        )
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
               last_purchase_id
        FROM m WHERE is_left = 1
    """,
    "sessionize": f"""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap
            FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   sum(CASE WHEN gap IS NULL
                            OR gap > {SESSION_GAP_S} * 1000000
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_idx
            FROM g
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               count(*) AS n_events,
               min(epoch_us(ts)) AS session_start_us,
               max(epoch_us(ts)) AS session_end_us
        FROM s
        GROUP BY user_id, session_idx
    """,
    "topk_per_group": """
        SELECT event_type, event_id, value,
               CAST(rnk AS INT) AS rnk
        FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC
                   ) AS rnk
            FROM events
        )
        WHERE rnk <= 3
    """,
    "value_quantiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
    "event_type_pivot": """
        SELECT user_id,
               count(*) FILTER (event_type = 'click') AS n_click,
               count(*) FILTER (event_type = 'error') AS n_error,
               count(*) FILTER (event_type = 'purchase') AS n_purchase,
               count(*) FILTER (event_type = 'signup') AS n_signup,
               count(*) FILTER (event_type = 'view') AS n_view
        FROM events
        GROUP BY user_id
    """,
}


GAPFILL_START = "2024-01-15 00:00:00"
GAPFILL_END = "2024-01-15 23:00:00"
GAPFILL_LOOKBACK = "2024-01-14 00:00:00"


def _gapfill_inputs(spark: SparkSession, sf_dir: str):
    """Shared input construction for both gap-fill flavors: lookback-
    filtered events (the predicate reaches the parquet scan), the full
    user dimension, and the broadcast hourly grid."""
    e = load_table(spark, sf_dir, "events")
    ev = e.filter(
        (F.col("ts") >= F.lit(GAPFILL_LOOKBACK).cast("timestamp"))
        & (F.col("ts") <= F.lit(GAPFILL_END).cast("timestamp"))
    ).select("user_id", "ts", "value")
    users = e.select("user_id").distinct()
    hours = spark.sql(
        f"SELECT explode(sequence(timestamp'{GAPFILL_START}', "
        f"timestamp'{GAPFILL_END}', interval 1 hour)) AS slot_ts"
    )
    return ev, users.crossJoin(F.broadcast(hours))


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample + forward fill: one analysis day on an
    hourly grid, every user × slot row carrying the last observed
    sensor value at or before the slot (24 h lookback) plus integer
    staleness minutes — the gap-filling step that feeds downstream
    models a dense series from the irregular EGV-style stream. The
    lookback filter lands on the parquet scan; the 24-row hour grid is
    broadcast against the user dimension; the fill itself is ONE
    union+window pass per user (operators/temporal.py:gap_fill)."""
    ev, slots = _gapfill_inputs(spark, sf_dir)
    return tp.gap_fill(ev, slots)


QUERIES["gap_fill"] = q_gap_fill

ORACLES["gap_fill"] = f"""
    WITH hours AS (
        SELECT unnest(generate_series(
            TIMESTAMP '{GAPFILL_START}',
            TIMESTAMP '{GAPFILL_END}',
            INTERVAL 1 HOUR)) AS slot_ts
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    ev AS (
        SELECT user_id, ts, value FROM events
        WHERE ts >= TIMESTAMP '{GAPFILL_LOOKBACK}'
          AND ts <= TIMESTAMP '{GAPFILL_END}'
    ),
    allr AS (
        SELECT user_id AS k, ts AS k_ts, 0 AS k_tag, value AS v,
               CAST(NULL AS TIMESTAMP) AS slot_ts
        FROM ev
        UNION ALL
        SELECT u.user_id, h.slot_ts, 1, CAST(NULL AS DOUBLE), h.slot_ts
        FROM users u CROSS JOIN hours h
    ),
    f AS (
        SELECT k, slot_ts,
               last_value(v IGNORE NULLS) OVER w AS fv,
               max(CASE WHEN v IS NOT NULL THEN k_ts END) OVER w
                   AS last_ts
        FROM allr
        WINDOW w AS (PARTITION BY k ORDER BY k_ts, k_tag, v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT k AS user_id, slot_ts, fv AS value, last_ts,
           (epoch_us(slot_ts) - epoch_us(last_ts)) // 60000000
               AS staleness_min
    FROM f WHERE slot_ts IS NOT NULL
"""


def q_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resample on the same hourly analysis grid
    as gap_fill: each slot blends the nearest observation on each side
    (forward/backward fill at the edges) — the dense-feature resampling
    mode. Same single union+window-pass-per-user plan; see
    operators/temporal.py:gap_fill_linear."""
    ev, slots = _gapfill_inputs(spark, sf_dir)
    return tp.gap_fill_linear(ev, slots)


QUERIES["gap_fill_linear"] = q_gap_fill_linear

ORACLES["gap_fill_linear"] = f"""
    WITH hours AS (
        SELECT unnest(generate_series(
            TIMESTAMP '{GAPFILL_START}',
            TIMESTAMP '{GAPFILL_END}',
            INTERVAL 1 HOUR)) AS slot_ts
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    ev AS (
        SELECT user_id, ts, value FROM events
        WHERE ts >= TIMESTAMP '{GAPFILL_LOOKBACK}'
          AND ts <= TIMESTAMP '{GAPFILL_END}'
    ),
    allr AS (
        SELECT user_id AS k, ts AS k_ts, 0 AS k_tag, value AS v,
               CAST(NULL AS TIMESTAMP) AS slot_ts
        FROM ev
        UNION ALL
        SELECT u.user_id, h.slot_ts, 1, CAST(NULL AS DOUBLE), h.slot_ts
        FROM users u CROSS JOIN hours h
    ),
    f AS (
        SELECT k, slot_ts,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               max(CASE WHEN v IS NOT NULL THEN k_ts END) OVER wp AS pt,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               min(CASE WHEN v IS NOT NULL THEN k_ts END) OVER wn AS nt
        FROM allr
        WINDOW wp AS (PARTITION BY k ORDER BY k_ts, k_tag, v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY k ORDER BY k_ts, k_tag, v
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT k AS user_id, slot_ts,
           floor(CASE
               WHEN pv IS NOT NULL AND nv IS NOT NULL
                    AND pt = slot_ts THEN pv
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                    pv + (nv - pv)
                    * (CAST(epoch_us(slot_ts) - epoch_us(pt) AS DOUBLE)
                       / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
               WHEN pv IS NOT NULL THEN pv
               ELSE nv
           END * 1000000) / 1000000.0 AS value,
           CASE
               WHEN pv IS NOT NULL AND nv IS NOT NULL
                    AND pt = slot_ts THEN 'exact'
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
               WHEN pv IS NOT NULL THEN 'ffill'
               WHEN nv IS NOT NULL THEN 'bfill'
               ELSE 'empty'
           END AS fill_mode
    FROM f WHERE slot_ts IS NOT NULL
"""


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from the event
    changelog — the warehouse shape downstream of CDC: per user,
    consecutive events with the SAME event_type collapse into one
    validity interval (gaps-and-islands run-length encoding), each
    interval carrying [valid_from, valid_to) in epoch micros, its event
    count, and the is_current flag (open interval). cdc_user_state is
    the LATEST-state snapshot; this is the full history a temporal
    join or audit reads.

    Shape: one hash partition on user_id serves both window passes
    (change detection + next-interval lookup, same sort order); the
    interval aggregation is a map-side-combinable hash agg on
    (user_id, run). No join, no second sort. Determinism: ordering ties
    break on event_id; all outputs are exact integers/strings."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    runs = e.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "run",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = runs.groupBy("user_id", "run").agg(
        F.first("event_type").alias("event_type"),
        F.min("ts_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # order by run, not valid_from_us: two runs can START on the same
    # microsecond (same-ts events of different types, tie-broken by
    # event_id in the first pass), and run is strictly increasing in
    # event order per user — a valid_from_us order would make lead()
    # nondeterministic on that tie
    w2 = Window.partitionBy("user_id").orderBy(F.col("run").asc())
    return iv.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        "n_events",
    ).withColumn(
        "is_current",
        F.col("valid_to_us").isNull().cast("int"),
    )


QUERIES["scd2_user_state"] = q_scd2_user_state
ORACLES["scd2_user_state"] = """
    WITH o AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts) ASC, event_id ASC)
    ),
    r AS (
        SELECT user_id, event_type, ts_us,
               SUM(chg) OVER (PARTITION BY user_id
                              ORDER BY ts_us ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS run
        FROM o
    ),
    iv AS (
        SELECT user_id, run, min(event_type) AS event_type,
               min(ts_us) AS valid_from_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM r GROUP BY user_id, run
    )
    SELECT user_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY run ASC)
               AS valid_to_us,
           n_events,
           CAST(lead(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY run ASC)
                IS NULL AS INT) AS is_current
    FROM iv
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, n, p) with p the row-normalized
    transition probability — the user-journey model behind funnel
    mining and next-event prediction. One user-partitioned window pass
    builds the consecutive pairs; counts aggregate to at most
    |event_type|^2 rows; p is a double ratio of exact bigints
    (deterministic); row totals come from a window over the tiny
    aggregate, never a self-join."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    pairs = (
        e.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(tot).cast("double")
        ).alias("p"),
    )


QUERIES["event_transitions"] = q_event_transitions
ORACLES["event_transitions"] = """
    WITH s AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts) ASC, event_id ASC) AS to_type
        FROM events
    ),
    c AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM s WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
               AS p
    FROM c
"""


PSI_BINS = 10


def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week Population Stability Index of the event value
    distribution — the drift alarm a 100 TB feature pipeline runs per
    ingest window (PSI > 0.25 conventionally means the upstream
    distribution shifted enough to retrain). Values bin into PSI_BINS
    equi-width buckets over the GLOBAL extent (fixed bins — per-week
    extents would hide exactly the shift being measured; same broadcast
    two-pass shape as value_histogram, same degenerate-extent guard),
    Laplace-smoothed so empty buckets stay finite, and each bucket's
    (p-q)·ln(p/q) contribution is floored to integer nano-units before
    the per-week sum — partition-order independent, exactly replayed by
    the oracle.

    Scale: one scan for the extent, one narrow binning pass, then
    everything is (weeks × PSI_BINS)-sized: the grid cross join,
    the week-over-week self-join, and the final sum are all bounded by
    the calendar, not the data."""
    e = load_table(spark, sf_dir, "events").select("ts", "value")
    ext = e.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / F.lit(float(PSI_BINS))
    binned = e.join(F.broadcast(ext), how="cross").select(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / width),
                F.lit(PSI_BINS - 1),
            )
        )
        .cast("int")
        .alias("bin"),
    )
    counts = binned.groupBy("week", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = counts.select("week").distinct().crossJoin(
        F.broadcast(
            spark.range(PSI_BINS).select(F.col("id").cast("int").alias("bin"))
        )
    )
    full = grid.join(counts, ["week", "bin"], "left").select(
        "week", "bin", F.coalesce("n", F.lit(0)).alias("n")
    )
    totals = full.groupBy("week").agg(F.sum("n").alias("nw"))
    cur = full.join(totals, "week")
    prev = cur.select(
        F.col("week").alias("pweek"),
        F.col("bin").alias("pbin"),
        F.col("n").alias("pn"),
        F.col("nw").alias("pnw"),
    )
    j = cur.join(
        prev,
        (F.col("bin") == F.col("pbin"))
        & (
            F.col("week")
            == F.col("pweek") + F.expr("INTERVAL 7 DAYS")
        ),
    )
    p = (F.col("n") + F.lit(1)).cast("double") / (
        F.col("nw") + F.lit(PSI_BINS)
    ).cast("double")
    q = (F.col("pn") + F.lit(1)).cast("double") / (
        F.col("pnw") + F.lit(PSI_BINS)
    ).cast("double")
    units = F.floor((p - q) * F.log(p / q) * F.lit(1e9)).cast("bigint")
    return (
        j.select("week", F.col("nw").alias("n_events"), units.alias("u"))
        .groupBy("week")
        .agg(
            F.first("n_events").alias("n_events"),
            F.sum("u").alias("psi_units"),
        )
        .select(
            "week",
            "n_events",
            "psi_units",
            (F.col("psi_units").cast("double") / F.lit(1e9)).alias("psi"),
        )
    )


QUERIES["value_drift_psi"] = q_value_drift_psi
ORACLES["value_drift_psi"] = f"""
    WITH ext AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    binned AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               CASE WHEN mx = mn THEN 0 ELSE CAST(LEAST(
                   floor((value - mn) / ((mx - mn) / {PSI_BINS}.0)),
                   {PSI_BINS - 1}) AS INT) END AS bin
        FROM events CROSS JOIN ext
    ),
    counts AS (
        SELECT week, bin, CAST(COUNT(*) AS BIGINT) AS n
        FROM binned GROUP BY week, bin
    ),
    grid AS (
        SELECT w.week, CAST(b.range AS INT) AS bin
        FROM (SELECT DISTINCT week FROM counts) w
        CROSS JOIN range({PSI_BINS}) b
    ),
    full_g AS (
        SELECT g.week, g.bin, coalesce(c.n, 0) AS n
        FROM grid g LEFT JOIN counts c USING (week, bin)
    ),
    tot AS (
        SELECT week, CAST(sum(n) AS BIGINT) AS nw
        FROM full_g GROUP BY week
    ),
    cur AS (SELECT f.week, f.bin, f.n, t.nw FROM full_g f JOIN tot t USING (week)),
    j AS (
        SELECT c.week, c.nw,
               CAST(floor(
                   (CAST(c.n + 1 AS DOUBLE) / CAST(c.nw + {PSI_BINS} AS DOUBLE)
                    - CAST(p.n + 1 AS DOUBLE) / CAST(p.nw + {PSI_BINS} AS DOUBLE))
                   * ln((CAST(c.n + 1 AS DOUBLE) / CAST(c.nw + {PSI_BINS} AS DOUBLE))
                        / (CAST(p.n + 1 AS DOUBLE) / CAST(p.nw + {PSI_BINS} AS DOUBLE)))
                   * 1e9) AS BIGINT) AS u
        FROM cur c JOIN cur p
          ON c.bin = p.bin AND c.week = p.week + INTERVAL 7 DAY
    )
    SELECT week, CAST(min(nw) AS BIGINT) AS n_events,
           CAST(sum(u) AS BIGINT) AS psi_units,
           CAST(sum(u) AS DOUBLE) / 1e9 AS psi
    FROM j GROUP BY week
"""


# Consensus AGP glucose bands (Battelino et al. 2019, the international
# consensus on CGM reporting): <54 very low, 54-<70 low, 70-180 target,
# >180-250 high, >250 very high (mg/dL). Distinct from the reference's
# own 75-180 categorize band (TIR_LOW/TIR_HIGH), which time_in_range
# keeps — the AGP report is the PUBLISHED standard a clinic prints.
AGP_VERY_LOW = 54.0
AGP_LOW = 70.0
AGP_HIGH = 180.0
AGP_VERY_HIGH = 250.0


def q_agp_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ambulatory Glucose Profile summary per user — the standard
    clinical CGM report (Battelino 2019 consensus + Bergenstal 2018's
    GMI): reading count, mean, GMI = 3.31 + 0.02392·mean, coefficient
    of variation (sample sd / mean, the consensus stability metric with
    its ≤36% target), and the five consensus band percentages.

    Determinism: the ≤2-decimal values sum exactly as DECIMAL (the
    numeric_corr moment discipline); GMI / CV come out of the moment
    row in fixed-order double math (+, ·, /, sqrt are all IEEE-exact)
    and truncate to 6 decimals; band percentages are exact integer
    milli-percent (cnt·100000 div n). Single-reading users have no
    sample sd → cv_pct NULL.

    Scale: one map-side-combined aggregation over the events scan,
    |users| output rows — the bounded-agg shape, no window, no join."""
    from kafka_streams_dexcom_spark.functions.rounding import trunc6

    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    band = [
        ("n_very_low", F.col("value") < AGP_VERY_LOW),
        (
            "n_low",
            (F.col("value") >= AGP_VERY_LOW) & (F.col("value") < AGP_LOW),
        ),
        (
            "n_in_range",
            (F.col("value") >= AGP_LOW) & (F.col("value") <= AGP_HIGH),
        ),
        (
            "n_high",
            (F.col("value") > AGP_HIGH) & (F.col("value") <= AGP_VERY_HIGH),
        ),
        ("n_very_high", F.col("value") > AGP_VERY_HIGH),
    ]
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s"),
        F.sum((dec * dec).cast("decimal(38,4)")).alias("ss"),
        *[F.sum(cond.cast("long")).alias(name) for name, cond in band],
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    mean = s_d / n_d
    var = (n_d * ss_d - s_d * s_d) / (n_d * (n_d - F.lit(1.0)))
    return m.select(
        "user_id",
        F.col("n").alias("n_readings"),
        trunc6(mean).alias("mean_value"),
        trunc6(F.lit(3.31) + F.lit(0.02392) * mean).alias("gmi"),
        F.when(
            F.col("n") > 1,
            trunc6(F.sqrt(var) / mean * F.lit(100.0)),
        ).alias("cv_pct"),
        *[
            F.expr(f"{name} * 100000 div n").alias(
                "pct_" + name[2:] + "_milli"
            )
            for name, _ in band
        ],
    )


QUERIES["agp_profile"] = q_agp_profile
ORACLES["agp_profile"] = f"""
    WITH m AS (
        SELECT user_id,
               count(*) AS n,
               sum(CAST(value AS DECIMAL(18,2))) AS s,
               sum(CAST(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))
                        AS DECIMAL(38,4))) AS ss,
               sum(CASE WHEN value < {AGP_VERY_LOW} THEN 1 ELSE 0 END)
                   AS n_very_low,
               sum(CASE WHEN value >= {AGP_VERY_LOW}
                         AND value < {AGP_LOW} THEN 1 ELSE 0 END) AS n_low,
               sum(CASE WHEN value >= {AGP_LOW}
                         AND value <= {AGP_HIGH} THEN 1 ELSE 0 END)
                   AS n_in_range,
               sum(CASE WHEN value > {AGP_HIGH}
                         AND value <= {AGP_VERY_HIGH} THEN 1 ELSE 0 END)
                   AS n_high,
               sum(CASE WHEN value > {AGP_VERY_HIGH} THEN 1 ELSE 0 END)
                   AS n_very_high
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           n AS n_readings,
           floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
               / 1000000.0 AS mean_value,
           floor((3.31 + 0.02392 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                 * 1000000) / 1000000.0 AS gmi,
           CASE WHEN n > 1 THEN
               floor(sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                     / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 100.0
                     * 1000000) / 1000000.0
           END AS cv_pct,
           CAST(n_very_low * 100000 // n AS BIGINT) AS pct_very_low_milli,
           CAST(n_low * 100000 // n AS BIGINT) AS pct_low_milli,
           CAST(n_in_range * 100000 // n AS BIGINT) AS pct_in_range_milli,
           CAST(n_high * 100000 // n AS BIGINT) AS pct_high_milli,
           CAST(n_very_high * 100000 // n AS BIGINT) AS pct_very_high_milli
    FROM m
"""
