"""Batch counterpart of the stateful streaming operators: per-key
sequential logic via applyInPandas (grouped-map, Arrow-batched).

This is the §2.7 UDF surface for logic that is genuinely sequential per
key (carried state between rows) — inexpressible as window functions
without recursion. The group is the parallelism unit: each user's history
is processed in one task, users fan out across the cluster. At 100 TB,
per-group history must fit in a task (bound it with time-bucketed keys
when it can't)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ALERT_SCHEMA = "user_id bigint, ts_us bigint, value double"


def debounced_alerts_batch(
    events: DataFrame,
    threshold: float = 200.0,
    debounce_s: int = 600,
) -> DataFrame:
    """Batch replay of streaming.stateful.debounced_alerts: at most one
    alert per user per debounce window, computed over full history."""
    debounce_us = debounce_s * 1_000_000
    # state only advances on rows that fire (value >= threshold), so
    # below-threshold rows can be dropped BEFORE the shuffle and the
    # Python loop — at 1-2% alert rate that is a 50x shuffle reduction.
    events = events.filter(events.value >= threshold)

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        # (ts, value) order: equal-timestamp rows would otherwise emit
        # whichever arrived first off the shuffle — nondeterministic and
        # un-replayable by the SQL oracle
        pdf = pdf.sort_values(["ts_us", "value"])
        ts = pdf["ts_us"].to_numpy()
        # the carried-state recurrence only *lands* on emission rows, so
        # jump emission→emission with searchsorted (first ts at-or-after
        # last + debounce) instead of visiting every row in Python:
        # O(emissions · log n) per user, not O(n) interpreter steps
        idxs = []
        i, n = 0, len(ts)
        while i < n:
            idxs.append(i)
            i = int(np.searchsorted(ts, ts[i] + debounce_us, side="left"))
        return pdf.iloc[idxs][["user_id", "ts_us", "value"]]

    return events.select("user_id", "ts_us", "value").groupBy(
        "user_id"
    ).applyInPandas(per_user, ALERT_SCHEMA)
