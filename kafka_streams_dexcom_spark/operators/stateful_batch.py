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

    # Round-12 (guide §4.5): ONE Python/Arrow transition per input
    # batch, not per user. applyInPandas called the per-user function
    # once per key (~1,400 single-digit-row pandas frames at sf0.1 —
    # pure per-group transition overhead); a partition scan over
    # repartition(user_id) + sortWithinPartitions sees every user's
    # rows contiguous and sorted, applies the identical
    # emission→emission searchsorted recurrence per user run, and
    # carries the partition-boundary user between Arrow batches. Same
    # shuffle (hash by user_id), same per-user order (ts, value — the
    # tie-break that keeps equal-timestamp emissions deterministic),
    # same emitted rows.
    ev = (
        events.select("user_id", "ts_us", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "value")
    )

    def scan(batches):
        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            u = pdf["user_id"].to_numpy()
            ts = pdf["ts_us"].to_numpy()
            starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            ends = np.r_[starts[1:], len(u)]
            idxs = []
            for s, e in zip(starts, ends):
                i = s
                while i < e:
                    idxs.append(i)
                    i = s + int(
                        np.searchsorted(
                            ts[s:e], ts[i] + debounce_us, side="left"
                        )
                    )
            return pdf.iloc[idxs]

        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold the (possibly batch-spanning) last user's rows for
            # the next batch; user_id is ascending within a partition
            cut = int(
                pdf["user_id"].searchsorted(
                    pdf["user_id"].iloc[-1], side="left"
                )
            )
            carry = pdf.iloc[cut:]
            if cut:
                yield emit(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield emit(carry)

    return ev.mapInPandas(scan, ALERT_SCHEMA)
