"""Streaming canonical-URL first-seen index — crawl stage 1 as a
maintained view, published through the optimistic commit log (the
batch/stream-dual discipline of bloom_ingest / line_census).

The batch twin is dedup_url (min-doc_id survivor per canonical
address). An arriving-shard crawl cannot wait for the corpus to close,
so the streamed contract is FIRST-SEEN: the first epoch that presents
a canonical URL registers its holder (min doc_id within that epoch),
and every later presentation of the same address is a duplicate. When
shards arrive in doc_id order — the replay-stable layout the epoch
pytest feeds — first-seen IS min-id, and the final index row-equals
the batch dedup_url survivor table (pinned in
tests/test_curation_pipeline.py).

State is EXACT: one (url_hash, doc_id) row per distinct canonical
address, keyed by the shared 60-bit fingerprint (the shingle-hash
discipline — collision expectation ~n^2/2^61). URL membership is
idempotent set-state, so replays and concurrent writers converge: an
epoch's append only ever adds addresses no prior version held, and a
replayed epoch re-emits its screen verdicts against the recorded
pre-batch version without touching state (the bloom_ingest screen_base
contract). At crawl scale the exact index is |distinct URLs|-bounded —
the two-tier answer is the same as the line census's: front it with
the width-bounded BloomFilterMaintainer and let only probable-hits
probe this table.

Per micro-batch:
1. canonicalize scan-side (the caller passes rows already carrying
   ``url``; the hash is computed here) and elect the in-batch holder
   (min doc_id per address);
2. screen: (doc_id, url_dup int, dup_kind) — ``prior`` when the
   address is in the stored index, ``batch`` when a smaller doc_id in
   THIS batch holds it; handed to ``screened`` before the commit;
3. append the genuinely-new (url_hash, doc_id) rows; O(batch) commit
   with the per-writer applied watermark.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.dedup import HASH60_TPL
from kafka_streams_dexcom_spark.streaming.commitlog import (
    CommitConflict,
    VersionedTable,
)

_IDX_SCHEMA = "url_hash bigint, doc_id bigint"


class UrlFirstSeenMaintainer:
    """foreachBatch sink maintaining the canonical-URL first-seen
    index and screening each batch against it.

    ``screened(df, batch_id)`` receives (doc_id, url_dup int,
    dup_kind string) for every batch row BEFORE the batch's new
    addresses commit; ``url_col`` names the already-canonical URL
    column on the batch frame."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        url_col: str = "url",
        screened=None,
        lineage_id: str | None = None,
        writer_id: str | None = None,
        max_commit_attempts: int = 10,
    ) -> None:
        self.spark = spark
        self.table = VersionedTable(path)
        self.id_col = id_col
        self.url_col = url_col
        self.screened = screened
        self.lineage_id = lineage_id
        self.writer_id = writer_id if writer_id is not None else (
            lineage_id or ""
        )
        self.max_commit_attempts = max_commit_attempts
        self.timings: list[dict] = []

    # -- read side -----------------------------------------------------
    def _meta(self, version: int) -> dict:
        if version < 0:
            return {}
        return self.table.read_manifest(version).get("meta", {})

    def _applied(self, version: int) -> dict:
        return dict(self._meta(version).get("applied", {}))

    def index(self, version: int | None = None) -> DataFrame:
        """The (url_hash, doc_id) first-seen relation at ``version``
        (latest default). Appends are disjoint on url_hash by
        construction, so the relation is a function."""
        empty = self.spark.createDataFrame([], _IDX_SCHEMA)
        if self.table.latest_version() < 0 and version is None:
            return empty
        df = self.table.read(self.spark, version)
        return empty if df is None else df

    # -- the sink --------------------------------------------------------
    def _hashed(self, batch_df: DataFrame) -> DataFrame:
        h = HASH60_TPL.format(x=self.url_col)
        return batch_df.select(
            F.col(self.id_col), F.expr(h).alias("url_hash")
        )

    def _screen(
        self, hashed: DataFrame, version: int
    ) -> DataFrame:
        from pyspark.sql import Window

        # -1 means EMPTY even when later state exists (index(None)
        # reads LATEST): a replayed batch 0 screens against the
        # pre-ingest index, not its own committed addresses
        base = (
            self.index(version)
            if version >= 0
            else self.spark.createDataFrame([], _IDX_SCHEMA)
        )
        stored = base.select("url_hash", F.lit(1).alias("__prior"))
        holder = F.min(self.id_col).over(
            Window.partitionBy("url_hash")
        )
        return (
            hashed.join(F.broadcast(stored), "url_hash", "left")
            .select(
                self.id_col,
                "url_hash",
                F.col("__prior").isNotNull().alias("seen_prior"),
                (F.col(self.id_col) > holder).alias("dup_in_batch"),
            )
            .select(
                self.id_col,
                (F.col("seen_prior") | F.col("dup_in_batch"))
                .cast("int")
                .alias("url_dup"),
                F.when(F.col("seen_prior"), F.lit("prior"))
                .when(F.col("dup_in_batch"), F.lit("batch"))
                .otherwise(F.lit("")).alias("dup_kind"),
            )
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        latest = self.table.latest_version()
        if self.lineage_id is not None and latest >= 0:
            stored = self._meta(latest).get("lineage")
            if stored != self.lineage_id:
                raise RuntimeError(
                    f"url index at {self.table.root} belongs to "
                    f"lineage {stored!r}; refusing batches from "
                    f"{self.lineage_id!r}"
                )
        applied_now = self._applied(latest)
        if batch_id <= applied_now.get(self.writer_id, -1):
            # replayed epoch: the index already holds these addresses;
            # re-emit the screen against the recorded pre-batch version
            # (at-least-once delivery, bit-identical verdicts)
            if self.screened is not None and batch_id == applied_now.get(
                self.writer_id, -1
            ):
                base = self._meta(latest).get("screen_base", {}).get(
                    self.writer_id, -1
                )
                self.screened(
                    self._screen(self._hashed(batch_df), base), batch_id
                )
            return
        t0 = time.time()
        hashed = self._hashed(batch_df).localCheckpoint()
        if self.screened is not None:
            self.screened(self._screen(hashed, latest), batch_id)
        # the batch's first-seen holders, minus addresses any stored
        # version already holds
        new_rows = (
            hashed.groupBy("url_hash")
            .agg(F.min(self.id_col).alias(self.id_col))
            .join(
                F.broadcast(
                    self.index(latest if latest >= 0 else None).select(
                        "url_hash"
                    )
                ),
                "url_hash",
                "left_anti",
            )
            .select("url_hash", F.col(self.id_col).alias("doc_id"))
        )
        staged = self.table.stage()
        new_rows.write.mode("overwrite").parquet(staged)
        stage_sec = time.time() - t0
        t0 = time.time()
        for _ in range(self.max_commit_attempts):
            base_version = self.table.latest_version()
            applied = self._applied(base_version)
            if applied.get(self.writer_id, -1) >= batch_id:
                shutil.rmtree(staged, ignore_errors=True)
                return
            applied[self.writer_id] = batch_id
            base_meta = self._meta(base_version)
            screen_base = dict(base_meta.get("screen_base", {}))
            screen_base[self.writer_id] = latest
            if base_version != latest:
                # a concurrent writer advanced the index: re-subtract
                # against the new base so racing epochs that share an
                # address converge to one holder (rebase-refold, the
                # commit-log discipline)
                shutil.rmtree(staged, ignore_errors=True)
                new_rows = (
                    hashed.groupBy("url_hash")
                    .agg(F.min(self.id_col).alias(self.id_col))
                    .join(
                        F.broadcast(
                            self.index(base_version).select("url_hash")
                        ),
                        "url_hash",
                        "left_anti",
                    )
                    .select(
                        "url_hash", F.col(self.id_col).alias("doc_id")
                    )
                )
                staged = self.table.stage()
                new_rows.write.mode("overwrite").parquet(staged)
                latest = base_version
            try:
                version = self.table.commit_append(
                    staged,
                    base_version=base_version,
                    meta={
                        "applied": applied,
                        "screen_base": screen_base,
                        "lineage": self.lineage_id,
                    },
                )
            except CommitConflict:
                continue
            self.timings.append(
                {
                    "batch_id": batch_id,
                    "version": version,
                    "stage_sec": round(stage_sec, 4),
                    "commit_sec": round(time.time() - t0, 4),
                }
            )
            return
        raise RuntimeError(
            f"url index commit for batch {batch_id} lost "
            f"{self.max_commit_attempts} races"
        )
