"""Streaming maintenance of the near-dup cluster map — the daily-ingest
path (operators/graph.py:cc_incremental) as a LIVE Structured Streaming
topology instead of a replayed batch query.

Each micro-batch of new documents:

1. builds the batch's OWN minhash artifacts (hashed shingle sets + LSH
   band table) — cost ∝ batch;
2. generates candidates as batch×batch (within the micro-batch) plus
   batch×corpus against the STORED band index — the corpus is never
   re-shingled (the incremental_minhash_dedup contract, here actually
   incremental because the corpus artifacts persist between batches);
3. verifies candidates with exact Jaccard over the hashed shingle sets;
4. folds the verified edges into the stored labeling with
   cc_incremental (contracted CC over the batch-sized graph, one
   broadcast relabel join — never CC over the corpus);
5. publishes labels + band index + shingle sets ATOMICALLY through the
   optimistic commit log (streaming/commitlog.VersionedTable): all
   three artifacts are one immutable versioned data dir, the batch
   marker rides the commit manifest, and put-if-absent manifest
   creation gives exactly-one-winner semantics when several
   maintainers race the same view — the guarantee the old private
   directory-rename swap could not provide.

Exactly-once effect: foreachBatch is at-least-once, so the manifest
meta records the last applied (batch_id, lineage) and a replayed batch
is a no-op — the same marker discipline as IncrementalCounts, including
the loud failure when a NEW query lineage points at an EXISTING view
(batch ids restart at 0 and would otherwise be silently skipped).

Concurrent writers: each batch folds against the version it read
(base); a losing commit raises CommitConflict and the fold RERUNS
against the winner's output (the serializable rebase contract) rather
than blindly re-publishing stale bytes. tests/test_cluster_map_stream
pins a two-maintainer race ending bit-equal to the sequential fold.

Equivalence contract (pinned by tests/test_cluster_map_stream.py): with
the bucket cap disabled, the final labels after streaming the corpus in
any number of micro-batches are IDENTICAL to one-shot
minhash_lsh_dedup + connected_components over the whole corpus — LSH
banding is deterministic, a cross-batch pair (a earlier, b later) is
found when b's batch probes the corpus index, and cc_incremental is
exact by the contraction argument.

At 100 TB: the stored band index is the big artifact; bucket it by
(band_idx, band_hash) (sources/bucketing.py) so the candidate join
shuffles only the batch side. The commit protocol is already the
table-format shape (put-if-absent manifests), so swapping the local
VersionedTable for Delta/Iceberg is a call-site change. State grows
with the corpus — this maintainer IS the corpus index builder, not a
bounded-state operator.

Reference anchor: generalizes the ES sink's effectively-once publish
contract (ElasticSearchConsumer.java:45-55) from per-document ids to
whole-artifact versions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.dedup import (
    exact_jaccard,
    hashed_shingle_corpus,
    lsh_band_hashes,
    minhash_signature,
)
from kafka_streams_dexcom_spark.operators.graph import cc_incremental
from kafka_streams_dexcom_spark.streaming.commitlog import (
    CommitConflict,
    VersionedTable,
)


class ClusterMapMaintainer:
    """foreachBatch sink maintaining (labels, band index, shingle sets)
    for a stream of new documents. See module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        lineage_id: str | None = None,
        threshold: float = 0.2,
        max_bucket: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_commit_attempts: int = 10,
        writer_id: str | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.table = VersionedTable(path)
        self.lineage_id = lineage_id
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.id_col = id_col
        self.text_col = text_col
        self.max_commit_attempts = max_commit_attempts
        # replay guards are PER WRITER: concurrent maintainers each
        # carry their own foreachBatch counter, so a shared high-water
        # mark would silently skip writer A's batch 0 after writer B
        # committed batch 1. Writers of one view share a lineage but
        # not a batch-id space.
        self.writer_id = writer_id if writer_id is not None else (
            lineage_id or ""
        )

    # -- marker ----------------------------------------------------------
    def _applied(self, version: int) -> dict:
        """writer_id -> last applied batch_id at ``version``."""
        if version < 0:
            return {}
        return self.table.read_manifest(version).get("meta", {}).get(
            "applied", {}
        )

    def _read_marker(self, version: int | None = None) -> tuple[int, str | None]:
        """(this writer's last applied batch_id, view lineage) from the
        manifest meta of ``version`` (default latest); (-1, None) on an
        empty view."""
        v = self.table.latest_version() if version is None else version
        if v < 0:
            return -1, None
        meta = self.table.read_manifest(v).get("meta", {})
        applied = meta.get("applied", {})
        return applied.get(self.writer_id, -1), meta.get("lineage") or None

    # -- stored artifacts ------------------------------------------------
    def _read(self, sub: str, schema: str, version: int) -> DataFrame:
        if version >= 0:
            p = os.path.join(self.table.data_path(version), sub)
            if os.path.exists(p):
                return self.spark.read.parquet(p)
        return self.spark.createDataFrame([], schema)

    def labels(self, version: int | None = None) -> DataFrame:
        v = self.table.latest_version() if version is None else version
        return self._read("labels", "node long, component long", v)

    def _bands(self, version: int) -> DataFrame:
        return self._read(
            "bands",
            f"{self.id_col} long, band_idx int, band_hash long",
            version,
        )

    def _sets(self, version: int) -> DataFrame:
        return self._read(
            "sets", f"{self.id_col} long, sh_hashes array<long>", version
        )

    # -- the sink --------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        for _ in range(self.max_commit_attempts):
            base = self.table.latest_version()
            # False = lost the commit race: rebase against the winner's
            # version and fold again (never re-publish stale bytes)
            if self._fold_and_commit(batch_df, batch_id, base):
                return
        raise CommitConflict(
            f"cluster-map batch {batch_id} gave up after "
            f"{self.max_commit_attempts} conflicting commits"
        )

    def _fold_and_commit(
        self, batch_df: DataFrame, batch_id: int, base: int
    ) -> bool:
        """Fold one micro-batch against version ``base`` and commit as
        base+1. True on success or replay no-op; False on a lost race
        (caller rebases)."""
        last_id, last_lineage = self._read_marker(base)
        if self.lineage_id is not None and base >= 0:
            if last_lineage is None:
                raise RuntimeError(
                    f"cluster-map view at {self.path} carries a commit "
                    "with no lineage; this view type has no adoption "
                    "path — rebuild the view or construct the "
                    "maintainer with lineage_id=None to accept the "
                    "directory-is-bound-to-one-lineage contract yourself"
                )
            if last_lineage != self.lineage_id:
                raise RuntimeError(
                    "cluster-map view at "
                    f"{self.path} belongs to lineage {last_lineage!r}; "
                    f"refusing batches from {self.lineage_id!r} — replay "
                    "guards would silently drop this query's early "
                    "batches"
                )
        if batch_id <= last_id:
            return True  # replayed micro-batch: already folded in
        idc = self.id_col
        # batch artifacts (cost ∝ batch): shingle ONCE (the function is
        # eagerly materialized), derive sets and bands from it; bands
        # feed two joins so they get their own cut.
        hfull = hashed_shingle_corpus(
            batch_df.select(idc, self.text_col), idc, self.text_col
        )
        hn = hfull.select(idc, "sh_hashes")
        bn = (
            lsh_band_hashes(minhash_signature(hfull).select(idc, "sig"))
            .select(idc, "band_idx", "band_hash")
            .localCheckpoint()
        )
        bc = self._bands(base)
        bn_probe, bc_probe = bn, bc
        if self.max_bucket is not None:
            # cap on COMBINED (corpus ∪ batch) bucket occupancy — the
            # one-shot pipeline caps the full-corpus bucket, so capping
            # only the stored side would still let a degenerate bucket
            # inside one batch emit its m²/2 within-batch pairs
            ok = (
                bc.union(bn)
                .groupBy("band_idx", "band_hash")
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") <= self.max_bucket)
                .drop("__c")
            )
            bn_probe = bn.join(ok, ["band_idx", "band_hash"], "left_semi")
            bc_probe = bc.join(ok, ["band_idx", "band_hash"], "left_semi")
        a_side = bn_probe.select(
            F.col(idc).alias("id_a"), "band_idx", "band_hash"
        )
        new_old = a_side.join(
            bc_probe.select(
                F.col(idc).alias("id_b"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        ).select("id_a", "id_b")
        new_new = (
            a_side.join(
                bn_probe.select(
                    F.col(idc).alias("id_b"), "band_idx", "band_hash"
                ),
                ["band_idx", "band_hash"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = new_old.union(new_new).distinct()
        all_sets = self._sets(base).union(hn)
        edges = (
            exact_jaccard(cand, all_sets, idc, set_col="sh_hashes")
            .filter(F.col("jaccard") >= self.threshold)
            .select(
                F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
            )
        )
        new_labels = cc_incremental(edges, self.labels(base)).select(
            "node", "component"
        )
        # atomic publish: ALL artifacts land in one immutable versioned
        # data dir, the marker rides the manifest — labels can never
        # disagree with their index, and two racing maintainers get
        # exactly one winner (the loser rebases in __call__)
        staged = self.table.stage()
        new_labels.write.parquet(os.path.join(staged, "labels"))
        self._bands(base).union(bn).write.parquet(
            os.path.join(staged, "bands")
        )
        all_sets.write.parquet(os.path.join(staged, "sets"))
        applied = dict(self._applied(base))
        applied[self.writer_id] = batch_id
        try:
            self.table.commit(
                staged,
                base,
                meta={"applied": applied, "lineage": self.lineage_id or ""},
            )
        except CommitConflict:
            import shutil

            shutil.rmtree(staged, ignore_errors=True)
            return False
        self.table.vacuum(keep_last=3)
        return True
