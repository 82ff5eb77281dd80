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
5. publishes labels + band index + shingle sets ATOMICALLY: all three
   artifacts are written to one staging root and swapped into place
   with a single directory rename pair (streaming.incremental.swap
   discipline), so a crash can never publish a label table that
   disagrees with its band index.

Exactly-once effect: foreachBatch is at-least-once, so the view records
the last applied (batch_id, lineage) and a replayed batch is a no-op —
the same marker discipline as IncrementalCounts, including the loud
failure when a NEW query lineage points at an EXISTING view directory
(batch ids restart at 0 and would otherwise be silently skipped).

Equivalence contract (pinned by tests/test_cluster_map_stream.py): with
the bucket cap disabled, the final labels after streaming the corpus in
any number of micro-batches are IDENTICAL to one-shot
minhash_lsh_dedup + connected_components over the whole corpus — LSH
banding is deterministic, a cross-batch pair (a earlier, b later) is
found when b's batch probes the corpus index, and cc_incremental is
exact by the contraction argument.

At 100 TB: the stored band index is the big artifact; bucket it by
(band_idx, band_hash) (sources/bucketing.py) so the candidate join
shuffles only the batch side, and swap the directory-rename publish for
a transactional table format commit — the optimistic-commit protocol is
implemented locally in streaming/commitlog.VersionedTable (put-if-absent
manifest, exactly-one-winner concurrency pytest) so that upgrade is a
call-site change. State grows with the corpus — this maintainer IS the
corpus index builder, not a bounded-state operator.
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
from kafka_streams_dexcom_spark.streaming.incremental import (
    read_batch_marker,
    recover_directory,
    swap_directory,
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
    ) -> None:
        self.spark = spark
        self.path = path
        self.lineage_id = lineage_id
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.id_col = id_col
        self.text_col = text_col

    # -- marker ----------------------------------------------------------
    def _marker_path(self) -> str:
        return os.path.join(self.path, "_last_batch_id")

    def _read_marker(self) -> tuple[int, str | None]:
        return read_batch_marker(self._marker_path())

    # -- stored artifacts ------------------------------------------------
    def _read(self, sub: str, schema: str) -> DataFrame:
        recover_directory(self.path)
        p = os.path.join(self.path, sub)
        if os.path.exists(p):
            return self.spark.read.parquet(p)
        return self.spark.createDataFrame([], schema)

    def labels(self) -> DataFrame:
        return self._read("labels", "node long, component long")

    def _bands(self) -> DataFrame:
        return self._read(
            "bands", f"{self.id_col} long, band_idx int, band_hash long"
        )

    def _sets(self) -> DataFrame:
        return self._read(
            "sets", f"{self.id_col} long, sh_hashes array<long>"
        )

    # -- the sink --------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        last_id, last_lineage = self._read_marker()
        if self.lineage_id is not None and last_id >= 0:
            if last_lineage is None:
                raise RuntimeError(
                    f"cluster-map view at {self.path} carries a legacy "
                    "marker with no lineage; this view type has no "
                    "adoption path — rebuild the view or construct the "
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
            return  # replayed micro-batch: already folded in
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
        bc = self._bands()
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
        all_sets = self._sets().union(hn)
        edges = (
            exact_jaccard(cand, all_sets, idc, set_col="sh_hashes")
            .filter(F.col("jaccard") >= self.threshold)
            .select(
                F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
            )
        )
        new_labels = cc_incremental(edges, self.labels()).select(
            "node", "component"
        )
        # atomic publish: ALL artifacts + marker land in one staging
        # root, one swap — labels can never disagree with their index
        staging = self.path + ".staging"
        if os.path.exists(staging):
            import shutil

            shutil.rmtree(staging)
        new_labels.write.parquet(os.path.join(staging, "labels"))
        self._bands().union(bn).write.parquet(
            os.path.join(staging, "bands")
        )
        all_sets.write.parquet(os.path.join(staging, "sets"))
        with open(os.path.join(staging, "_last_batch_id"), "w") as f:
            f.write(f"{batch_id}\n{self.lineage_id or ''}")
        swap_directory(staging, self.path)
