"""Streaming ANN index ingest — the IVF postings maintainer for a
stream of new embeddings, published through the optimistic commit log.

The similarity-search stack (operators/similarity.py, quantize.py)
trains a coarse quantizer once and searches cell postings; at 100 TB
embeddings arrive CONTINUOUSLY (every new document gets embedded), and
the index-side work is exactly one operation: assign each new vector to
its nearest FROZEN centroid and append to that cell's posting list —
never retrain the quantizer per batch (retraining shifts cell
boundaries and would silently invalidate every previously stored code;
re-clustering is an offline rebuild that publishes a NEW index).

Each micro-batch:
1. assigns batch vectors to the frozen centroid set (one broadcast
   cross join + min_by argmin — operators/clustering.assign_to_centroids,
   the identical expression Lloyd training uses per round, so streamed
   assignments are bit-equal to a one-shot assignment by construction
   AND by test);
2. appends (vec_id, cell) postings to the stored table;
3. publishes through streaming/commitlog.VersionedTable — the
   transactional commit the cluster-map maintainer's rename swap only
   approximates: concurrent maintainers get exactly-one-winner
   semantics, readers time-travel to any committed index version, and
   the replay guard rides in the commit manifest's meta (batch_id +
   lineage) instead of a side-car marker file, so index content and
   applied-batch watermark can never disagree.

Local stand-in note: each commit rewrites the postings parquet (the
table is one data dir per version); a real table format appends a data
file per batch and the manifest lists files — same protocol, cheaper
append. vacuum(keep_last=k) bounds retained history either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.clustering import (
    assign_to_centroids,
)
from kafka_streams_dexcom_spark.operators.dedup import with_embedding_norm
from kafka_streams_dexcom_spark.streaming.commitlog import (
    CommitConflict,
    VersionedTable,
)

_POSTINGS_SCHEMA = "vec_id long, cell int"


class IvfPostingsMaintainer:
    """foreachBatch sink maintaining the (vec_id, cell) IVF postings
    table for a stream of new embeddings against a frozen quantizer.

    ``centroids``: the trained (cid, cvec) frame — tiny, broadcast per
    batch. ``lineage_id`` binds the index to one streaming query's
    batch-id sequence (same loud-failure contract as the cluster-map
    maintainer: a NEW query pointed at an EXISTING index would replay
    batch ids from 0 and silently skip every early batch)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: DataFrame,
        lineage_id: str | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        writer_id: str | None = None,
        max_commit_attempts: int = 10,
    ) -> None:
        self.spark = spark
        self.table = VersionedTable(path)
        self.centroids = centroids.select(
            F.col("cid").cast("int").alias("cid"), "cvec"
        ).localCheckpoint()
        self.lineage_id = lineage_id
        self.id_col = id_col
        self.vec_col = vec_col
        # per-WRITER replay watermark (cluster_map_stream discipline):
        # concurrent maintainers carry independent foreachBatch
        # counters, so a shared high-water mark would mask one writer's
        # batch 0 as a replay after the other committed batch 1
        self.writer_id = writer_id if writer_id is not None else (
            lineage_id or ""
        )
        self.max_commit_attempts = max_commit_attempts

    # -- read side -----------------------------------------------------
    def _meta(self, version: int) -> dict:
        if version < 0:
            return {}
        return self.table.read_manifest(version).get("meta", {})

    def _last_meta(self) -> dict:
        meta = self._meta(self.table.latest_version())
        applied = meta.get("applied", {})
        # legacy single-counter manifests carried batch_id directly
        last = applied.get(
            self.writer_id, meta.get("batch_id", -1)
        )
        return {"batch_id": last, "lineage": meta.get("lineage")}

    def postings(self, version: int | None = None) -> DataFrame:
        if self.table.latest_version() < 0 and version is None:
            return self.spark.createDataFrame([], _POSTINGS_SCHEMA)
        return self.table.read(self.spark, version)

    def cell_counts(self) -> DataFrame:
        return self.postings().groupBy("cell").agg(
            F.count(F.lit(1)).alias("n_vectors")
        )

    # -- the sink --------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        meta = self._last_meta()
        last_id, last_lineage = meta.get("batch_id", -1), meta.get("lineage")
        if self.lineage_id is not None and self.table.latest_version() >= 0:
            if last_lineage != self.lineage_id:
                raise RuntimeError(
                    f"IVF postings index at {self.table.root} belongs to "
                    f"lineage {last_lineage!r}; refusing batches from "
                    f"{self.lineage_id!r} — replay guards would silently "
                    "drop this query's early batches"
                )
        if batch_id <= last_id:
            return  # replayed micro-batch: already committed
        base = with_embedding_norm(
            batch_df.select(self.id_col, self.vec_col), self.vec_col
        ).select(F.col(self.id_col).alias("vid"), "vec")
        # the assignment depends only on the FROZEN quantizer, never on
        # the stored postings — compute once, reuse across rebases
        assigned = assign_to_centroids(base, self.centroids).select(
            F.col("vid").alias("vec_id"),
            F.col("cid").cast("int").alias("cell"),
        ).localCheckpoint()
        for _ in range(self.max_commit_attempts):
            # capture the base BEFORE reading: the commit must declare
            # the version this merge derives from, so a concurrent
            # maintainer landing in between surfaces as CommitConflict —
            # passing the at-commit-time latest instead would silently
            # absorb and lose the other writer's batch
            base_version = self.table.latest_version()
            applied = dict(self._meta(base_version).get("applied", {}))
            if applied.get(self.writer_id, -1) >= batch_id:
                return  # the race winner was a replay of THIS batch
            applied[self.writer_id] = batch_id
            merged = self.postings(
                version=None if base_version < 0 else base_version
            ).unionByName(assigned)
            try:
                self.table.write_commit(
                    merged,
                    base_version=base_version,
                    meta={
                        "applied": applied,
                        "lineage": self.lineage_id,
                    },
                )
            except CommitConflict:
                continue  # rebase: re-merge against the winner's output
            self.table.vacuum(keep_last=3)
            return
        raise CommitConflict(
            f"IVF ingest batch {batch_id} gave up after "
            f"{self.max_commit_attempts} conflicting commits"
        )
