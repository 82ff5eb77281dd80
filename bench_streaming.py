#!/usr/bin/env python
"""Micro-batch throughput bench for the reference's streaming topologies
(P3 filter, P4 fan-out, P5 KTable-lookup join) under Structured
Streaming. Input: the events table at $SPARK_GRAFT_SF_DIR rendered into
the reference's egv stream shapes, delivered as NUM_CHUNKS parquet files
with maxFilesPerTrigger=1 (one micro-batch per file). Outputs are
counted per batch (not collected) so the measurement is the engine's
transform throughput, not driver serialization.

Prints ONE JSON line:
{"metric": "streaming_rows_per_sec", "topologies": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_dexcom_spark.queries.core import ranges_df  # noqa: E402
from kafka_streams_dexcom_spark.session import get_spark  # noqa: E402
from kafka_streams_dexcom_spark.sources.files import load_table  # noqa: E402
from kafka_streams_dexcom_spark.streaming import jobs  # noqa: E402
from kafka_streams_dexcom_spark.streaming.sinks import fan_out  # noqa: E402

NUM_CHUNKS = 10


def _write_chunks(df: DataFrame, path: str, chunks: int) -> int:
    """Materialize df as `chunks` equal files (one micro-batch each).

    Round-robin repartition(chunks), NOT repartition(chunks, key):
    hash-partitioning `chunks` distinct key values collides (murmur3 on
    0..9 mod 10 hits only ~7 partitions — measured), which would write
    fewer, skewed files and distort the per-micro-batch throughput."""
    (
        df.repartition(chunks)
        .write.mode("overwrite")
        .parquet(path)
    )
    # count AFTER the write, from parquet footer metadata — a pre-write
    # df.count() would evaluate the whole transform twice
    n = df.sparkSession.read.parquet(path).count()
    return n


def _stream(spark: SparkSession, in_dir: str, schema):
    """One definition of the micro-batch source (schema +
    maxFilesPerTrigger=1 + parquet) shared by all three topologies —
    an option change must not skew the P3/P4/P5 comparison."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _run_counted(
    spark: SparkSession,
    in_dir: str,
    schema,
    transform,
    ckpt: str,
) -> int:
    """Stream in_dir through transform, counting output rows per batch."""
    stream = _stream(spark, in_dir, schema)
    out_rows = [0]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out_rows[0] += batch_df.count()

    q = (
        transform(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_rows[0]


def main() -> None:
    try:  # pre-JVM load sample: pure co-tenant signal (round 13)
        with open("/proc/loadavg") as f:
            load1_start = float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        load1_start = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_streaming", master=f"local[{cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="bench_streaming_")
    results: dict[str, float] = {}
    try:
        # P3/P4 shape: (key, raw JSON value) — the egv topic wire format
        json_in = f"{work}/json_in"
        n_json = _write_chunks(
            e.select(
                F.col("user_id").cast("string").alias("key"),
                # reference egvs are integral mg/dL values; the JSON
                # filter casts with ANSI semantics, so render ints
                F.to_json(
                    F.struct(F.col("value").cast("int").alias("value"))
                ).alias("value"),
            ),
            json_in,
            NUM_CHUNKS,
        )
        json_schema = "key string, value string"
        schema = spark.read.parquet(json_in).schema
        assert [f.name for f in schema.fields] == ["key", "value"], (
            json_schema
        )

        # P3: raw-JSON filter >= 200
        t0 = time.time()
        _run_counted(
            spark,
            json_in,
            schema,
            jobs.filter_high_topology,
            f"{work}/ckpt_p3",
        )
        results["p3_filter"] = round(n_json / (time.time() - t0), 1)

        # P4: one pass, two sinks (integer-values + are-values-in-range)
        branches = jobs.categorize_simple_branches()
        counts = {name: 0 for name in branches}

        def make_writer(name: str):
            def w(df: DataFrame, batch_id: int) -> None:
                counts[name] += df.count()

            return w

        stream = _stream(spark, json_in, schema)
        t0 = time.time()
        q = (
            fan_out(
                stream,
                branches,
                {name: make_writer(name) for name in branches},
                f"{work}/ckpt_p4",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["p4_fanout"] = round(n_json / (time.time() - t0), 1)

        # P5 shape: typed egvs with ISO systemTime for the KTable join
        typed_in = f"{work}/typed_in"
        n_typed = _write_chunks(
            e.select(
                F.col("user_id").cast("string").alias("key"),
                F.date_format(
                    "ts", "yyyy-MM-dd'T'HH:mm:ss"
                ).alias("systemTime"),
                F.col("value").cast("int").alias("value"),
            ),
            typed_in,
            NUM_CHUNKS,
        )
        typed_schema = spark.read.parquet(typed_in).schema
        run_batch = jobs.ktable_lookup_topology(
            lambda: ranges_df(spark)
        )
        out_rows = [0]

        def p5_sink(batch_df: DataFrame, batch_id: int) -> None:
            out_rows[0] += run_batch(batch_df, batch_id).count()

        stream = _stream(spark, typed_in, typed_schema)
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(p5_sink)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_p5")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["p5_ktable_join"] = round(
            n_typed / (time.time() - t0), 1
        )

        # P5 stateful-dimension variant: same egv stream tagged into the
        # changelog-union shape (golden ranges as the seq-0..2 changelog
        # prefix), dimension maintained in engine state per bucket
        from kafka_streams_dexcom_spark.schemas import GOLDEN_RANGES
        from kafka_streams_dexcom_spark.streaming import dim_state

        n_buckets = 8
        dims = spark.createDataFrame(
            [
                (rid - 1, rid, dim_state.range_json(st, et, lo, hi))
                for rid, st, et, lo, hi in GOLDEN_RANGES
            ],
            "seq long, range_id int, range_json string",
        )
        egvs = spark.read.parquet(typed_in).select(
            (F.col("value").cast("long") + 100).alias("seq"),  # any order
            "key",
            F.col("systemTime").alias("system_time"),
            F.col("value").cast("int").alias("value"),
        )
        tagged_in = f"{work}/tagged_in"
        _write_chunks(
            dim_state.tag_range_updates(dims, n_buckets).unionByName(
                dim_state.tag_egvs(egvs, n_buckets)
            ),
            tagged_in,
            NUM_CHUNKS,
        )
        tagged_schema = spark.read.parquet(tagged_in).schema
        t0 = time.time()
        _run_counted(
            spark,
            tagged_in,
            tagged_schema,
            dim_state.ktable_lookup_stateful,
            f"{work}/ckpt_p5_stateful",
        )
        # numerator = EVENT rows (n_typed), comparable with
        # p5_ktable_join: replicated changelog rows produce no output
        # and must not inflate the throughput figure
        results["p5_stateful_dim"] = round(
            n_typed / (time.time() - t0), 1
        )

        # Streaming cluster-map maintainer: the corpus-scale dedup-index
        # builder (streaming/cluster_map_stream.py) fed the documents
        # table in NUM_CHUNKS micro-batches. Unlike P3-P5 this is a
        # stateful corpus-index topology — per-batch cost grows with
        # the stored index, so the per-batch second figures matter as
        # much as the aggregate rows/s (a flat profile at 10x corpus
        # would mean the batch side is NOT what's being joined).
        from kafka_streams_dexcom_spark.streaming.cluster_map_stream import (
            ClusterMapMaintainer,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        docs_in = f"{work}/docs_in"
        n_docs = _write_chunks(docs, docs_in, NUM_CHUNKS)
        maintainer = ClusterMapMaintainer(
            spark, f"{work}/cluster_view", lineage_id="bench"
        )
        batch_secs: list[float] = []

        def timed_maintainer(batch_df: DataFrame, batch_id: int) -> None:
            b0 = time.time()
            maintainer(batch_df, batch_id)
            batch_secs.append(round(time.time() - b0, 2))

        docs_schema = spark.read.parquet(docs_in).schema
        stream = _stream(spark, docs_in, docs_schema)
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(timed_maintainer)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_cmap")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_labels = maintainer.labels().count()
        results["cluster_map_stream"] = round(n_docs / wall, 1)
        results["cluster_map_batch_sec"] = {
            "first": batch_secs[0] if batch_secs else None,
            "last": batch_secs[-1] if batch_secs else None,
            "max": max(batch_secs) if batch_secs else None,
            "n_batches": len(batch_secs),
            "labels": n_labels,
        }
        # append-granular contract: the COMMIT leg (manifest link) must
        # stay flat while the index grows; the fold/stage leg is ∝ batch
        results["cluster_map_commit_sec"] = {
            "first": maintainer.timings[0]["commit_sec"],
            "last": maintainer.timings[-1]["commit_sec"],
            "max": max(t["commit_sec"] for t in maintainer.timings),
        } if maintainer.timings else None

        # Streaming ANN ingest: per-batch argmin assignment of new
        # embeddings to the frozen quantizer + a commit-log publish —
        # the live IVF index-build path (streaming/ann_ingest.py).
        from kafka_streams_dexcom_spark.operators.dedup import (
            with_embedding_norm,
        )
        from kafka_streams_dexcom_spark.operators.similarity import (
            ivf_centroids,
        )
        from kafka_streams_dexcom_spark.streaming.ann_ingest import (
            IvfPostingsMaintainer,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = ivf_centroids(
            with_embedding_norm(
                emb.select("vec_id", "embedding", "label"), "embedding"
            ).select("vec", "label"),
            "label",
        ).select(F.col("label").alias("cid"), F.col("centroid").alias("cvec"))
        emb_in = f"{work}/emb_in"
        n_vecs = _write_chunks(
            emb.select("vec_id", "embedding"), emb_in, NUM_CHUNKS
        )
        ann = IvfPostingsMaintainer(
            spark, f"{work}/ann_index", cents, lineage_id="bench"
        )
        ann_secs: list[float] = []

        def timed_ann(batch_df: DataFrame, batch_id: int) -> None:
            b0 = time.time()
            ann(batch_df, batch_id)
            ann_secs.append(round(time.time() - b0, 2))

        emb_schema = spark.read.parquet(emb_in).schema
        stream = _stream(spark, emb_in, emb_schema)
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(timed_ann)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_ann")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["ann_ingest_stream"] = round(n_vecs / (time.time() - t0), 1)
        results["ann_ingest_batch_sec"] = {
            "first": ann_secs[0] if ann_secs else None,
            "last": ann_secs[-1] if ann_secs else None,
            "max": max(ann_secs) if ann_secs else None,
            "n_batches": len(ann_secs),
            "postings": ann.postings().count(),
        }
        results["ann_commit_sec"] = {
            "first": ann.timings[0]["commit_sec"],
            "last": ann.timings[-1]["commit_sec"],
            "max": max(t["commit_sec"] for t in ann.timings),
        } if ann.timings else None

        # Streaming SemDeDup maintainer: per-batch frozen-quantizer cell
        # assignment + within-cell cosine candidates vs batch+stored
        # members, labels folded through cc_incremental_delta, commit-log
        # published (streaming/semdedup_stream.py). stage vs commit legs
        # reported separately — the append-granular manifest's contract
        # is commit cost flat vs index size.
        from kafka_streams_dexcom_spark.queries.dedup import SEMDEDUP_TAU
        from kafka_streams_dexcom_spark.streaming.semdedup_stream import (
            SemClusterMaintainer,
        )

        sem = SemClusterMaintainer(
            spark,
            f"{work}/sem_index",
            cents,
            lineage_id="bench",
            tau=SEMDEDUP_TAU,
        )
        sem_secs: list[float] = []

        def timed_sem(batch_df: DataFrame, batch_id: int) -> None:
            b0 = time.time()
            sem(batch_df, batch_id)
            sem_secs.append(round(time.time() - b0, 2))

        stream = _stream(spark, emb_in, emb_schema)
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(timed_sem)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_sem")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["semdedup_stream"] = round(n_vecs / (time.time() - t0), 1)
        results["semdedup_batch_sec"] = {
            "first": sem_secs[0] if sem_secs else None,
            "last": sem_secs[-1] if sem_secs else None,
            "max": max(sem_secs) if sem_secs else None,
            "n_batches": len(sem_secs),
            "clusters": sem.labels().select("component").distinct().count(),
        }
        results["semdedup_commit_sec"] = {
            "first": sem.timings[0]["commit_sec"],
            "last": sem.timings[-1]["commit_sec"],
            "max": max(t["commit_sec"] for t in sem.timings),
        } if sem.timings else None

        # The same topology with the hot-cell probe cap BINDING: on the
        # deliberately dense synthetic corpus (every vector lands in a
        # handful of cells) the uncapped stored side grows per batch;
        # capped at ONE BATCH's per-cell share the stored probe can
        # never exceed what batch 1 saw, so the fold must stay FLAT —
        # the measured form of the r8 watch item (the pytest proves
        # equality semantics; this row proves the bounded cost).
        n_cells = cents.count()
        cap = max(1, n_vecs // NUM_CHUNKS // max(1, n_cells))
        sem_cap = SemClusterMaintainer(
            spark,
            f"{work}/sem_index_cap",
            cents,
            lineage_id="bench-cap",
            tau=SEMDEDUP_TAU,
            max_cell_probe=cap,
        )
        cap_secs: list[float] = []

        def timed_sem_cap(batch_df: DataFrame, batch_id: int) -> None:
            b0 = time.time()
            sem_cap(batch_df, batch_id)
            cap_secs.append(round(time.time() - b0, 2))

        stream = _stream(spark, emb_in, emb_schema)
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(timed_sem_cap)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_sem_cap")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["semdedup_capped_stream"] = round(
            n_vecs / (time.time() - t0), 1
        )
        results["semdedup_capped_batch_sec"] = {
            "first": cap_secs[0] if cap_secs else None,
            "last": cap_secs[-1] if cap_secs else None,
            "max": max(cap_secs) if cap_secs else None,
            "cap": cap,
        }

        # Streaming Bloom-filter dedup maintainer: per batch, screen
        # against the width-bounded stored bit set (broadcast), commit
        # the batch's bits O(batch). The contract under measurement is
        # the same as ann_ingest: commit stays FLAT while the filter
        # fills; the screen side is bounded by the FIXED width no
        # matter how many batches have streamed.
        from kafka_streams_dexcom_spark.streaming.bloom_ingest import (
            BloomFilterMaintainer,
        )

        docs_bloom = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        bloom_in = f"{work}/bloom_in"
        n_bloom = _write_chunks(docs_bloom, bloom_in, NUM_CHUNKS)
        flagged = [0]
        bloom = BloomFilterMaintainer(
            spark,
            f"{work}/bloom_filter",
            m_bits=8 * n_bloom,
            screened=lambda df, bid: flagged.__setitem__(
                0, flagged[0] + df.agg(
                    # empty micro-batch: F.sum yields NULL, not 0
                    F.coalesce(F.sum("probably_seen"), F.lit(0))
                ).collect()[0][0]
            ),
            lineage_id="bench-bloom",
        )
        t0 = time.time()
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(bloom_in)
            .writeStream.foreachBatch(bloom)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_bloom")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["bloom_ingest_stream"] = round(
            n_bloom / (time.time() - t0), 1
        )
        results["bloom_commit_sec"] = {
            "first": bloom.timings[0]["commit_sec"],
            "last": bloom.timings[-1]["commit_sec"],
            "max": max(t["commit_sec"] for t in bloom.timings),
        } if bloom.timings else None
        results["bloom_flagged"] = {
            "probable_seen": int(flagged[0]),
            "fill_ratio": round(bloom.fill_ratio(), 4),
            # the O(1) manifest counter a monitor reads instead of
            # scanning the bit set — must track the exact scan above
            "fill_ratio_meta": round(bloom.fill_ratio_meta(), 4),
            "fill_trajectory": [
                t["fill_ratio"] for t in bloom.timings
            ],
            "rebuild_due": bloom.rebuild_due(),
        }

        # Streaming per-domain line census: per batch, commit the
        # batch's (host, line-hash) distinct-doc counts O(batch) and
        # screen the batch against the PRE-batch chrome set. The
        # contract under measurement: commit cost stays FLAT as the
        # census grows (increments are batch-sized; the stored census
        # is only read by the screen aggregate, never rewritten).
        from kafka_streams_dexcom_spark.functions import url as ux
        from kafka_streams_dexcom_spark.streaming.line_census import (
            HostLineCensusMaintainer,
        )

        docs_lc = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.expr(
                ux.host_sql(ux.canonical_url_sql(ux.messy_url_sql()))
            ).alias("host"),
            F.expr(ux.page_text_sql()).alias("text"),
        )
        lc_in = f"{work}/lc_in"
        n_lc = _write_chunks(docs_lc, lc_in, NUM_CHUNKS)
        chrome_hits = [0]
        lc = HostLineCensusMaintainer(
            spark,
            f"{work}/line_census",
            screened=lambda df, bid: chrome_hits.__setitem__(
                0, chrome_hits[0] + df.agg(
                    F.coalesce(F.sum("n_chrome_lines"), F.lit(0))
                ).collect()[0][0]
            ),
            lineage_id="bench-lc",
        )
        t0 = time.time()
        q = (
            spark.readStream.schema(
                "doc_id long, host string, text string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(lc_in)
            .writeStream.foreachBatch(lc)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_lc")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["line_census_stream"] = round(
            n_lc / (time.time() - t0), 1
        )
        results["line_census_commit_sec"] = {
            "first": lc.timings[0]["commit_sec"],
            "last": lc.timings[-1]["commit_sec"],
            "max": max(t["commit_sec"] for t in lc.timings),
        } if lc.timings else None
        results["line_census_chrome"] = {
            "provisional_chrome_line_hits": int(chrome_hits[0]),
            "chrome_lines_final": lc.chrome().count(),
        }

        # Streaming perceptual-dup index: per batch, banded candidate
        # probe against the stored fingerprint index + incremental CC
        # changelog (streaming/phash_index.py). Fingerprints are
        # synthesized scan-side in the planted re-encode geometry
        # (group g = doc_id div 3; two exact twins + a 1-bit near-dup)
        # so the leg measures the MAINTAINER's fold — pairing, CC
        # delta, commit — not a codec pass. Same contract as the
        # cluster-map maintainer: per-batch cost may grow with the
        # index (the probe side), commits stay O(batch).
        from kafka_streams_dexcom_spark.streaming.phash_index import (
            PhashIndexMaintainer,
        )

        fp_bench = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            *[
                F.expr(
                    f"CAST(conv(substr(md5(concat('bfp:', "
                    f"CAST(doc_id div 3 AS STRING))), {1 + 4 * i}, 4), "
                    f"16, 10) AS BIGINT)"
                    + (" ^ CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END"
                       if i == 0 else "")
                ).alias(f"b{i}")
                for i in range(4)
            ],
        )
        fp_in = f"{work}/fp_in"
        n_fp = _write_chunks(fp_bench, fp_in, NUM_CHUNKS)
        pidx = PhashIndexMaintainer(
            spark, f"{work}/phash_index", lineage_id="bench-fp"
        )
        fp_secs: list[float] = []

        def timed_fp(batch_df: DataFrame, batch_id: int) -> None:
            b0 = time.time()
            pidx(batch_df, batch_id)
            fp_secs.append(round(time.time() - b0, 2))

        t0 = time.time()
        q = (
            spark.readStream.schema(
                "doc_id long, b0 long, b1 long, b2 long, b3 long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(fp_in)
            .writeStream.foreachBatch(timed_fp)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_fp")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["phash_index_stream"] = round(
            n_fp / (time.time() - t0), 1
        )
        results["phash_index_batch_sec"] = {
            "first": fp_secs[0] if fp_secs else None,
            "last": fp_secs[-1] if fp_secs else None,
            "max": max(fp_secs) if fp_secs else None,
            "n_batches": len(fp_secs),
            "dup_docs": pidx.survivors_view()
            .filter(~F.col("is_survivor"))
            .count(),
        }
        results["phash_index_commit_sec"] = {
            "first": pidx.timings[0]["commit_sec"],
            "last": pidx.timings[-1]["commit_sec"],
            "max": max(t["commit_sec"] for t in pidx.timings),
        } if pidx.timings else None

        # Streaming curation gate: JSONL landing -> PERMISSIVE parse ->
        # three-way corrupt/rejected/accepted routing with the gopher
        # flags riding the landing scan (streaming/quality_gate.py).
        # Counted per sink so the figure is transform+routing
        # throughput, not driver serialization.
        from pyspark.sql import types as T

        from kafka_streams_dexcom_spark.sources.corpus import (
            read_jsonl_stream,
        )
        from kafka_streams_dexcom_spark.streaming.quality_gate import (
            curation_gate_writer,
        )

        gate_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
            ]
        )
        gate_in = f"{work}/gate_in"
        docs_full = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source"
        )
        n_gate = docs_full.count()
        docs_full.repartition(NUM_CHUNKS).write.mode("overwrite").json(
            gate_in
        )
        routed = {"accept": 0, "reject": 0, "quarantine": 0}

        def counted(name: str):
            def w(df: DataFrame, batch_id: int) -> None:
                routed[name] += df.count()

            return w

        gate = curation_gate_writer(
            counted("accept"), counted("reject"), counted("quarantine")
        )
        stream = read_jsonl_stream(
            spark, gate_in, gate_schema, max_files_per_trigger=1
        )
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(gate)
            .option("checkpointLocation", f"{work}/ckpt_gate")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert routed["accept"] + routed["reject"] == n_gate
        results["curation_gate_stream"] = round(
            n_gate / (time.time() - t0), 1
        )
        results["curation_gate_routed"] = dict(routed)

        # Quarantine-burst alarm, end-to-end: the same gate topology fed
        # an input with a PLANTED format break (BURST invalid JSON lines
        # appended to one landing file -> one hot micro-batch), per-epoch
        # (rows, quarantined) counts folded from the three sinks'
        # bookkeeping (O(1) driver data per batch), and the shared alarm
        # tail (operators/dq.py:quarantine_alarm_from_counts) run over
        # the resulting ledger. The ops contract under test: exactly the
        # burst epoch alarms, every clean epoch stays quiet.
        from kafka_streams_dexcom_spark.operators.dq import (
            quarantine_alarm_from_counts,
        )

        BURST = 200
        burst_in = f"{work}/gate_burst_in"
        docs_full.repartition(NUM_CHUNKS).write.mode("overwrite").json(
            burst_in
        )
        # the incident: a producer lands one more file in the drop zone
        # with a broken format — its micro-batch is the hot epoch.
        # (A new file, not an append: the local FS keeps CRC sidecars
        # for Spark-written files, and a real landing zone receives
        # whole files anyway.)
        with open(os.path.join(burst_in, "part-zz-burst.json"), "w") as fh:
            fh.write('{"doc_id": -1, "text": "ok", "lang": "en", '
                     '"source": "s"}\n')
            for i in range(BURST):
                fh.write('{"doc_id": broken line %d\n' % i)

        per_epoch: dict[int, dict[str, int]] = {}

        def routed_counted(name: str):
            def w(df: DataFrame, batch_id: int) -> None:
                c = per_epoch.setdefault(
                    batch_id, {"accept": 0, "reject": 0, "quarantine": 0}
                )
                c[name] += df.count()

            return w

        gate_b = curation_gate_writer(
            routed_counted("accept"),
            routed_counted("reject"),
            routed_counted("quarantine"),
        )
        stream_b = read_jsonl_stream(
            spark, burst_in, gate_schema, max_files_per_trigger=1
        )
        t0 = time.time()
        q = (
            stream_b.writeStream.foreachBatch(gate_b)
            .option("checkpointLocation", f"{work}/ckpt_gate_burst")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        burst_wall = time.time() - t0
        ledger = spark.createDataFrame(
            [
                (e, sum(c.values()), c["quarantine"])
                for e, c in sorted(per_epoch.items())
            ],
            "epoch bigint, n_rows bigint, n_quarantined bigint",
        )
        alarms = {
            r["epoch"]: r
            for r in quarantine_alarm_from_counts(ledger).collect()
            if r["alarm"] == 1
        }
        assert len(alarms) == 1, f"expected 1 alarm epoch: {alarms}"
        (hot,) = alarms.values()
        assert hot["n_quarantined"] == BURST, hot
        results["quarantine_alarm"] = {
            "rows_per_sec": round((n_gate + BURST + 1) / burst_wall, 1),
            "burst_rows": BURST,
            "alarm_epochs": 1,
            "alarm_rate_ppm": hot["rate_ppm"],
            "n_epochs": len(per_epoch),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    def load1():
        # co-tenant legibility, mirroring bench.py (round 13):
        # additions-only — existing keys untouched
        try:
            with open("/proc/loadavg") as f:
                return float(f.read().split()[0])
        except (OSError, ValueError, IndexError):
            return None

    print(
        json.dumps(
            {
                "metric": "streaming_rows_per_sec",
                "unit": "rows/s",
                "chunks": NUM_CHUNKS,
                "input_rows": n_json,
                "topologies": results,
                "sf": sf_dir,
                "load1_start": load1_start,
                "load1_end": load1(),
                "cpus": os.cpu_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
