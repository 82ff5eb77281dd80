"""Batch/stream equivalence harness.

The reference tests topologies headlessly by injecting them into
TopologyTestDriver (CategorizeWithSimpleRuleTest.java:36-37). The Spark
analog: every transform is a ``DataFrame -> DataFrame`` function, so the
same function runs over a batch DataFrame and over a file-source streaming
DataFrame; the harness feeds the input as multiple files (one micro-batch
each with maxFilesPerTrigger=1) and collects the union of all micro-batch
outputs for comparison against the batch run.

This validates the property the engine actually promises: per-record
transforms produce identical results regardless of micro-batch boundaries
(the reference's cache=0 / emit-per-record semantics, SURVEY.md §2.6 #8).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, Row, SparkSession


def _run_chunked(
    spark: SparkSession,
    input_df: DataFrame,
    num_chunks: int,
    build_query: Callable,
    prefix: str,
) -> list[Row]:
    """Shared scaffold for both harness flavors: write the input as
    ``num_chunks`` one-file micro-batches, build the streaming query via
    ``build_query(stream, sink, ckpt)``, run to completion, return the
    rows the sink collected. ONE copy of the chunk-write + stream-build
    + run loop, so fixes to it reach both entry points."""
    workdir = tempfile.mkdtemp(prefix=prefix)
    in_dir = f"{workdir}/in"
    rows = input_df.collect()
    schema = input_df.schema
    chunk = max(1, (len(rows) + num_chunks - 1) // num_chunks)
    for i in range(0, len(rows), chunk):
        spark.createDataFrame(rows[i : i + chunk], schema).coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    collected: list[Row] = []
    q = build_query(stream, collected, f"{workdir}/ckpt")
    q.awaitTermination()
    return collected


def run_stream(
    spark: SparkSession,
    input_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    num_chunks: int = 3,
) -> list[Row]:
    """Run ``transform`` over ``input_df`` delivered as ``num_chunks``
    micro-batches; returns all output rows across batches."""

    def build(stream, collected, ckpt):
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            collected.extend(batch_df.collect())

        return (
            transform(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    return _run_chunked(
        spark, input_df, num_chunks, build, "stream_harness_"
    )


def run_stream_foreach_batch(
    spark: SparkSession,
    input_df: DataFrame,
    batch_transform: Callable[[DataFrame, int], DataFrame],
    num_chunks: int = 3,
) -> list[Row]:
    """Like :func:`run_stream` but applies the transform *inside*
    foreachBatch — required for transforms that use batch-only operators
    (non-time windows like the interval join's first-match row_number) and
    for per-batch dimension refresh (the P5 KTable-snapshot pattern)."""

    def build(stream, collected, ckpt):
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            collected.extend(batch_transform(batch_df, batch_id).collect())

        return (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    return _run_chunked(
        spark, input_df, num_chunks, build, "stream_harness_fb_"
    )


def assert_batch_stream_equivalent(
    spark: SparkSession,
    input_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    num_chunks: int = 3,
) -> None:
    """Assert the transform gives identical multisets of rows in batch and
    under micro-batched streaming."""
    batch_rows = transform(input_df).collect()
    stream_rows = run_stream(spark, input_df, transform, num_chunks)
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    assert sorted(batch_rows, key=key) == sorted(stream_rows, key=key), (
        f"batch={len(batch_rows)} rows vs stream={len(stream_rows)} rows"
    )
