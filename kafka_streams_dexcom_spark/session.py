"""SparkSession builder tuned for both local testing and cluster scale.

Defaults chosen for the 100 TB target:
- AQE on (runtime coalescing of shuffle partitions, skew-join splitting) —
  replaces hand-tuned partition counts when data volume varies 1000x.
- Arrow on — every Pandas UDF / toPandas crosses the JVM<->Python boundary
  in columnar batches instead of pickled rows.
- UTC session timezone — parquet timestamps are naive; pinning UTC makes
  Spark agree with the DuckDB oracle byte-for-byte.
- shuffle.partitions defaults to $SPARK_GRAFT_CPUS when set, else a fixed
  32 (the bench/driver configuration); on a real cluster AQE
  coalesces from a deliberately high initial number, so set
  `spark.sql.adaptive.coalescePartitions.initialPartitionNum` instead of
  hand-tuning this per job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka_streams_dexcom_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a real cluster pass ``None``
    and let spark-submit set it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # testdata events.ts is parquet TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long and normalize to µs timestamps in
        # sources.files.load_table (DuckDB also truncates ns→µs internally,
        # so both engines see identical values).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate synthesizes size(expr)>0 filters from
        # explode() and pushes them below exchanges — duplicating expensive
        # array expressions onto the pre-fan-out (often single-partition)
        # side. Generate drops empty arrays itself (outer=false), so the
        # inferred filter only re-derives what Generate already does;
        # excluding the rule measured 3-7x on shingle/explode pipelines.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Keep parquet scans chunky: fewer, larger input partitions beat
        # many tiny ones for columnar scans (default 128m is kept; files
        # smaller than this coalesce via AQE anyway).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Driver-side niceties for local runs; harmless on cluster.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # Deployment-specific overrides without code edits (cluster runs
    # tune shuffle partitions / join strategy / codecs per environment):
    # SPARK_GRAFT_EXTRA_CONF="spark.a=b;spark.c=d". Applied before
    # extra_conf so explicit callers win.
    for pair in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
