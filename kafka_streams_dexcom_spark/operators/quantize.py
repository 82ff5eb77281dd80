"""Embedding compression operators.

Scalar (int8-range) quantization is the standard first move for serving
and storing billion-scale embedding corpora (4x smaller than float32
before codec compression, and the dequantization error bound is known
per dimension). The Spark shape is a two-pass pipeline:

1. one global aggregation for per-dimension min/max (posexplode →
   groupBy(dim) — a shuffle of n_vectors × dims scalar rows with
   map-side partial min/max, so the exchange itself carries only
   dims × n_partitions rows);
2. a broadcast of the (dims)-sized stats arrays back onto the corpus
   scan, where quantization is a narrow codegen `transform`.

At 100 TB the stats pass is the only wide stage and its output is a few
KB — the classic "tiny global state, huge narrow map" profile that
scales linearly with executors.

All arithmetic is double with floor cuts (no rounding ties), and error
folds are sequential left folds, so the DuckDB oracle replays
bit-identically (see functions/rounding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.rounding import trunc6
from kafka_streams_dexcom_spark.sources.files import fan_out_small

QLEVELS = 255  # quantized codes span [0, 255] — one unsigned byte


def dimension_stats(emb: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Single-row DataFrame of per-dimension min/max arrays (0-indexed,
    aligned with Spark's 0-based array subscripts)."""
    dims = emb.select(F.posexplode(vec_col).alias("dim", "x"))
    stats = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    return stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn"))).alias("mns"),
        F.array_sort(F.collect_list(F.struct("dim", "mx"))).alias("mxs"),
    ).select(
        F.expr("transform(mns, s -> s.mn)").alias("mn"),
        F.expr("transform(mxs, s -> s.mx)").alias("mx"),
    )


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Min-max scalar quantization of an embedding column to byte codes,
    with the per-vector reconstruction MSE.

    Returns (id, q_codes as a comma-joined string for engine-portable
    comparison, mse). Degenerate dimensions (mn == mx) quantize to 0 and
    contribute zero error."""
    base = fan_out_small(emb).select(
        id_col,
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("vec"),
    )
    stats = dimension_stats(base)
    q_expr = (
        "transform(vec, (x, i) -> CASE WHEN mx[i] = mn[i] THEN 0 "
        f"ELSE CAST(floor((x - mn[i]) / (mx[i] - mn[i]) * {QLEVELS}.0D) "
        "AS INT) END)"
    )
    with_q = base.crossJoin(F.broadcast(stats)).withColumn(
        "q", F.expr(q_expr)
    )
    err2 = (
        "transform(vec, (x, i) -> CASE WHEN mx[i] = mn[i] THEN 0.0D "
        "ELSE pow(x - (mn[i] + CAST(q[i] AS DOUBLE) * (mx[i] - mn[i]) "
        f"/ {QLEVELS}.0D), 2.0D) END)"
    )
    mse = F.expr(
        f"aggregate({err2}, 0.0D, (acc, v) -> acc + v)"
    ) / F.size("vec").cast("double")
    return with_q.select(
        id_col,
        F.concat_ws(
            ",", F.expr("transform(q, v -> CAST(v AS STRING))")
        ).alias("q_codes"),
        trunc6(mse).alias("mse"),
    )
