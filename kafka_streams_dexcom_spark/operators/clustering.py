"""Iterative k-means over embedding columns — the trainer for the IVF
coarse quantizer (operators/similarity.ivf_topk) and the template for
iterative algorithms on DataFrames generally.

Per iteration: assign (cross join with the broadcast centroid set +
argmin) → update (elementwise mean via posexplode/avg). Iterative
hygiene as in operators/graph.py: centroids are tiny and re-broadcast
each round; their lineage is cut with an eager localCheckpoint so round
k's plan does not re-derive rounds 1..k-1.

Determinism: fixed seed-free init (the first k vec_ids), ties broken by
lowest centroid id, centroid components truncated to 6 decimals so
partial-aggregation order cannot leak into assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.dedup import with_embedding_norm

DIST2_TPL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "0.0D, (acc, v) -> acc + v)"
)


def assign_to_centroids(base: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vid, vec, cid) argmin-L2 assignment of ``base`` (vid, vec rows)
    to a FROZEN broadcast centroid set (cid, cvec) — the per-round step
    of Lloyd training AND, standalone, the whole job of IVF ingest
    (new vectors are assigned to an already-trained quantizer, never
    retraining it).

    argmin via min_by on the (d2, cid) struct: a hash aggregate with
    map-side partials — no per-vid sort, unlike a row_number window.
    Struct ordering preserves the lowest-cid tie-break exactly."""
    scored = base.crossJoin(F.broadcast(centroids)).withColumn(
        "d2", F.expr(DIST2_TPL.format(a="vec", b="cvec"))
    )
    return scored.groupBy("vid").agg(
        F.min_by(
            F.struct("vec", "cid"), F.struct("d2", "cid")
        ).alias("__m")
    ).select(
        "vid",
        F.col("__m.vec").alias("vec"),
        F.col("__m.cid").alias("cid"),
    )


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignment) after ``iterations`` Lloyd rounds —
    centroids as (cid, cvec), assignment as (vec_id, cell). The
    centroid frame IS the frozen quantizer the streaming maintainers
    (ann_ingest, semdedup_stream) assign against: because the final
    assignment is assign_to_centroids(·, centroids), re-assigning ANY
    subset against the returned centroids is bit-equal to its rows
    here — the invariant that makes streamed index state provably
    equal to the one-shot batch artifact."""
    base = with_embedding_norm(emb.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("vid"), "vec"
    )
    # init = the k LOWEST ids (orderBy+limit), not filter(vid < k):
    # the filter silently yields fewer/zero centroids when ids are not
    # dense 0-based (1-based, offset, or hashed id spaces)
    cents = base.orderBy("vid").limit(k).select(
        F.col("vid").alias("cid"), F.col("vec").alias("cvec")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        return assign_to_centroids(base, centroids)

    assigned = assign(cents)
    for _ in range(iterations - 1):
        per_dim = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
        )
        cents = (
            per_dim.groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cx))), "
                    "s -> s.cx)"
                ).alias("cvec")
            )
            .localCheckpoint()
        )
        assigned = assign(cents)
    return cents, assigned.select(
        F.col("vid").alias("vec_id"), F.col("cid").alias("cell")
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell) assignment after ``iterations`` Lloyd rounds."""
    return kmeans_train(emb, k, iterations, id_col, vec_col)[1]
