"""Unit tests for the iterative operators: k-means assignment and
connected-components cluster representatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.clustering import kmeans_assign
from kafka_streams_dexcom_spark.operators.graph import (
    cluster_representatives,
    connected_components,
)


def test_kmeans_deterministic_and_total(spark, sf_dir):
    from kafka_streams_dexcom_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings")
    a1 = {r.vec_id: r.cell for r in kmeans_assign(e, 4, 2).collect()}
    a2 = {r.vec_id: r.cell for r in kmeans_assign(e, 4, 2).collect()}
    assert a1 == a2  # deterministic across runs
    assert len(a1) == e.count()  # every vector assigned
    assert set(a1.values()) <= {0, 1, 2, 3}


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs around +1 and -1: k=2 must split them exactly
    rows = [(i, [1.0 + 0.01 * i] * 4) for i in range(2)] + [
        (i, [-1.0 - 0.01 * i] * 4) for i in range(2, 6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cell for r in kmeans_assign(df, 2, 3).collect()}
    assert got[0] == got[1]
    assert got[2] == got[3] == got[4] == got[5]
    assert got[0] != got[2]


def test_connected_components_exact_on_known_graph(spark):
    # components: {1,2,3} (chain), {10,11}, singleton edges only appear
    # via pairs so isolated nodes are out of scope by construction
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    cc = {r.node: r.component for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    reps = {
        r.component: (r.representative, r.cluster_size)
        for r in cluster_representatives(
            connected_components(pairs)
        ).collect()
    }
    assert reps == {1: (1, 3), 10: (10, 2)}
