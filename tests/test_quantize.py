"""Unit tests for embedding quantization (operators/quantize.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.quantize import (
    ivfpq_topk,
    pq_topk,
    quantize_embeddings,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_scalar_quantize_codes_and_error(spark):
    # dim0 spans [0, 10] -> codes 0/255 at the extremes; dim1 constant
    # (degenerate) -> code 0, zero error
    df = _emb(spark, [(0, [0.0, 5.0]), (1, [10.0, 5.0]), (2, [5.0, 5.0])])
    out = {r["vec_id"]: r.asDict() for r in quantize_embeddings(df).collect()}
    assert out[0]["q_codes"] == "0,0"
    assert out[1]["q_codes"] == "255,0"
    assert out[2]["q_codes"].split(",")[1] == "0"
    # codes at the range endpoints reconstruct exactly
    assert out[0]["mse"] == 0.0 and out[1]["mse"] == 0.0
    # the midpoint lands between codes: error bounded by one step
    step = 10.0 / 255
    assert 0 < out[2]["mse"] <= step * step


def test_pq_identical_vectors_rank_first(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    # vector 30 duplicates query 0's geometry exactly -> identical codes
    # -> ADC distance equal to the query's own quantization floor, which
    # is minimal among all candidates
    rows[30] = (30, list(rows[0][1]))
    df = _emb(spark, rows)
    out = pq_topk(df, query_ids=(0,), k=5)
    top = out.filter(F.col("rnk") == 1).collect()[0]
    assert top["query_id"] == 0
    assert top["vec_id"] == 30


def test_ivfpq_restricts_candidates_to_probed_cell(spark):
    import random

    rng = random.Random(5)
    # two well-separated clusters around +2 / -2 per dim; labels match
    rows = []
    for i in range(40):
        center = 2.0 if i % 2 == 0 else -2.0
        rows.append(
            (
                i,
                [center + rng.uniform(-0.1, 0.1) for _ in range(64)],
                i % 2,
            )
        )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], lbl) for i, v, lbl in rows],
        "vec_id long, embedding array<float>, label int",
    )
    out = ivfpq_topk(df, query_ids=(0, 1), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # query 0 (cluster even) must only see even ids; query 1 only odd
    assert by_q[0] and all(v % 2 == 0 for v in by_q[0])
    assert by_q[1] and all(v % 2 == 1 for v in by_q[1])


def test_pq_excludes_self_and_ranks_densely(spark):
    import random

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    df = _emb(spark, rows)
    out = pq_topk(df, query_ids=(1, 2), k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert all(r["vec_id"] != qid for r in rs)
        assert sorted(r["rnk"] for r in rs) == [1, 2, 3, 4]
        dists = [r["adist"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert dists == sorted(dists)
