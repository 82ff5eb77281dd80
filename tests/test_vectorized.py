"""Vectorized pandas_udf cosine must agree with the exact fold-expression
cosine to float tolerance (they differ only in summation order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.vectorized import cosine_to_query
from kafka_streams_dexcom_spark.operators.dedup import (
    DOT_EXPR_TPL,
    with_embedding_norm,
)
from kafka_streams_dexcom_spark.sources.files import load_table


def test_pandas_udf_cosine_matches_fold_cosine(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).collect()[0].embedding
    # exact fold path
    base = with_embedding_norm(e)
    qlit = "array(" + ", ".join(f"{float(x)}D" for x in qvec) + ")"
    qnorm_sql = f"sqrt({DOT_EXPR_TPL.format(a=qlit, b=qlit)})"
    fold = base.select(
        "vec_id",
        (
            F.expr(DOT_EXPR_TPL.format(a="vec", b=qlit))
            / (F.col("norm") * F.expr(qnorm_sql))
        ).alias("cos_fold"),
    )
    # vectorized path
    fast = e.select(
        "vec_id", cosine_to_query(e, list(qvec)).alias("cos_fast")
    )
    joined = {
        r.vec_id: (r.cos_fold, None) for r in fold.collect()
    }
    for r in fast.collect():
        joined[r.vec_id] = (joined[r.vec_id][0], r.cos_fast)
    assert all(
        abs(a - b) < 1e-9 for a, b in joined.values()
    ), sorted(
        ((k, a, b) for k, (a, b) in joined.items() if abs(a - b) >= 1e-9)
    )[:3]


def test_cosine_udf_null_embedding_rows(spark):
    """A batch containing NULL embeddings must not crash np.stack; null
    rows come back null, others scored."""
    from kafka_streams_dexcom_spark.functions.vectorized import (
        cosine_to_query,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0])],
        "id int, embedding array<double>",
    )
    rows = {
        r.id: r.cs
        for r in df.select(
            "id", cosine_to_query(df, [1.0, 0.0]).alias("cs")
        ).collect()
    }
    assert rows[1] == 1.0
    assert rows[2] is None
    assert rows[3] == 0.0  # zero vector scores 0, not NaN


def test_cosine_udf_zero_query_vector(spark):
    from kafka_streams_dexcom_spark.functions.vectorized import (
        cosine_to_query,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "id int, embedding array<double>"
    )
    [r] = df.select(cosine_to_query(df, [0.0, 0.0]).alias("cs")).collect()
    assert r.cs == 0.0
