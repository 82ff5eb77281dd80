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


def test_decode_real_image_adapter_with_fake_pil(monkeypatch):
    """_decode_real's PIL adapter, exercised without PIL installed: inject
    a minimal fake PIL module and check the (w, h, frames, mean) mapping."""
    import sys
    import types

    import numpy as np

    from kafka_streams_dexcom_spark.operators import multimodal as mm

    class FakeImg:
        size = (320, 240)
        n_frames = 3

        def convert(self, mode):
            assert mode == "L"
            return np.full((240, 320), 51, dtype=np.uint8)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_image_mod = types.SimpleNamespace(open=lambda buf: FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image", fake_image_mod
    )
    # _decode_real prefers PIL only when the import probe saw it; the
    # fake stands in for a present PIL (the vendored-PNG path has its
    # own tests in test_png_codec.py)
    monkeypatch.setattr(mm, "_HAVE_REAL_CODECS", True)

    w, h, nf, fm = mm._decode_real(b"\x89PNG...", "image")
    assert (w, h, nf) == (320, 240, 3)
    assert fm == round(51 / 255.0, 6)
    # non-image media falls back to the deterministic stub
    assert mm._decode_real(b"abc", "audio") == mm._decode_stub(b"abc")


def test_decode_features_real_requested_but_unavailable(spark):
    import pytest as _pytest

    from kafka_streams_dexcom_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"x"))],
        "doc_id long, media_type string, payload binary",
    )
    if not mm._HAVE_REAL_CODECS:
        # new contract (r4): real-codec mode without PIL is allowed —
        # the vendored PNG codec serves PNG payloads, and a NON-PNG
        # image payload fails per-payload at execution, never silently
        # faking features
        out = mm.decode_features(df, use_real_codecs=True)
        with _pytest.raises(Exception, match="PNG"):
            out.collect()
