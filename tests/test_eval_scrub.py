"""Decontamination by span removal (operators/text.py:eval_span_scrub):
quoted benchmark items are excised, the quoting document survives, and
nothing else is touched."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.text import eval_span_scrub

K = 4  # small k so the planted quotes are short


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quoted_span_excised_doc_survives(spark):
    eval_docs = _docs(spark, [(100, "q1 q2 q3 q4")])
    train = _docs(
        spark,
        [(0, "intro words here q1 q2 q3 q4 outro words here")],
    )
    out = eval_span_scrub(train, eval_docs, k=K).collect()[0]
    assert out["n_removed"] == 4
    assert out["clean_text"] == "intro words here outro words here"


def test_longer_quote_fully_covered(spark):
    """A 6-token quote of a 6-token eval doc is covered by its three
    overlapping 4-grams — removal is span-complete, not gram-anchored."""
    eval_docs = _docs(spark, [(100, "e1 e2 e3 e4 e5 e6")])
    train = _docs(spark, [(0, "a b e1 e2 e3 e4 e5 e6 c d")])
    out = eval_span_scrub(train, eval_docs, k=K).collect()[0]
    assert out["n_removed"] == 6
    assert out["clean_text"] == "a b c d"


def test_unrelated_and_partial_overlap_untouched(spark):
    """Docs sharing fewer than k consecutive tokens with the eval suite
    keep every token — the k-gram floor is the false-positive guard."""
    eval_docs = _docs(spark, [(100, "q1 q2 q3 q4")])
    train = _docs(
        spark,
        [
            (0, "totally unrelated text tokens here"),
            (1, "q1 q2 q3 different suffix tokens"),  # only 3 shared
        ],
    )
    rows = {r["doc_id"]: r for r in
            eval_span_scrub(train, eval_docs, k=K).collect()}
    assert rows[0]["n_removed"] == 0
    assert rows[1]["n_removed"] == 0
    assert rows[1]["clean_text"] == "q1 q2 q3 different suffix tokens"


def test_short_eval_doc_contributes_no_grams(spark):
    eval_docs = _docs(spark, [(100, "too short")])  # < k tokens
    train = _docs(spark, [(0, "too short and the rest of the doc")])
    out = eval_span_scrub(train, eval_docs, k=K).collect()[0]
    assert out["n_removed"] == 0


def test_registered_query_scrubs_planted_dups(spark, sf_dir):
    """Over the real corpus: the scrub only ever removes tokens from
    non-eval sources, and every scrubbed doc genuinely shares an 8-gram
    with src0 (spot-checked via the contamination machinery's shingle
    overlap at the same k)."""
    from kafka_streams_dexcom_spark.queries.text import q_eval_span_scrub

    out = q_eval_span_scrub(spark, sf_dir)
    assert out.filter(F.col("n_removed") < 0).count() == 0
    total = out.count()
    assert total > 0
