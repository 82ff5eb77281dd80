"""Semantic contamination screen (queries/dedup.py:
semantic_contamination): the planted PARAPHRASE geometry — an eval
item leaked into training with different words but the same meaning
vector — that lexical n-gram containment (contamination_check) scores
0.0 and the embedding screen flags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators import dedup as dd
from kafka_streams_dexcom_spark.queries.dedup import (
    CONTAM_SEM_TAU,
    semantic_contamination,
)

# The planted pair: zero shared word 3-grams (completely disjoint
# vocabulary), near-identical unit vectors (the encoder's view of a
# paraphrase).
EVAL_TEXT = "the patient glucose value rose rapidly overnight alarms"
PARA_TEXT = "sugar readings climbed fast during sleep and sensor warned"
EVAL_VEC = [0.6, 0.8, 0.0, 0.0]
PARA_VEC = [0.6, 0.78, 0.05, 0.0]  # cosine ~0.9987
FAR_VEC = [0.0, 0.0, 1.0, 0.0]


def _vec_frame(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cell int"
    )
    return dd.with_embedding_norm(df).select(
        "vec_id", "vec", "norm", "cell"
    )


def test_paraphrase_lexical_miss_semantic_catch(spark):
    """contamination_check's containment is 0.0 on the paraphrase
    (no shared shingles), while the semantic screen flags it at
    cosine >= tau — the gap the query exists to close."""
    docs = spark.createDataFrame(
        [(0, EVAL_TEXT), (100, PARA_TEXT), (101, "join filter group by")],
        "doc_id long, text string",
    )
    lex = dd.contamination_report(
        docs.filter("doc_id = 0"), docs.filter("doc_id >= 100")
    ).collect()
    by_eval = {r.eval_doc: r for r in lex}
    assert by_eval[0].containment == 0.0  # lexical screen is blind

    train = _vec_frame(
        spark, [(100, PARA_VEC, 0), (101, FAR_VEC, 0)]
    )
    eval_ = _vec_frame(spark, [(0, EVAL_VEC, 0)])
    sem = {
        r.vec_id: r
        for r in semantic_contamination(train, eval_).collect()
    }
    assert sem[100].contaminated == 1
    assert sem[100].eval_vec == 0
    assert sem[100].cos_sim >= CONTAM_SEM_TAU
    assert sem[101].contaminated == 0


def test_cell_blocking_bounds_candidates(spark):
    """A near-identical pair split across CELLS is not scored — the
    screen's candidate volume is the quantizer partition's, exactly
    like semdedup/dedup_embedding_ivf (the documented recall/cost
    trade of coarse blocking)."""
    train = _vec_frame(spark, [(100, PARA_VEC, 1)])
    eval_ = _vec_frame(spark, [(0, EVAL_VEC, 0)])
    sem = semantic_contamination(train, eval_).collect()
    assert len(sem) == 1
    assert sem[0].contaminated == 0
    assert sem[0].eval_vec is None
    assert sem[0].cos_sim == 0.0


def test_ties_break_to_lowest_eval_id(spark):
    """Two eval vectors at the identical rounded cosine: the argmax
    keeps the lowest eval id (deterministic ledger rows)."""
    train = _vec_frame(spark, [(100, EVAL_VEC, 0)])
    eval_ = _vec_frame(
        spark, [(0, EVAL_VEC, 0), (20, EVAL_VEC, 0)]
    )
    sem = semantic_contamination(train, eval_).collect()
    assert sem[0].eval_vec == 0
    assert sem[0].cos_sim == 1.0
