"""Unit tests for the round-3 operators: blocked edit-distance entity
resolution (fuzzy_blocked_pairs) and exact duplicated-span exposure
(dup_span_fraction) — hand-built fixtures with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.dedup import fuzzy_blocked_pairs
from kafka_streams_dexcom_spark.operators.text import dup_span_fraction


def test_fuzzy_blocked_pairs_basic(spark):
    rows = [
        # block 1: "smith"/"smyth" dist 1, "smith"/"stone" dist 3
        (1, "smith", 10),
        (2, "smyth", 10),
        (3, "stone", 10),
        # block 2: exact duplicate names -> dist 0
        (4, "jones", 20),
        (5, "jones", 20),
        # different blocks: never compared even though identical
        (6, "smith", 30),
    ]
    df = spark.createDataFrame(rows, "rid int, name string, blk int")
    out = fuzzy_blocked_pairs(
        df, ["blk"], id_col="rid", text_col="name", max_dist=1
    ).collect()
    got = {(r.rid_a, r.rid_b): r.dist for r in out}
    assert got == {(1, 2): 1, (4, 5): 0}


def test_fuzzy_blocked_pairs_bucket_cap(spark):
    # a hot block of 5 identical names is dropped when max_bucket=4
    rows = [(i, "dup", 1) for i in range(5)] + [(10, "aa", 2), (11, "ab", 2)]
    df = spark.createDataFrame(rows, "rid int, name string, blk int")
    out = fuzzy_blocked_pairs(
        df, ["blk"], id_col="rid", text_col="name", max_dist=1, max_bucket=4
    ).collect()
    assert {(r.rid_a, r.rid_b) for r in out} == {(10, 11)}


def test_fuzzy_pairs_id_ordered(spark):
    # emitted pairs are id-ascending regardless of input order
    rows = [(9, "x", 1), (2, "x", 1), (5, "x", 1)]
    df = spark.createDataFrame(rows, "rid int, name string, blk int")
    out = fuzzy_blocked_pairs(
        df, ["blk"], id_col="rid", text_col="name", max_dist=0
    ).collect()
    assert all(r.rid_a < r.rid_b for r in out)
    assert len(out) == 3


def test_dup_span_fraction_known(spark):
    # k=3: doc 1 and doc 2 share the span "a b c d" -> 2 shared 3-grams
    rows = [
        (1, "a b c d x y"),  # grams: abc bcd cdx dxy  (4)
        (2, "z a b c d"),    # grams: zab abc bcd cd?  -> zab abc bcd  (3)
        (3, "p q r s"),      # grams: pqr qrs          (2) none shared
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dup_span_fraction(df, k=3).collect()}
    assert out[1].n_grams == 4 and out[1].dup_grams == 2
    assert out[2].n_grams == 3 and out[2].dup_grams == 2
    assert out[3].n_grams == 2 and out[3].dup_grams == 0
    assert abs(out[1].dup_fraction - 0.5) < 1e-9
    assert out[3].dup_fraction == 0.0


def test_dup_span_fraction_repeat_within_doc_not_dup(spark):
    # a gram repeated only WITHIN one doc is not corpus-duplicated
    rows = [(1, "a b a b a b"), (2, "c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dup_span_fraction(df, k=2).collect()}
    assert out[1].dup_grams == 0
    # short docs below k are excluded entirely
    rows2 = [(1, "a"), (2, "a b c")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got = {r.doc_id for r in dup_span_fraction(df2, k=2).collect()}
    assert got == {2}


def test_pigeonhole_matches_naive(spark):
    from kafka_streams_dexcom_spark.operators.dedup import (
        fuzzy_pigeonhole_pairs,
    )

    # names differing in 0/1/2 positions at equal length, plus a
    # different-length name (out of scope via the length block key)
    rows = [
        (1, "abcdef", 1),
        (2, "abcxef", 1),   # dist 1 vs 1
        (3, "abxxef", 1),   # dist 2 vs 1, dist 1 vs 2
        (4, "abcdef", 1),   # dist 0 vs 1
        (5, "abcdefg", 1),  # longer: excluded by length key
        (6, "qbcdef", 1),   # dist 1 vs 1/4
    ]
    df = spark.createDataFrame(rows, "rid int, name string, blk int").select(
        "rid", "name", "blk", F.length("name").alias("nlen")
    )
    naive = {
        (r.rid_a, r.rid_b, r.dist)
        for r in fuzzy_blocked_pairs(
            df, ["blk", "nlen"], "rid", "name", max_dist=1
        ).collect()
    }
    pigeon = {
        (r.rid_a, r.rid_b, r.dist)
        for r in fuzzy_pigeonhole_pairs(
            df, ["blk", "nlen"], "rid", "name"
        ).collect()
    }
    assert pigeon == naive
    assert (1, 2, 1) in pigeon and (1, 4, 0) in pigeon and (2, 3, 1) in pigeon
    assert not any(a == 5 or b == 5 for a, b, _ in pigeon)


def test_pigeonhole_lossless_random_batch(spark):
    """Randomized (seeded) equivalence: on 300 short strings over a tiny
    alphabet — dense in edit space, so dist-0/1/2 pairs all occur —
    the pigeonhole candidate set must reproduce the naive within-block
    pairs exactly."""
    import random

    from kafka_streams_dexcom_spark.operators.dedup import (
        fuzzy_pigeonhole_pairs,
    )

    rng = random.Random(42)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.choice([4, 5]))), 1)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "rid int, name string, blk int").select(
        "rid", "name", "blk", F.length("name").alias("nlen")
    )
    naive = {
        (r.rid_a, r.rid_b, r.dist)
        for r in fuzzy_blocked_pairs(
            df, ["blk", "nlen"], "rid", "name", max_dist=1
        ).collect()
    }
    pigeon = {
        (r.rid_a, r.rid_b, r.dist)
        for r in fuzzy_pigeonhole_pairs(
            df, ["blk", "nlen"], "rid", "name"
        ).collect()
    }
    assert pigeon == naive
    assert len(naive) > 100  # the fixture actually exercises matches


def test_maximal_dup_spans_seed_and_extend(spark):
    """ExactSubstr seed-and-extend (operators/text.py:
    maximal_dup_spans): a 10-token shared run reports as ONE maximal
    span (not 8 fixed windows), offsets are exact under different
    start positions, and a within-document repeat is found on its own
    diagonal."""
    from kafka_streams_dexcom_spark.operators.text import maximal_dup_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x1 x2 a b c d e f g h i j y1 y2"),
            (3, "p q r s t u p q r s t u"),
        ],
        "doc_id long, text string",
    )
    got = {tuple(r) for r in maximal_dup_spans(df, k=3).collect()}
    assert got == {
        (1, 1, 2, 3, 10),  # the full shared run, merged and maximal
        (3, 1, 3, 7, 6),   # self-repeat: one diagonal-6 run
    }


def test_maximal_dup_spans_hot_gram_cap(spark):
    """The hot-gram cap drops seeds from grams above max_occ (bounded
    pair volume, the LSH_MAX_BUCKET trade); a non-binding cap is
    exact."""
    from kafka_streams_dexcom_spark.operators.text import maximal_dup_spans

    df = spark.createDataFrame(
        [
            (4, "m n o k4a k4b"),
            (5, "m n o k5a k5b"),
            (6, "m n o k6a k6b"),
        ],
        "doc_id long, text string",
    )
    # 'm n o' occurs 3 times: capped at 2 -> no seeds survive
    assert maximal_dup_spans(df, k=3, max_occ=2).count() == 0
    want = {(4, 1, 5, 1, 3), (4, 1, 6, 1, 3), (5, 1, 6, 1, 3)}
    got = {tuple(r) for r in maximal_dup_spans(df, k=3, max_occ=None).collect()}
    assert got == want
    got3 = {tuple(r) for r in maximal_dup_spans(df, k=3, max_occ=3).collect()}
    assert got3 == want
