"""Unit tests for the repetition and PII screens (operators/text.py).

The driver's documents table contains no PII-shaped strings and little
degenerate repetition, so the oracle check alone under-exercises these
operators; fixtures here pin the semantics (match counts, redaction
tokens, duplicate-gram arithmetic) on adversarial inputs.
"""

from __future__ import annotations

from kafka_streams_dexcom_spark.operators.text import pii_scan, repetition_stats


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repetition_stats_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> top ab=3/5,
            # distinct 2 -> dup 3/5; trigrams [aba, bab, aba, bab] ->
            # distinct 2 of 4 -> dup 2/4
            (1, "a b a b a b"),
            # all-distinct tokens: no duplicate grams at all
            (2, "one two three four five"),
            # below the 3-token floor: dropped
            (3, "x y"),
        ],
        "doc_id long, text string",
    )
    out = _rows(repetition_stats(df))
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 5
    assert out[1]["top_bigram_frac"] == 0.6
    assert out[1]["dup_bigram_frac"] == 0.6
    assert out[1]["dup_trigram_frac"] == 0.5
    assert out[2]["top_bigram_frac"] == 0.25
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["dup_trigram_frac"] == 0.0


def test_repetition_stats_whitespace_runs(spark):
    # double spaces must not create empty-token grams
    df = spark.createDataFrame(
        [(1, "a  b   a  b")], "doc_id long, text string"
    )
    out = _rows(repetition_stats(df))
    assert out[1]["n_bigrams"] == 3  # [a b, b a, a b]
    assert out[1]["dup_bigram_frac"] == 0.333333


def test_pii_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and alice@test.org now"),
            (2, "call 555-867-5309 or +1 212.555.1234 today"),
            (3, "host 192.168.0.1 clean 999.1.1.1 edge"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = _rows(pii_scan(df))
    assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 0
    assert out[1]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert out[2]["n_phone"] == 2
    assert "<PHONE>" in out[2]["redacted"]
    assert "555" not in out[2]["redacted"].replace("<PHONE>", "")
    # the simple byte-range pattern deliberately matches 999.1.1.1 too —
    # over-redaction is the right failure direction for a PII screen
    assert out[3]["n_ipv4"] == 2
    assert out[4] == {
        "doc_id": 4,
        "n_email": 0,
        "n_phone": 0,
        "n_ipv4": 0,
        "redacted": "nothing sensitive here",
    }


def test_pii_patterns_agree_with_duckdb(spark):
    """The oracle only sees zero-match rows on driver data; replay the
    fixture rows through DuckDB's RE2 to prove the dialects agree where
    it matters."""
    import duckdb

    from kafka_streams_dexcom_spark.operators.text import PII_PATTERNS

    rows = [
        (1, "mail bob@example.com and alice@test.org now"),
        (2, "call 555-867-5309 or +1 212.555.1234 today"),
        (3, "host 192.168.0.1 clean 999.1.1.1 edge"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spark_out = {
        r["doc_id"]: r.asDict() for r in pii_scan(df).collect()
    }
    con = duckdb.connect()
    for doc_id, text in rows:
        for name, (pat, _) in PII_PATTERNS.items():
            (n,) = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()
            assert n == spark_out[doc_id][f"n_{name}"], (doc_id, name)


def test_bm25_ranks_matching_docs_first(spark):
    """A document saturated with the query terms must outrank one with a
    single hit; a document with none is absent (score 0 filtered)."""
    from kafka_streams_dexcom_spark.operators.text import bm25_search

    rows = [
        (1, "join hash vector join hash vector join"),
        (2, "join table scan filter merge sort batch"),
        (3, "table scan filter merge sort batch row"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_search(df, ("join", "hash", "vector"), k=10).collect()
    ranked = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
    assert ranked[0] == 1
    assert 3 not in ranked  # no query term -> filtered out
    assert all(r.score > 0 for r in got)


def test_sequence_packing_bin_invariants(spark, sf_dir):
    """Bins are dense per language (0..max with no gaps), offsets lie in
    [0, context), and a doc's bin equals floor(prev-cumsum/context) —
    the concat-and-chunk contract."""
    from kafka_streams_dexcom_spark.queries.text import (
        PACK_CONTEXT,
        q_sequence_packing,
    )

    rows = q_sequence_packing(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        bins = set()
        for r in rs:
            assert 0 <= r.bin_offset < PACK_CONTEXT, (lang, r)
            assert r.bin_idx == cum // PACK_CONTEXT, (lang, r)
            assert r.bin_offset == cum % PACK_CONTEXT, (lang, r)
            bins.add(r.bin_idx)
            cum += r.n_tokens
        assert bins == set(range(max(bins) + 1))  # dense, no gaps


def test_bm25_freetext_ranks_and_batch_isolation(spark):
    """Tiny corpus with known term distribution: the doc matching all
    query terms outranks partial matches; each query in the batch is
    ranked independently; rare terms outweigh common ones (idf)."""
    from kafka_streams_dexcom_spark.operators.text import bm25_freetext

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana banana"),
            (3, "apple apple apple"),
            (4, "durian durian durian"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "banana"), (0, "cherry"), (1, "durian")],
        "query_id long, term string",
    )
    got = bm25_freetext(docs, q, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    # q0: doc 1 has banana+cherry (cherry is rare -> high idf), must win
    q0 = sorted(by_q[0], key=lambda r: r.rank)
    assert [r.doc_id for r in q0] == [1, 2]
    assert q0[0].score > q0[1].score
    # doc 3/4 match nothing for q0 -> absent
    assert {r.doc_id for r in by_q[0]} == {1, 2}
    # q1: only doc 4 matches
    assert [r.doc_id for r in by_q[1]] == [4]
    # ranks are 1-based contiguous per query
    assert [r.rank for r in q0] == [1, 2]


def test_inverted_index_postings(spark):
    """Postings carry exact tf and denormalized dl."""
    from kafka_streams_dexcom_spark.operators.text import (
        build_inverted_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b")], "doc_id long, text string"
    )
    post = {
        (r.term, r.doc_id): (r.tf, r.dl)
        for r in build_inverted_index(docs).collect()
    }
    assert post == {
        ("a", 1): (2, 3),
        ("b", 1): (1, 3),
        ("b", 2): (1, 1),
    }


def test_doc_cross_entropy_known_corpus(spark):
    """Two-doc corpus with hand-computable bigram LM: doc 1 = 'a b a b'
    (bigrams ab, ba, ab), doc 2 = 'a c' (bigram ac).
    LM: c(a,b)=2, c(a,c)=1 -> n_a=3; c(b,a)=1 -> n_b=1.
    doc1: -ln(2/3) -ln(1) -ln(2/3); doc2: -ln(1/3)."""
    import math

    from kafka_streams_dexcom_spark.operators.text import doc_cross_entropy

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in doc_cross_entropy(docs).collect()}
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 1
    u = lambda p: math.floor(-math.log(p) * 1e9)  # noqa: E731
    exp1 = ((u(2 / 3) + u(1.0) + u(2 / 3)) // 3) // 1000 / 1e6
    exp2 = (u(1 / 3) // 1) // 1000 / 1e6
    assert got[1].cross_entropy == exp1
    assert got[2].cross_entropy == exp2
    # corpus-typical text scores lower than the rare continuation
    assert got[1].cross_entropy < got[2].cross_entropy


def test_doc_chunks_udtf_matches_codegen(spark, sf_dir):
    """The Python UDTF must reproduce the Catalyst array pipeline
    row-for-row — the slow path is only acceptable because it is
    provably identical."""
    from kafka_streams_dexcom_spark.operators.text import (
        doc_chunks,
        doc_chunks_udtf,
    )
    from kafka_streams_dexcom_spark.sources.files import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    a = {tuple(r) for r in doc_chunks(d).collect()}
    b = {tuple(r) for r in doc_chunks_udtf(d, spark).collect()}
    assert a == b and len(a) > 0


def test_gopher_rules_each_rule_fires_independently(spark):
    """One adversarial doc per rule, plus a passing doc — pins every
    integer cross-multiplication threshold exactly at its boundary."""
    from kafka_streams_dexcom_spark.operators.text import gopher_rules

    passing = "the a of and is " + " ".join(f"word{i}" for i in range(45))
    short = "the a of and is just a few words here"  # < 50 words
    # 50 single-char words: mean word length 1 < 3
    tiny_words = "a " * 25 + "the " + "b " * 24
    symbols = passing + " " + "# " * 20  # hash per word ratio > 0.1
    numeric = "the a of and is " + " ".join(str(i) for i in range(60))
    nostops = " ".join(f"word{i}" for i in range(60))  # the/a/of... absent
    df = spark.createDataFrame(
        [
            (1, passing),
            (2, short),
            (3, tiny_words),
            (4, symbols),
            (5, numeric),
            (6, nostops),
            (7, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].keep == 1 and all(
        v == 1 for k, v in out[1].asDict().items() if k.startswith("r_")
    )
    assert out[2].r_word_count == 0 and out[2].keep == 0
    assert out[3].r_mean_word_len == 0 and out[3].keep == 0
    assert out[4].r_symbol_ratio == 0 and out[4].keep == 0
    # >20% pure-number words fail the alpha rule
    assert out[5].r_alpha_words == 0 and out[5].keep == 0
    assert out[6].r_stopwords == 0 and out[6].keep == 0
    # empty doc: ratio rules degenerate to pass, word count gates it out
    assert out[7].n_words == 0 and out[7].keep == 0
    assert out[7].r_word_count == 0 and out[7].r_mean_word_len == 1


def test_gopher_rules_boundary_values(spark):
    from kafka_streams_dexcom_spark.operators.text import gopher_rules

    # exactly 50 words of exactly mean length 3, with 2 distinct stops:
    # every inclusive lower bound holds with equality
    words = ["the", "a"] + ["abc"] * 48
    text_eq = " ".join(words)  # mean = (3+1+48*3)/50 = 2.96 -> FAILS
    # make mean exactly 3: the(3) + a(1) -> need sum 150: 48 words sum 146
    words2 = ["the", "a"] + ["abc"] * 46 + ["abcd", "abcd"]
    assert sum(len(w) for w in words2) == 150 and len(words2) == 50
    df = spark.createDataFrame(
        [(1, text_eq), (2, " ".join(words2))], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].r_mean_word_len == 0  # 2.96 < 3, exact arithmetic
    assert out[2].r_mean_word_len == 1 and out[2].keep == 1


def test_unimax_waterfill_known_allocation(spark):
    """Hand-computed waterfill: caps [11, 11, 55, 110] with budget 100
    -> sources 1,2 capped (11 each), theta = (100-22)/2 = 39 for the
    rest; invariant sum(alloc) <= budget, alloc <= cap everywhere."""
    from kafka_streams_dexcom_spark.queries.text import q_unimax_mix
    import kafka_streams_dexcom_spark.queries.text as qt
    from unittest import mock

    rows = []
    did = 0
    # src tokens: a=10, b=10, c=50, d=100 (words are 1 token each)
    for src, n in (("a", 10), ("b", 10), ("c", 50), ("d", 100)):
        rows.append((did, " ".join(["tok"] * n), "en", src, 0))
        did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with mock.patch.object(
        qt, "load_table", lambda _spark, _sf, _t: df
    ):
        out = {r.source: r for r in q_unimax_mix(spark, "unused").collect()}
    # budget = 170, caps = [11, 11, 55, 110]
    # k=1: 0 + 4*11 = 44 <= 170 capped; k=2: 11+3*11=44 capped
    # k=3: 22+2*55 = 132 <= 170 capped! k=4: 77+1*110=187 > 170 not
    # theta = (170-77)/1 = 93
    assert out["a"].capped == 1 and out["a"].alloc_tokens == 11
    assert out["b"].capped == 1 and out["b"].alloc_tokens == 11
    assert out["c"].capped == 1 and out["c"].alloc_tokens == 55
    assert out["d"].capped == 0 and out["d"].alloc_tokens == 93
    total = sum(r.alloc_tokens for r in out.values())
    assert total == 170  # exact budget exhaustion when waterfill binds
    for r in out.values():
        assert r.alloc_tokens <= r.cap_tokens
        assert abs(r.epochs - r.alloc_tokens / r.src_tokens) < 2e-6


def test_kneser_ney_hand_computed(spark):
    """Corpus 'a b a b c': c(ab)=2, c(ba)=1, c(bc)=1; hand-derived
    interpolated-KN values with d=0.75 — p(b|a)=0.75 exactly,
    p(a|b)=p(c|b)=0.375; observed mass per context stays under 1
    (the discount reserves mass for unseen continuations)."""
    from kafka_streams_dexcom_spark.operators.text import kneser_ney_lm

    df = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    out = {(r.w1, r.w2): r for r in kneser_ney_lm(df).collect()}
    assert set(out) == {("a", "b"), ("b", "a"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab.n_bigram, ab.n_w1, ab.n1_w1, ab.n1_w2, ab.n_tot) == (
        2, 2, 1, 1, 3,
    )
    assert ab.p_kn == 0.75  # (2-.75)/2 + .75*(1/2)*(1/3)
    assert out[("b", "a")].p_kn == 0.375  # (1-.75)/2 + .75*(2/2)*(1/3)
    assert out[("b", "c")].p_kn == 0.375
    # per-context observed mass < 1: discount mass left for unseen
    mass_b = out[("b", "a")].p_kn + out[("b", "c")].p_kn
    assert mass_b == 0.75


def test_char_entropy_known_values(spark):
    """Hand-derived: 'aaaa' -> 0 nats; 'ab' -> ln 2; 'abcd' -> ln 4;
    empty -> 0 (no 0/0); multibyte chars count as one symbol."""
    import math

    from kafka_streams_dexcom_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, ""), (5, "ÄÖ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    unit = lambda p: math.floor(p * math.log(1 / p) * 1e9)  # noqa: E731
    cut = lambda u: (u // 1000) / 1e6  # noqa: E731
    assert out[1].char_entropy == 0.0 and out[1].n_distinct_chars == 1
    assert out[2].char_entropy == cut(2 * unit(0.5))  # ln 2 truncated
    assert out[3].char_entropy == cut(4 * unit(0.25))  # ln 4 truncated
    assert out[4].n_chars_calc == 0 and out[4].char_entropy == 0.0
    assert out[5].n_chars_calc == 2  # chars, not utf-8 bytes
    assert out[5].char_entropy == cut(2 * unit(0.5))


def test_modified_kneser_ney_against_reference_impl(spark):
    """Independent pure-Python Chen-Goodman reimplementation over a
    corpus engineered to populate every count-of-count level (n1..n4
    all > 0), compared term-for-term; plus the normalization property:
    each context's OBSERVED mass + reserved mass stays within [0, 1]."""
    import math
    from collections import Counter

    from kafka_streams_dexcom_spark.operators.text import (
        kneser_ney_modified,
    )

    text = " ".join(
        ["a b"] * 4 + ["a c"] * 3 + ["a d"] * 2 + ["a e"]
        + ["b c"] * 2 + ["b d"] + ["c d"] * 4 + ["d e"] * 3
    )
    toks = text.split()
    bigrams = Counter(zip(toks, toks[1:]))
    n = Counter(bigrams.values())
    n1, n2, n3, n4 = n[1], n[2], n[3], n[4]
    assert min(n1, n2, n3, n4) > 0
    y = n1 / (n1 + 2.0 * n2)
    d1 = 1.0 - 2.0 * y * n2 / n1
    d2 = 2.0 - 3.0 * y * n3 / n2
    d3 = 3.0 - 4.0 * y * n4 / n3
    cw1 = Counter()
    nk_w1: dict = {}
    n1_w2 = Counter()
    for (w1, w2), c in bigrams.items():
        cw1[w1] += c
        lv = 1 if c == 1 else (2 if c == 2 else 3)
        nk_w1.setdefault(w1, Counter())[lv] += 1
        n1_w2[w2] += 1
    ntot = len(bigrams)

    def ref(w1, w2):
        c = bigrams[(w1, w2)]
        d = d1 if c == 1 else (d2 if c == 2 else d3)
        ks = nk_w1[w1]
        gamma = (d1 * ks[1] + d2 * ks[2] + d3 * ks[3]) / cw1[w1]
        p = (c - d) / cw1[w1] + gamma * (n1_w2[w2] / ntot)
        return math.floor(p * 1e6) / 1e6

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {(r.w1, r.w2): r.p_mkn for r in kneser_ney_modified(df).collect()}
    assert set(out) == set(bigrams)
    for key, got in out.items():
        assert abs(got - ref(*key)) < 2e-6, (key, got, ref(*key))
    # per-context mass check (observed mass <= 1; discounts reserve the rest)
    for w1 in cw1:
        mass = sum(p for (a, _b), p in out.items() if a == w1)
        assert 0.0 < mass <= 1.0 + 1e-9
