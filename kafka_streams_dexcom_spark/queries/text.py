"""Text-analysis queries over `documents` with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_dexcom_spark.operators import text as tx
from kafka_streams_dexcom_spark.sources.files import load_table

DUCK_HASH60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.text_stats(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.language_id(load_table(spark, sf_dir, "documents"), spark)


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_score(load_table(spark, sf_dir, "documents"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_counts(load_table(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.doc_fingerprint(load_table(spark, sf_dir, "documents"))


def _markers_values() -> str:
    rows = ", ".join(
        f"('{lang}', '{tok}')"
        for lang, toks in tx.LANG_MARKERS.items()
        for tok in toks
    )
    return f"markers(lang_code, marker) AS (VALUES {rows})"


_STOPS = ", ".join(f"'{t}'" for t in tx.LANG_MARKERS["en"])

QUERIES = {
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
}

ORACLES = {
    "text_stats": """
        SELECT doc_id,
               length(text) AS n_chars_calc,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(list_distinct(string_split_regex(text, '\\s+')))
                   AS BIGINT) AS n_distinct_tokens,
               round(CAST(list_reduce(list_transform(
                         string_split_regex(text, '\\s+'),
                         t -> CAST(length(t) AS BIGINT)), (a, b) -> a + b)
                     AS DOUBLE)
                     / CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE),
                     6) AS avg_token_len
        FROM documents
    """,
    "lang_id": f"""
        WITH {_markers_values()},
        toks AS (
            SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents
        ),
        hits AS (
            SELECT doc_id, lang_code, count(*) AS n_hits
            FROM toks JOIN markers ON tok = marker
            GROUP BY doc_id, lang_code
        ),
        best AS (
            SELECT doc_id, lang_code, n_hits FROM hits
            QUALIFY row_number() OVER (
                PARTITION BY doc_id ORDER BY n_hits DESC, lang_code ASC
            ) = 1
        )
        SELECT d.doc_id,
               COALESCE(b.lang_code, 'unknown') AS pred_lang,
               CAST(COALESCE(b.n_hits, 0) AS BIGINT) AS marker_hits
        FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
    """,
    "quality_score": f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(text, '\\s+') AS toks
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   CAST(len(toks) AS DOUBLE) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct,
                   CAST(len(list_filter(toks, x -> x IN ({_STOPS})))
                       AS DOUBLE) AS n_stop,
                   CAST(len(list_filter(toks,
                       x -> regexp_full_match(x, '[A-Za-z]+'))) AS DOUBLE)
                       AS n_alpha
            FROM t
        )
        SELECT doc_id,
               round(least(n_tokens / 100.0, 1.0), 6) AS len_score,
               round(n_distinct / n_tokens, 6) AS diversity,
               round(n_stop / n_tokens, 6) AS stopword_ratio,
               round(n_alpha / n_tokens, 6) AS alpha_ratio,
               round(0.3 * least(n_tokens / 100.0, 1.0)
                     + 0.3 * (n_distinct / n_tokens)
                     + 0.2 * (n_stop / n_tokens)
                     + 0.2 * (n_alpha / n_tokens), 6) AS quality_score
        FROM c
    """,
    "token_count": f"""
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                   AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}'))
                   AS BIGINT) AS n_bpe_tokens,
               round(CAST(length(text) AS DOUBLE)
                     / CAST(len(regexp_extract_all(text,
                           '{tx.BPE_ISH_PATTERN}')) AS DOUBLE), 6)
                   AS chars_per_token
        FROM documents
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               list_min(list_transform(range(1, length(text) - 6),
                   i -> {DUCK_HASH60.format(x='substring(text, i, 8)')}))
                   AS fingerprint,
               CAST(length(text) - 7 AS BIGINT) AS n_grams
        FROM documents
        WHERE length(text) >= 8
    """,
}
