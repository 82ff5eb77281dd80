"""HTML→text main-content extraction (functions/html.py): planted-page
edge cases, cross-engine (Spark vs DuckDB twin) agreement, template
parity between the Python fixture writer and the SQL oracle builder,
and the quality-gate composition — Gopher rules over extracted text
recover the clean-corpus verdicts that tag soup distorts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions import html as hx
from kafka_streams_dexcom_spark.operators import text as tx
from kafka_streams_dexcom_spark.sources.files import load_table
from tests.conftest import SF_DIR

LONG = "this block carries plenty of visible prose content to survive"
assert len(LONG) >= hx.MIN_KEEP_CHARS


def _extract(spark, html: str) -> dict:
    df = spark.createDataFrame([(html,)], "html string")
    return hx.extract_cols(df, "html").collect()[0].asDict()


def _extract_duck(html: str) -> dict:
    d = hx.extract_cols_duck("html")
    con = duckdb.connect()
    row = con.sql(
        f"""
        WITH h AS (SELECT ? AS html),
        b AS (SELECT {d["stats"]} AS __st FROM h)
        SELECT {d["text"]} AS text, {d["n_blocks"]} AS n_blocks,
               {d["n_kept"]} AS n_kept, {d["link_chars"]} AS link_chars,
               {d["block_chars"]} AS block_chars
        FROM b
        """,
        params=[html],
    ).fetchone()
    return dict(
        zip(["text", "n_blocks", "n_kept", "link_chars", "block_chars"], row)
    )


CASES = {
    # script/style bodies vanish even when they contain markup-looking
    # code and quotes; the comment too
    "script_style": (
        f"<script>if(a<b){{x('<p>')}}</script><style>p{{color:red}}"
        f"</style><!-- note --><p>{LONG}</p>",
        LONG,
    ),
    # link-only nav dropped, prose kept, high-link footer dropped
    "nav_footer": (
        f'<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        f"<p>{LONG}</p>"
        f'<footer>&copy; 2026 — <a href="/p">Privacy</a></footer>',
        LONG,
    ),
    # two long paragraphs both kept, newline-joined; short one dropped
    "multi_par": (
        f"<p>{LONG}</p><div>tiny</div><p>{LONG}</p>",
        f"{LONG}\n{LONG}",
    ),
    # entity decode happens once: &amp;lt; → &lt; (NOT <)
    "single_decode": (
        f"<p>{LONG} one &amp; two &lt;tag&gt; and literal &amp;lt; stays</p>",
        f"{LONG} one & two <tag> and literal &lt; stays",
    ),
    # inline tags do not split blocks; anchor text stays in the block
    # but a mostly-prose block survives the density rule
    "inline_anchor": (
        f'<p>{LONG} see <a href="/x">this link</a> for more</p>',
        f"{LONG} see this link for more",
    ),
    # no markup at all: the page is one block, kept if long enough
    "plain_text": (LONG, LONG),
    # empty body: nothing kept, empty text
    "empty": ("<p></p><div></div>", ""),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_planted_cases_both_engines(spark, name):
    html, want = CASES[name]
    got_s = _extract(spark, html)
    got_d = _extract_duck(html)
    assert got_s["text"] == want, (name, got_s["text"])
    for k in ("text", "n_blocks", "n_kept", "link_chars", "block_chars"):
        assert got_s[k] == got_d[k], (name, k, got_s[k], got_d[k])


def test_wrap_template_python_equals_sql(spark):
    """The fixture writer (Python) and the oracle builder (SQL) render
    byte-identical pages — including the text-escape path."""
    rows = [
        (3, "src0", "plain words only here"),
        (44, "src7", "tricky & escaped <b>bold</b> 2>1 and 1<2 text"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
    got = [
        r[0]
        for r in con.sql(
            f"SELECT {hx.wrap_html_sql()} FROM documents ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == [hx.wrap_html_py(*r) for r in rows]


def test_wrap_roundtrip_recovers_text(spark):
    """wrap→extract recovers the original text exactly for a sample of
    real corpus docs — the ground-truth anchor the warc_text_extract
    oracle's n_roundtrip_ok column rides on. The escape path is
    exercised too (planted & and <> doc)."""
    docs = [
        (int(r["doc_id"]), r["source"], r["text"])
        for r in load_table(spark, SF_DIR, "documents").limit(20).collect()
    ]
    docs.append((10**6, "srcx", "escape probe & friends <tag> 3>2 done ok"))
    df = spark.createDataFrame(
        [(i, hx.wrap_html_py(i, s, t), t) for i, s, t in docs],
        "doc_id long, html string, orig string",
    )
    out = hx.extract_cols(df, "html")
    bad = out.filter(F.col("text") != F.col("orig")).count()
    assert bad == 0
    # exactly one block (the main <p>) survives on every page
    assert out.filter(F.col("n_kept") != 1).count() == 0


def test_gate_composition_flips_on_markup(spark):
    """The pytest-pinned WHY, over REAL corpus docs: Gopher verdicts on
    tag soup diverge from the clean-text verdicts on a measurable
    fraction of the corpus (38/500 at sf0.001 — docs the gates would
    mis-route without the extraction stage), the markup inflates the
    word stream, and extract_cols→gopher_rules recovers the raw-text
    verdicts EXACTLY with zero glue (the extractor's output feeds the
    gate directly)."""
    docs = [
        (int(r["doc_id"]), r["source"], r["text"])
        for r in load_table(spark, SF_DIR, "documents").limit(150).collect()
    ]
    df = spark.createDataFrame(
        [(i, hx.wrap_html_py(i, s, t), t) for i, s, t in docs],
        "doc_id long, html string, text string",
    ).localCheckpoint()
    soup = tx.gopher_rules(
        df.select("doc_id", F.col("html").alias("text"))
    ).select(
        "doc_id",
        F.col("keep").alias("k_soup"),
        F.col("n_words").alias("w_soup"),
    )
    raw = tx.gopher_rules(df.select("doc_id", "text")).select(
        "doc_id",
        F.col("keep").alias("k_raw"),
        F.col("n_words").alias("w_raw"),
    )
    extracted = tx.gopher_rules(
        hx.extract_cols(df.select("doc_id", "html"), "html")
    ).select(
        "doc_id",
        F.col("keep").alias("k_ext"),
        F.col("n_words").alias("w_ext"),
    )
    j = soup.join(raw, "doc_id").join(extracted, "doc_id")
    agg = j.agg(
        F.sum((F.col("k_soup") != F.col("k_raw")).cast("int")).alias(
            "flips"
        ),
        F.sum(
            (
                (F.col("k_ext") != F.col("k_raw"))
                | (F.col("w_ext") != F.col("w_raw"))
            ).cast("int")
        ).alias("ext_divergence"),
        F.sum("w_soup").alias("ws"),
        F.sum("w_raw").alias("wr"),
    ).collect()[0]
    assert agg["flips"] > 0, "no verdict flipped on tag soup"
    assert agg["ws"] > agg["wr"], "markup did not inflate word mass"
    assert agg["ext_divergence"] == 0, (
        "extraction did not recover the clean verdicts"
    )
