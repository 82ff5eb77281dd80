"""Vendored HTML→text main-content extraction — the markup-stripping
stage every crawl-to-training-corpus pipeline runs between the WARC
reader (sources/corpus.py:read_warc) and the quality gates
(operators/text.py:gopher_rules / char_entropy). Without it the Gopher
rules run on tag soup: symbol ratios explode, stopword densities
collapse, and the gates reject real content for its markup.

Algorithm (simplified jusText / Boilerpipe — Pomikálek 2011,
"Removing boilerplate and duplicate content from web corpora";
Kohlschütter et al., WSDM 2011):

1. drop <script>/<style> element bodies and HTML comments;
2. segment the page into text blocks at block-level tag boundaries
   (p, div, nav, li, …) — inline tags (<a>, <b>, <span>) do NOT split;
3. per block, compute the tag-stripped entity-decoded text and the
   characters of anchor (<a>…</a>) text — the LINK DENSITY signal both
   papers found dominant for navigation/boilerplate detection;
4. keep a block iff it has ≥ MIN_KEEP_CHARS of text AND link chars ≤
   1/LINK_DENSITY_INV of its text (exact integer cross-multiplication,
   the gopher_rules discipline — no float threshold can flip a block);
5. the document text is the kept blocks joined with newlines;
   n_blocks / n_kept / link_chars / block_chars quantify what was
   dropped (the no-silent-caps audit discipline).

Everything is scan-side SQL — split / transform / filter / aggregate
higher-order functions inside whole-stage codegen, zero shuffles, zero
Python; the extractor runs at read bandwidth on any corpus size. The
DuckDB twins of every expression are generated from the SAME pattern
constants so the oracle replays bit-for-bit.

Reference anchor: the reference ingests pre-extracted field values from
Kafka topics (StreamsFilterEgvs.java:27-38) and never sees markup; this
module is the front-door stage a file-based corpus needs before those
semantics apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- rules
MIN_KEEP_CHARS = 25  # jusText's "short block" floor, simplified
LINK_DENSITY_INV = 5  # keep iff LINK_DENSITY_INV·link_chars ≤ text_chars

# ------------------------------------------------------------- patterns
# RE2-safe (DuckDB) and Java-regex-safe (Spark): inline (?is) flags,
# non-greedy repeats, no lookaround, no backreferences.
SCRIPT_STYLE_RE = r"(?is)<(?:script|style)[^>]*>.*?</(?:script|style)>"
COMMENT_RE = r"(?s)<!--.*?-->"
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|nav|footer|header|main|section|article|aside|"
    r"h[1-6]|ul|ol|li|br|hr|table|thead|tbody|tr|td|th|blockquote|pre|"
    r"form)[^>]*>"
)
TAG_RE = r"<[^>]*>"
ANCHOR_RE = r"(?is)<a[^>]*>(.*?)</a>"
WS_RE = r"\s+"

# entity decode order matters: &amp; LAST, so "&amp;lt;" single-decodes
# to "&lt;" instead of double-decoding to "<"
ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "©"),
    ("&mdash;", "—"),
    ("&middot;", "·"),
    ("&amp;", "&"),
]


def _q(s: str, duck: bool = True) -> str:
    """SQL single-quoted string literal. Spark's SQL parser processes
    backslash escapes inside string literals (Hive rules), so regex
    patterns need their backslashes DOUBLED there; DuckDB follows the
    SQL standard and passes backslashes through untouched."""
    if not duck:
        s = s.replace("\\", "\\\\")
    return "'" + s.replace("'", "''") + "'"


def _rre(x: str, pat: str, rep: str, duck: bool) -> str:
    """regexp_replace: Spark replaces ALL matches; DuckDB needs the
    explicit 'g' flag (its default is first-match-only — a silent
    parity killer)."""
    flag = ", 'g'" if duck else ""
    return f"regexp_replace({x}, {_q(pat, duck)}, {_q(rep, duck)}{flag})"


def decode_entities_sql(x: str) -> str:
    """Nested replace() chain (same syntax both engines)."""
    for ent, ch in ENTITIES:
        x = f"replace({x}, {_q(ent)}, {_q(ch)})"
    return x


def clean_html_sql(x: str, duck: bool = False) -> str:
    """script/style bodies and comments out, before block segmentation
    (their content is code, not text — and a '<' inside a script would
    otherwise corrupt tag stripping)."""
    return _rre(_rre(x, SCRIPT_STYLE_RE, " ", duck), COMMENT_RE, " ", duck)


def _block_txt_sql(b: str, duck: bool) -> str:
    """One block's visible text: strip remaining (inline) tags, decode
    entities, collapse whitespace, trim."""
    return (
        "trim("
        + _rre(decode_entities_sql(_rre(b, TAG_RE, " ", duck)),
               WS_RE, " ", duck)
        + ")"
    )


def block_stats_sql(x: str, duck: bool = False) -> str:
    """The per-block stats list: array<struct{txt, lnk}> over the
    cleaned page ``x`` — txt as above, lnk = characters of anchor text
    (the link-density numerator)."""
    split_fn = "string_split_regex" if duck else "split"
    tf = "list_transform" if duck else "transform"
    mk = "struct_pack(txt := {t}, lnk := {k})" if duck else (
        "named_struct('txt', {t}, 'lnk', {k})"
    )
    anchors = f"regexp_extract_all(b, {_q(ANCHOR_RE, duck)}, 1)"
    per_anchor = f"{tf}({anchors}, m -> length({_block_txt_sql('m', duck)}))"
    if duck:
        lnk = f"CAST(coalesce(list_aggregate({per_anchor}, 'sum'), 0) AS BIGINT)"
    else:
        lnk = f"aggregate({per_anchor}, 0L, (a, v) -> a + v)"
    body = mk.format(t=_block_txt_sql("b", duck), k=lnk)
    return (
        f"{tf}({split_fn}({clean_html_sql(x, duck)},"
        f" {_q(BLOCK_SPLIT_RE, duck)}), b -> {body})"
    )


# keep rule over one stats struct `s` (identical text both engines)
_KEEP = (
    f"length(s.txt) >= {MIN_KEEP_CHARS}"
    f" AND {LINK_DENSITY_INV} * s.lnk <= length(s.txt)"
)


def extract_cols(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append the extraction columns to ``df``:

    - ``text``        kept blocks joined with newlines (main content)
    - ``n_blocks``    blocks with any visible text
    - ``n_kept``      blocks surviving the keep rule
    - ``link_chars``  anchor-text characters across ALL blocks
    - ``block_chars`` visible-text characters across ALL blocks
      (link_chars / block_chars is the page's link density — the
      boilerplate-heaviness signal downstream mixes gate on)

    Two projections: the first binds the stats array once (the
    gopher_rules __tk discipline — every output column else re-derives
    the full block scan), the second folds it. Catalyst collapses them
    into one codegen stage; the plan stays shuffle-free."""
    st = block_stats_sql(html_col)
    bound = df.withColumn("__st", F.expr(st))
    out = bound.select(
        *df.columns,
        F.expr(
            "array_join(transform(filter(__st, s -> "
            + _KEEP
            + "), s -> s.txt), '\n')"
        ).alias("text"),
        F.expr(
            "size(filter(__st, s -> length(s.txt) > 0))"
        ).cast("int").alias("n_blocks"),
        F.expr(f"size(filter(__st, s -> {_KEEP}))")
        .cast("int")
        .alias("n_kept"),
        F.expr("aggregate(__st, 0L, (a, s) -> a + s.lnk)").alias(
            "link_chars"
        ),
        F.expr(
            "aggregate(__st, 0L, (a, s) -> a + length(s.txt))"
        ).alias("block_chars"),
    )
    return out


def extract_cols_duck(html_expr: str) -> dict[str, str]:
    """DuckDB twins of every extract_cols output, as snippets over a
    column named ``__st`` the caller binds via
    ``{stats} AS __st`` (see block_stats_sql(..., duck=True))."""
    return {
        "stats": block_stats_sql(html_expr, duck=True),
        # coalesce: DuckDB's array_to_string is NULL on an empty list
        # where Spark's array_join is '' — a no-kept-blocks page must
        # extract to the empty string in both engines
        "text": (
            "coalesce(array_to_string(list_transform(list_filter(__st,"
            " s -> "
            + _KEEP
            + "), s -> s.txt), chr(10)), '')"
        ),
        "n_blocks": (
            "CAST(len(list_filter(__st, s -> length(s.txt) > 0)) AS INT)"
        ),
        "n_kept": f"CAST(len(list_filter(__st, s -> {_KEEP})) AS INT)",
        "link_chars": (
            "CAST(coalesce(list_aggregate(list_transform(__st,"
            " s -> s.lnk), 'sum'), 0) AS BIGINT)"
        ),
        "block_chars": (
            "CAST(coalesce(list_aggregate(list_transform(__st,"
            " s -> CAST(length(s.txt) AS BIGINT)), 'sum'), 0) AS BIGINT)"
        ),
    }


# ---------------------------------------------------------------- wrap
# The planted-page template the WARC-HTML fixture serves and the oracle
# rebuilds: ONE segment list renders to Python (fixture writer) and to
# SQL concatenation (oracle), so the bytes can never drift apart. The
# geometry exercises every extractor path: script/style bodies with
# markup-looking code, a comment, a link-only <nav>, a short <h1> with
# an entity, a link-only share button, the main <p> (the ONLY block
# that must survive), a related-links list, and a high-link-density
# footer with three more entities.
_TPL = [
    ("lit", "<html><head><title>Doc "),
    ("id",),
    ("lit", "</title><style>body{margin:0;font:14px serif}</style>"
            '<script type="text/javascript">var docId='),
    ("id",),
    ("lit", ';if(docId>0){track("pageview")}</script></head><body>'
            '<nav><a href="/">Home</a> <a href="/docs">Docs</a> '
            '<a href="/about">About</a></nav><header><h1>Doc '),
    ("id",),
    ("lit", " &mdash; "),
    ("src",),
    ("lit", "</h1></header><!-- crawl-id: "),
    ("id",),
    ("lit", ' --><div class="share"><a href="/share/'),
    ("id",),
    ("lit", '">Share</a></div><article><p>'),
    ("text",),
    ("lit", '</p></article><aside><ul><li><a href="/d/'),
    ("id1",),
    ("lit", '">Doc '),
    ("id1",),
    ("lit", '</a></li><li><a href="/d/'),
    ("id2",),
    ("lit", '">Doc '),
    ("id2",),
    ("lit", "</a></li></ul></aside><footer>&copy; 2026 "),
    ("src",),
    ("lit", '.example &mdash; <a href="/privacy">Privacy</a> &middot; '
            '<a href="/terms">Terms</a></footer></body></html>'),
]


def escape_html_py(text: str) -> str:
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def wrap_html_py(doc_id: int, source: str, text: str) -> str:
    """Render the planted page (fixture writer side)."""
    sub = {
        "id": str(doc_id),
        "id1": str(doc_id + 1),
        "id2": str(doc_id + 2),
        "src": source,
        "text": escape_html_py(text),
    }
    return "".join(
        seg[1] if seg[0] == "lit" else sub[seg[0]] for seg in _TPL
    )


def wrap_html_sql(
    id_col: str = "doc_id", src_col: str = "source", text_col: str = "text"
) -> str:
    """The SAME page as SQL concatenation (DuckDB oracle side)."""
    esc = text_col
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = f"replace({esc}, {_q(a)}, {_q(b)})"
    sub = {
        "id": f"CAST({id_col} AS VARCHAR)",
        "id1": f"CAST({id_col} + 1 AS VARCHAR)",
        "id2": f"CAST({id_col} + 2 AS VARCHAR)",
        "src": src_col,
        "text": esc,
    }
    return " || ".join(
        _q(seg[1]) if seg[0] == "lit" else sub[seg[0]] for seg in _TPL
    )
