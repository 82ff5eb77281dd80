"""URL canonicalization — RefinedWeb/CCNet's dedup *stage 1*: before
any content hashing, crawled documents dedupe by NORMALIZED URL,
because the same page is crawled many times under trivially-different
addresses (tracking parameters, default ports, fragments, www-prefixes,
case-variant hosts, trailing slashes). Penedo et al. 2023 (RefinedWeb
§3.2) run exactly this before MinHash; skipping it wastes the content
stage's budget on byte-identical fetches.

Normalization policy (deliberately conservative — canonicalization
must never merge DIFFERENT resources):

1. scheme and host lowercase (RFC 3986 §6.2.2.1 — case-insensitive);
2. leading ``userinfo@`` (RFC 3986 §3.2.1) then ``www.`` stripped from
   the host (the one host rewrite the crawl pipelines apply; anything
   more needs a site map) — the same order :func:`host_sql` applies,
   so the two agree on the host of RAW input;
3. default port stripped (``:443`` for https, ``:80`` for http —
   RFC 3986 §6.2.3);
4. fragment dropped (never sent to the server);
5. tracking query parameters removed (``utm_*``, ``fbclid``,
   ``gclid``, ``msclkid``) — parameter ORDER is preserved, not
   sorted: reordering is a semantics claim this policy doesn't make;
6. trailing slashes stripped from the path.

Everything is scan-side string/regex expressions — zero shuffles, zero
Python — with DuckDB twins generated from the same pattern constants
(the functions/html.py discipline), so the oracle replays
bit-for-bit.

Reference anchor: the reference keys records by transmitter id + system
time (StreamsFilterEgvs.java value model) and never sees addresses;
a crawl front door needs this stage before operators/dedup.py's
content hashing applies.
"""

from __future__ import annotations

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)="
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _q(s: str, duck: bool) -> str:
    if not duck:
        s = s.replace("\\", "\\\\")
    return "'" + s.replace("'", "''") + "'"


_HOSTPORT_RE = r"^([^/?#]*)"
_WWW_RE = r"^www\."
_P443_RE = r":443$"
_P80_RE = r":80$"
_STRIP_HOST_RE = r"^[^/?#]*"
_PATH_RE = r"^([^?#]*)"
_TRAIL_RE = r"/+$"
_QUERY_RE = r"^[^?#]*\?([^#]*)"


def canonical_url_sql(x: str, duck: bool = False) -> str:
    """The canonical form of URL column/expression ``x`` as one SQL
    expression (Spark by default, DuckDB twin with ``duck=True``)."""
    # regexp_replace: every pattern below is anchored (^ or $), so one
    # match is all there is — Spark's replace-all and DuckDB's
    # replace-first agree without the 'g' flag
    q = _q  # pre-quote every pattern: f-strings can't hold backslashes
    p_scheme, p_hp, p_www = q(_SCHEME_RE, duck), q(_HOSTPORT_RE, duck), q(_WWW_RE, duck)
    p_443, p_80 = q(_P443_RE, duck), q(_P80_RE, duck)
    p_strip, p_path = q(_STRIP_HOST_RE, duck), q(_PATH_RE, duck)
    p_trail, p_query = q(_TRAIL_RE, duck), q(_QUERY_RE, duck)
    scheme = f"lower(regexp_extract({x}, {p_scheme}, 1))"
    after = f"regexp_replace({x}, {p_scheme}, '')"
    hostport = f"lower(regexp_extract({after}, {p_hp}, 1))"
    # strip userinfo@ (RFC 3986 §3.2.1) BEFORE the www. strip — the
    # same order host_sql applies, so https://user@www.h/x and
    # https://h/x share one canonical URL (and one host)
    host_nouser = f"regexp_replace({hostport}, {q(_USERINFO_RE, duck)}, '')"
    host_nowww = f"regexp_replace({host_nouser}, {p_www}, '')"
    host = (
        f"CASE WHEN {scheme} = 'https' THEN "
        f"regexp_replace({host_nowww}, {p_443}, '') "
        f"WHEN {scheme} = 'http' THEN "
        f"regexp_replace({host_nowww}, {p_80}, '') "
        f"ELSE {host_nowww} END"
    )
    rest = f"regexp_replace({after}, {p_strip}, '')"
    path = (
        f"regexp_replace(regexp_extract({rest},"
        f" {p_path}, 1), {p_trail}, '')"
    )
    query = f"regexp_extract({rest}, {p_query}, 1)"
    split_fn = "string_split" if duck else "split"
    flt = "list_filter" if duck else "filter"
    match = (
        f"regexp_matches(p, {_q(TRACKING_PARAM_RE, duck)})"
        if duck
        else f"p RLIKE {_q(TRACKING_PARAM_RE, duck)}"
    )
    kept = (
        f"{flt}({split_fn}({query}, '&'), p -> p != '' AND NOT ({match}))"
    )
    if duck:
        q2 = f"coalesce(array_to_string({kept}, '&'), '')"
    else:
        q2 = f"array_join({kept}, '&')"
    return (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {q2} = '' THEN '' ELSE concat('?', {q2}) END)"
    )


# ------------------------------------------------------- planted fixture
# Messy-URL builder over (doc_id, source) — the in-plan fixture both
# the Spark query and the DuckDB oracle derive from the documents
# table (the multimodal family's payload discipline). Geometry: page
# key g = doc_id div 60, so the 3 docs of one source inside a 60-id
# stripe share a page; the variant rotates with doc_id div 20, so the
# sharers arrive under DIFFERENT messy spellings. Variant 3 keeps a
# real (non-tracking) ?ref=a parameter — its canonical form is a
# DISTINCT resource, pinning that canonicalization only strips what
# the policy names (an over-eager dedup that dropped all params would
# merge it and fail the hash).
def messy_url_sql(duck: bool = False, source_expr: str = "source") -> str:
    """``source_expr`` names the SQL expression for the doc's source
    token (default: the documents column; the streaming pipeline test
    reconstructs it from doc_id because parsed shard members carry only
    (doc_id, text) — same strings either way)."""
    g = "CAST(doc_id // 60 AS STRING)" if duck else (
        "CAST(doc_id div 60 AS STRING)"
    )
    v = "((doc_id // 20) % 5)" if duck else "((doc_id div 20) % 5)"
    s = source_expr
    return f"""CASE {v}
        WHEN 0 THEN concat('https://', upper({s}), '.EXAMPLE/p/', {g})
        WHEN 1 THEN concat('https://', {s}, '.example:443/p/', {g},
                           '?utm_source=feed&utm_campaign=spring')
        WHEN 2 THEN concat('https://', {s}, '.example/p/', {g},
                           '/#frag-2')
        WHEN 3 THEN concat('https://', {s}, '.example/p/', {g},
                           '?ref=a&utm_medium=email')
        ELSE concat('https://www.', {s}, '.example/p/', {g},
                    '?gclid=XYZ')
    END"""


_HOST_OF_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_USERINFO_RE = r"^[^@]*@"


def host_sql(x: str, duck: bool = False) -> str:
    """The registrable host of URL column/expression ``x`` — the
    grouping key for every per-domain curation stage (RefinedWeb's
    line-wise corrections and per-domain caps key on it). Lowercased,
    with a leading ``userinfo@`` (RFC 3986 §3.2.1) and the ``www.``
    prefix stripped, and the DEFAULT port stripped scheme-conditionally
    (``:443`` only under https, ``:80`` only under http — the same rule
    as :func:`canonical_url_sql`, so the two agree on RAW input too;
    an unconditional strip would collapse e.g. ``http://h:443/x``,
    a NON-default port, into ``h``)."""
    q = _q
    scheme = f"lower(regexp_extract({x}, {q(_SCHEME_RE, duck)}, 1))"
    auth = f"lower(regexp_extract({x}, {q(_HOST_OF_RE, duck)}, 1))"
    nouser = f"regexp_replace({auth}, {q(_USERINFO_RE, duck)}, '')"
    nowww = f"regexp_replace({nouser}, {q(_WWW_RE, duck)}, '')"
    return (
        f"CASE WHEN {scheme} = 'https' THEN "
        f"regexp_replace({nowww}, {q(_P443_RE, duck)}, '') "
        f"WHEN {scheme} = 'http' THEN "
        f"regexp_replace({nowww}, {q(_P80_RE, duck)}, '') "
        f"ELSE {nowww} END"
    )


# Planted page-chrome fixture for the per-domain line pass: every doc
# of a host renders under the same 8-token navigation header (the
# chrome RefinedWeb's line-wise corrections exist to strip), followed
# by the document's own text. 8 tokens = exactly one line at
# operators/text.py LINE_WORDS granularity, so the header occupies
# line 0 and leaves the body's line boundaries unshifted — body lines
# of exact-duplicate docs stay comparable too. Identical string
# expression in both engines (the messy_url_sql discipline).
def page_text_sql(duck: bool = False) -> str:  # noqa: ARG001 - same SQL
    return (
        "concat('nav ', source, "
        "' home about contact privacy terms login ', text)"
    )


_PATH_OF_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?"


def path_sql(x: str, duck: bool = False) -> str:
    """The path component of URL column/expression ``x`` ('' for a bare
    host) — what robots.txt rules match against."""
    return f"regexp_extract({x}, {_q(_PATH_OF_RE, duck)}, 1)"


# Planted robots.txt fixture: every host serves a REAL multi-group
# Robots Exclusion Protocol body (RFC 9309) derived from the host's own
# number d = host-number % 10, exercising the full parse surface:
#
#   User-agent: googlebot      <- multi-agent group (two UA lines, one
#   User-agent: bingbot           group); blocks EVERYTHING — selected
#   Disallow: /                   only by those agents, so a parser that
#                                 combined all groups blocks the corpus
#   User-agent: trainbot       <- OUR crawler's group (specific beats *)
#   Disallow: /p/*<d>$         <- §2.2.3 '*' wildcard + '$' end anchor:
#   Allow: /p/<d>                 blocks paths ENDING in d (prio 6)
#   Allow: /p/<d><d>$          <- ties the Disallow at prio 6 on path
#                                 /p/<dd> — Allow wins length ties
#   User-agent: *              <- generic group, the old prefix rules;
#   Disallow: /p/<d>              IGNORED for trainbot (a selector that
#   Allow: /p/<d>0                fell through to * flips verdicts)
#   Crawl-delay: 5             <- non-rule line the parser must skip
#
# Pages live at /p/<g>; for trainbot, g ENDING in digit d is blocked
# except g == dd (the Allow tie), so wildcard matching, anchor
# semantics, group selection, AND the Allow tie-break all fire at
# sf0.01 (g ranges well past 99). Identical string in both engines.
def robots_txt_sql(host: str, duck: bool = False) -> str:
    d = (
        f"CAST(coalesce(CAST(nullif(regexp_extract({host}, '([0-9]+)', 1),"
        f" '') AS INT) % 10, 0) AS STRING)"
    )
    nl = "chr(10)"
    return (
        f"concat('User-agent: googlebot', {nl}, "
        f"'User-agent: bingbot', {nl}, "
        f"'Disallow: /', {nl}, "
        f"'', {nl}, "
        f"'User-agent: trainbot', {nl}, "
        f"'Disallow: /p/*', {d}, '$', {nl}, "
        f"'Allow: /p/', {d}, {nl}, "
        f"'Allow: /p/', {d}, {d}, '$', {nl}, "
        f"'', {nl}, "
        f"'User-agent: *', {nl}, "
        f"'Disallow: /p/', {d}, {nl}, "
        f"'Allow: /p/', {d}, '0', {nl}, "
        f"'Crawl-delay: 5')"
    )
