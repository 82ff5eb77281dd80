"""Robots Exclusion Protocol verdicts (operators/robots.py — the SAME
plan the registered robots_filter runs, driven here on synthetic robots
bodies) and content-defined chunking (cdc_chunk_dedup): RFC 9309
wildcard/anchor matching, multi-group selection, the Allow tie-break,
and CDC's shift-invariance — the property fixed-size blocks lack."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators.dedup import (
    CDC_WINDOW,
    cdc_chunk_dedup,
)
from kafka_streams_dexcom_spark.operators.robots import (
    robots_verdicts,
    rule_regex_sql,
)


def _verdicts(spark, body, paths, agent="trainbot"):
    """Drive the PRODUCTION verdict plan (robots_verdicts: group parse,
    group selection, broadcast rule fold) over one synthetic robots
    body and a list of paths; returns {path: (allowed, matched_rule)}."""
    docs = spark.createDataFrame(
        [(i, "h.example", p) for i, p in enumerate(paths)],
        "doc_id long, host string, path string",
    )
    robots = spark.createDataFrame(
        [("h.example", body)], "host string, body string"
    )
    out = robots_verdicts(docs, robots, agent=agent).collect()
    by_id = {r["doc_id"]: (r["allowed"], r["matched_rule"]) for r in out}
    return {p: by_id[i] for i, p in enumerate(paths)}


def test_robots_wildcard_and_anchor(spark):
    """RFC 9309 §2.2.3: '*' matches any char sequence, trailing '$'
    anchors the end — the two special characters real robots bodies
    use constantly."""
    body = (
        "User-agent: *\n"
        "Disallow: /p/*/x\n"
        "Allow: /p/3$\n"
        "Disallow: /p/3"
    )
    v = _verdicts(
        spark,
        body,
        ["/p/1/x", "/p/22/x/y", "/p/x", "/p/3", "/p/31", "/q"],
    )
    assert v["/p/1/x"] == (False, "/p/*/x")
    assert v["/p/22/x/y"] == (False, "/p/*/x")  # '*' spans many chars
    assert v["/p/x"] == (True, "")  # '*' needs >= the literal parts
    # /p/3 matches Allow '/p/3$' (prio 5) over Disallow '/p/3' (prio 4)
    assert v["/p/3"] == (True, "/p/3$")
    # /p/31 is NOT end-anchored at /p/3 -> only the Disallow prefix hits
    assert v["/p/31"] == (False, "/p/3")
    assert v["/q"] == (True, "")


def test_robots_group_selection_specific_beats_star(spark):
    """§2.2.1: the group naming our token wins over '*'; other agents'
    groups are ignored entirely; a crawler with no matching group is
    allowed everywhere."""
    body = (
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: trainbot\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /p"
    )
    v = _verdicts(spark, body, ["/p/1", "/private/x", "/open"])
    # the '*' group's Disallow /p does NOT apply to trainbot
    assert v["/p/1"] == (True, "")
    assert v["/private/x"] == (False, "/private")
    assert v["/open"] == (True, "")
    # an agent with only the '*' group falls back to it (note /private
    # ALSO starts with the '*' group's '/p' prefix — blocked for it)
    v2 = _verdicts(
        spark, body, ["/p/1", "/private/x", "/open"], agent="otherbot"
    )
    assert v2["/p/1"] == (False, "/p")
    assert v2["/private/x"] == (False, "/p")
    assert v2["/open"] == (True, "")
    # an agent with NO matching group at all is allowed everywhere
    body_no_star = "User-agent: googlebot\nDisallow: /"
    v3 = _verdicts(spark, body_no_star, ["/p/1"], agent="trainbot")
    assert v3["/p/1"] == (True, "")


def test_robots_multi_agent_group_and_case(spark):
    """Consecutive User-agent lines open ONE group (multi-agent);
    token matching is case-insensitive."""
    body = (
        "User-agent: TrainBot\n"
        "User-agent: otherbot\n"
        "Disallow: /x\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /"
    )
    for agent in ("trainbot", "OTHERBOT"):
        v = _verdicts(spark, body, ["/x/1", "/y"], agent=agent)
        assert v["/x/1"] == (False, "/x")
        assert v["/y"] == (True, "")


def test_robots_allow_wins_priority_ties(spark):
    """§2.2.2: equal-octets rules tie-break to Allow."""
    body = (
        "User-agent: *\n"
        "Disallow: /dir/a\n"
        "Allow: /dir/*\n"  # same 6-octet priority on /dir/a...
        "Crawl-delay: 5"
    )
    v = _verdicts(spark, body, ["/dir/a", "/dir/ab"])
    assert v["/dir/a"] == (True, "/dir/*")
    assert v["/dir/ab"] == (True, "/dir/*")


def test_robots_lowercase_crlf_body(spark):
    """RFC 9309 field names are case-insensitive and real robots.txt
    bodies are commonly CRLF with lowercase fields ('user-agent:');
    before round 12 such a body parsed to ZERO groups/rules and every
    fetch was allowed — compliance failed open on exactly the corpus
    the docstrings advertise swapping in."""
    body = (
        "user-agent: googlebot\r\n"
        "disallow: /\r\n"
        "\r\n"
        "USER-AGENT: trainbot\r\n"
        "disallow: /x\r\n"
        "allow: /x/ok\r\n"
    )
    v = _verdicts(spark, body, ["/x/1", "/x/ok/2", "/y"])
    assert v["/x/1"] == (False, "/x")
    assert v["/x/ok/2"] == (True, "/x/ok")
    assert v["/y"] == (True, "")
    # the googlebot group still blocks everything for googlebot
    g = _verdicts(spark, body, ["/y"], agent="googlebot")
    assert g["/y"] == (False, "/")


def test_robots_shuffle_path_equals_broadcast(spark):
    """The non-broadcast fallback (rule table beyond the broadcast
    budget → shuffle hash join on host): forcing it with
    max_broadcast_hosts=0 must produce row-identical verdicts, and the
    two physical plans must actually diverge (broadcast join vs none)."""
    bodies = []
    docs = []
    for h in range(40):
        host = f"h{h}.example"
        bodies.append((host, f"User-agent: *\nDisallow: /p/{h % 7}"))
        for p in range(5):
            docs.append((h * 5 + p, host, f"/p/{p}"))
    docs_df = spark.createDataFrame(
        docs, "doc_id long, host string, path string"
    )
    robots_df = spark.createDataFrame(bodies, "host string, body string")
    bc = robots_verdicts(docs_df, robots_df)
    sh = robots_verdicts(docs_df, robots_df, max_broadcast_hosts=0)
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in sh._jdf.queryExecution().executedPlan().toString()
    rows_bc = sorted(map(tuple, bc.collect()))
    rows_sh = sorted(map(tuple, sh.collect()))
    assert rows_bc == rows_sh
    # and the verdicts themselves exercise both outcomes
    assert {r[3] for r in rows_bc} == {True, False}


def test_robots_empty_disallow_is_allow_all(spark):
    """§2.2.2: 'Disallow:' with an empty value means allow-all — it
    must NOT become a ''-prefix rule that startswith-matches every
    path and blocks the host."""
    body = "User-agent: *\nDisallow:\nDisallow: /q"
    v = _verdicts(spark, body, ["/p/1", "/q/1"])
    assert v["/p/1"] == (True, "")
    assert v["/q/1"] == (False, "/q")


def test_robots_fixture_geometry_end_to_end(spark):
    """The registered fixture's planted geometry under the REAL fold,
    for a host with digit d=3 (paths /p/<g>):
    - g ends in 3, g != 33  -> blocked by 'Disallow: /p/*3$' (prio 6)
    - g == 33               -> 'Allow: /p/33$' ties at 6 -> allowed
    - g == 3                -> wildcard Disallow (6) beats 'Allow:
                               /p/3' (4) -> blocked
    - otherwise             -> allowed
    and the googlebot/bingbot 'Disallow: /' group + the '*' group are
    both ignored for trainbot (selection, not combination)."""
    from kafka_streams_dexcom_spark.functions import url as ux

    body = (
        spark.createDataFrame([("src3.example",)], "host string")
        .select(F.expr(ux.robots_txt_sql("host")).alias("b"))
        .collect()[0]["b"]
    )
    v = _verdicts(
        spark, body, ["/p/3", "/p/13", "/p/33", "/p/30", "/p/7"]
    )
    assert v["/p/3"] == (False, "/p/*3$")
    assert v["/p/13"] == (False, "/p/*3$")
    assert v["/p/33"] == (True, "/p/33$")
    assert v["/p/30"] == (True, "/p/3")
    assert v["/p/7"] == (True, "")
    # googlebot sees its own group only: everything blocked
    vg = _verdicts(spark, body, ["/p/7"], agent="googlebot")
    assert vg["/p/7"] == (False, "/")


@pytest.mark.parametrize(
    "patt,matches,rejects",
    [
        ("/p/*/x", ["/p/1/x", "/p/a/b/x"], ["/p/x", "/q/1/x"]),
        ("/p/3$", ["/p/3"], ["/p/31", "/p/3/"]),
        ("/a.b", ["/a.b", "/a.bc"], ["/axb"]),  # '.' stays literal
        ("/c[d]", ["/c[d]"], ["/cd"]),  # brackets stay literal
    ],
)
def test_rule_regex_both_engines(spark, patt, matches, rejects):
    """rule_regex_sql builds ONE construction both engines evaluate
    identically — literal chars bracket-quoted, '*' -> '.*', trailing
    '$' -> anchor."""
    for path, want in [(p, True) for p in matches] + [
        (p, False) for p in rejects
    ]:
        got_s = (
            spark.createDataFrame([(patt, path)], "p string, x string")
            .select(
                F.expr(f"x rlike {rule_regex_sql('p')}").alias("m")
            )
            .collect()[0]["m"]
        )
        got_d = duckdb.sql(
            f"SELECT regexp_matches(x, {rule_regex_sql('p', duck=True)})"
            " FROM (SELECT ? AS p, ? AS x)",
            params=[patt, path],
        ).fetchone()[0]
        assert got_s is want, (patt, path, "spark", got_s)
        assert got_d is want, (patt, path, "duckdb", got_d)


def _chunk_hashes(spark, text):
    """The (ordered) chunk lengths for one text via the operator's own
    plan, reconstructed from per-doc output is lossy — so re-derive
    chunk hashes with a 2-doc trick: a doc is fully duplicated iff all
    its chunks are dups of an identical earlier doc."""
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return cdc_chunk_dedup(df).collect()[0]


def test_cdc_chunks_cover_text_exactly(spark):
    text = "the quick brown fox jumps over the lazy dog " * 30
    r = _chunk_hashes(spark, text.strip())
    assert r["chars_total"] == len(text.strip())
    assert r["n_chunks"] >= 2  # long text actually chunks


def test_cdc_identical_docs_fully_dedupe(spark):
    # aperiodic text: a periodic body would (correctly) dedupe chunks
    # WITHIN doc 0 too — here every chunk of doc 0 is unique, so the
    # canonical doc pays full storage and the copy pays zero
    text = " ".join(f"tok{i}num" for i in range(300))
    df = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in cdc_chunk_dedup(df).collect()}
    # doc 0 is canonical; doc 1 pays zero storage
    assert rows[1]["n_dup_chunks"] == rows[1]["n_chunks"]
    assert rows[1]["chars_dup"] == rows[1]["chars_total"]
    # the canonical doc pays (almost) full storage — tiny incidental
    # self-repeats (a short chunk like ' tok14' recurring before
    # tok14num and tok140num) are legitimate CDC storage wins
    assert rows[0]["n_dup_chunks"] <= rows[0]["n_chunks"] // 20
    assert rows[0]["chars_dup"] <= rows[0]["chars_total"] // 50


def test_cdc_shift_invariance(spark):
    """Prepending a prefix must leave MOST chunks shared with the
    original — the content-defined property. A fixed-block scheme
    would share zero blocks after a 3-char shift."""
    base = "one two three four five six seven eight nine ten " * 40
    shifted = "xx " + base
    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in cdc_chunk_dedup(df).collect()}
    shared = rows[1]["n_dup_chunks"]
    total = rows[1]["n_chunks"]
    # only the chunks up to the first content boundary after the edit
    # can differ; everything downstream re-syncs
    assert shared >= total - 3, (shared, total)
    assert rows[1]["chars_dup"] >= rows[1]["chars_total"] - len(
        "xx "
    ) - 3 * 200


def test_cdc_short_doc_single_chunk(spark):
    text = "tiny"
    assert len(text) < CDC_WINDOW
    r = _chunk_hashes(spark, text)
    assert r["n_chunks"] == 1
    assert r["chars_total"] == len(text)
    assert r["n_dup_chunks"] == 0
