"""Robots Exclusion Protocol (RFC 9309) parsing and matching — crawl
stage 0, shared by the batch robots_filter query, the compliance
report, and the unit suite (which drives THESE operators directly on
synthetic robots bodies, not a re-implementation).

Implemented REP semantics (the full RFC 9309 matching core):

- **Group parsing** (§2.2.1): consecutive ``User-agent:`` lines open ONE
  group (multi-agent groups); a ``User-agent:`` line after any non-UA
  line starts a new group. Non-rule lines (``Crawl-delay``, blanks,
  comments) are ignored but do not break a group here — deliberately
  lenient, as the RFC requires parsers to skip unknown lines.
- **Group selection** (§2.2.1): the crawler uses the group(s) naming its
  product token (case-insensitive equality), falling back to the ``*``
  group(s) only when no named group matches; multiple groups at the
  winning specificity COMBINE. A crawler with no matching group is
  allowed everywhere.
- **Rule matching** (§2.2.2–§2.2.3): ``*`` matches any char sequence,
  a trailing ``$`` anchors the end, everything else is literal prefix
  matching from the path start. The most specific match wins — most
  octets of the rule text, the measure Google's reference matcher uses
  for wildcard rules — and ``Allow`` wins length ties. No match ⇒
  allowed. An EMPTY rule value (``Disallow:`` alone = allow-all,
  §2.2.2) is dropped from the rule table rather than kept as a
  match-everything prefix.

Everything compiles to relational plans: the per-host rule table is
|hosts|-bounded (windows/aggregations over it are dimension-side work),
gets aggregated to one (host, rules-array) row, and is BROADCAST so the
per-document verdict is a scan-side fold over the doc's own host's
rules — zero fact-side shuffles, the plan a crawler's in-process
matcher has, expressed relationally. Rule patterns become anchored
regexes built scan-side char-by-char (bracket-quoting each literal
char), so Spark and the DuckDB oracle share one construction with no
engine-specific escape rules.

Reference anchor: the reference keys records by transmitter id
(StreamsFilterEgvs.java) and never sees addresses; a crawl front door
must gate on REP verdicts before fetch/ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Our crawler's product token (the agent every registered query
# matches as); tests pass their own.
CRAWLER_AGENT = "trainbot"

# RFC 9309 field names are CASE-INSENSITIVE and real bodies are
# commonly CRLF + lowercase ('user-agent:'); '(?i)' is valid in both
# Java regex (Spark) and RE2 (DuckDB), and the trailing [ \r]* strips
# the CR a split-on-\n leaves behind — without these, a lowercase CRLF
# body parses to ZERO rules and compliance fails open.
ROBOTS_RULE_RE = "(?i)^(Disallow|Allow): *(.*?)[ \r]*$"
ROBOTS_UA_RE = "(?i)^User-agent: *(.*?)[ \r]*$"


def rule_regex_sql(p: str, duck: bool = False) -> str:  # noqa: ARG001
    """Anchored regex for REP rule pattern column/expression ``p`` —
    one SQL string valid in BOTH engines: each literal char is
    bracket-quoted ``[c]`` (chars where brackets misbehave are
    chr(92)-escaped instead — no string-literal escape rules to
    diverge on), ``*`` becomes ``.*``, and a TRAILING ``$`` becomes
    the regex end anchor. The result always starts with ``^``: REP
    rules match from the first path byte."""
    c = f"substr({p}, i, 1)"
    # '[' is escaped, not bracket-quoted: Java opens a NESTED class on
    # an unescaped '[' inside a class (RE2 keeps it literal) — the one
    # divergence bracket-quoting alone wouldn't hide
    piece = (
        f"CASE WHEN {c} = '*' THEN '.*' "
        f"WHEN {c} = '$' AND i = length({p}) THEN '$' "
        f"WHEN {c} IN (']', '[', '^', '$') OR {c} = chr(92) "
        f"THEN concat(chr(92), {c}) "
        f"ELSE concat('[', {c}, ']') END"
    )
    if duck:
        return (
            f"concat('^', array_to_string(list_transform("
            f"range(1, length({p}) + 1), i -> {piece}), ''))"
        )
    return (
        f"concat('^', array_join(transform("
        f"sequence(1, length({p})), i -> {piece}), ''))"
    )


def robots_rules(
    robots: DataFrame,
    agent: str = CRAWLER_AGENT,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse (host, robots.txt body) rows into the SELECTED rule table
    for ``agent``: one row per (host, allow, pattern, rx, prio) from
    the most-specific matching group(s). Every step is |hosts|-bounded
    dimension-side work — the windows below never see document rows."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("idx", "ln"),
    ).select(
        "host",
        "idx",
        F.regexp_extract("ln", ROBOTS_UA_RE, 1).alias("ua"),
        F.regexp_extract("ln", ROBOTS_RULE_RE, 1).alias("kind"),
        F.regexp_extract("ln", ROBOTS_RULE_RE, 2).alias("patt"),
    )
    w = Window.partitionBy("host").orderBy("idx")
    is_ua = F.col("ua") != ""
    starter = is_ua & ~F.lag(is_ua, 1, False).over(w)
    grouped = lines.withColumn(
        "grp",
        F.sum(starter.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # group specificity: 2 = names our token (case-insensitive),
    # 1 = the '*' group, 0 = someone else's group
    glevel = (
        grouped.filter(is_ua)
        .select(
            "host",
            "grp",
            F.when(F.lower(F.col("ua")) == agent.lower(), 2)
            .when(F.col("ua") == "*", 1)
            .otherwise(0)
            .alias("lvl"),
        )
        .groupBy("host", "grp")
        .agg(F.max("lvl").alias("lvl"))
    )
    mx = (
        glevel.filter(F.col("lvl") > 0)
        .groupBy("host")
        .agg(F.max("lvl").alias("mx"))
    )
    return (
        grouped.filter((F.col("kind") != "") & (F.col("patt") != ""))
        .join(glevel, ["host", "grp"])
        .join(mx, "host")
        .filter(F.col("lvl") == F.col("mx"))
        .select(
            "host",
            (F.lower(F.col("kind")) == "allow").alias("allow"),
            F.col("patt").alias("pattern"),
            F.expr(rule_regex_sql("patt")).alias("rx"),
            F.length("patt").cast("int").alias("prio"),
        )
    )


def _verdict_fold() -> Column:
    """RFC 9309 most-specific-match fold over the broadcast rules
    array: among matching rules keep max (prio, allow, min pattern) —
    longest rule text wins, Allow wins length ties, lexicographic
    pattern breaks exact dead heats so the winner is deterministic."""
    take = "named_struct('allow', r.allow, 'pattern', r.pattern, 'prio', r.prio)"
    return F.expr(
        "aggregate(filter(rs, r -> path rlike r.rx), "
        "CAST(null AS struct<allow:boolean,pattern:string,prio:int>), "
        f"(acc, r) -> CASE WHEN acc IS NULL THEN {take} "
        "WHEN r.prio > acc.prio "
        "OR (r.prio = acc.prio AND r.allow AND NOT acc.allow) "
        "OR (r.prio = acc.prio AND r.allow = acc.allow "
        f"AND r.pattern < acc.pattern) THEN {take} ELSE acc END)"
    )


# Broadcast budget for the per-host rule table: one (host, rules-array)
# row per host, ~100 bytes + rule text per row. 2M hosts ≈ a few
# hundred MB serialized — near the practical executor-broadcast
# ceiling; beyond it the verdict switches to a shuffle hash join on
# host with IDENTICAL semantics (the fold runs after either join).
# Measured crossover in SCALE.md (round 12).
ROBOTS_BROADCAST_MAX_HOSTS = 2_000_000


def robots_verdicts(
    docs: DataFrame,
    robots: DataFrame,
    agent: str = CRAWLER_AGENT,
    max_broadcast_hosts: int = ROBOTS_BROADCAST_MAX_HOSTS,
) -> DataFrame:
    """REP verdict per document row (doc_id, host, path) against a
    (host, body) robots corpus: (doc_id, host, path, allowed,
    matched_rule). ``matched_rule`` is the winning rule's pattern text
    ('' when no rule matched ⇒ allowed). The rule table aggregates to
    one array row per host; when it fits the broadcast budget
    (``max_broadcast_hosts`` — counted on the |hosts|-bounded
    dimension side, a cheap action) it is BROADCAST and the verdict is
    a scan-side fold with zero fact-side shuffles. A rule table beyond
    the budget (10^8-host robots corpora exist) switches to a shuffle
    hash join on host — same fold, same verdicts, one fact-side
    shuffle; tests/test_robots_cdc.py pins plan-level divergence and
    row-level equality of the two paths."""
    by_host = robots_rules_by_host(robots, agent)
    use_broadcast = (
        max_broadcast_hosts > 0
        and by_host.count() <= max_broadcast_hosts
    )
    return apply_robots_verdicts(docs, by_host, broadcast=use_broadcast)


def robots_rules_by_host(
    robots: DataFrame, agent: str = CRAWLER_AGENT
) -> DataFrame:
    """The selected rule table aggregated to ONE (host, rules-array)
    row per host — the frozen dimension a crawl epoch broadcasts (the
    streaming CurationPipeline builds it once per robots snapshot and
    every epoch applies it; see apply_robots_verdicts)."""
    return robots_rules(robots, agent).groupBy("host").agg(
        F.collect_list(
            F.struct("allow", "pattern", "rx", "prio")
        ).alias("rs")
    )


def apply_robots_verdicts(
    docs: DataFrame, by_host: DataFrame, broadcast: bool = True
) -> DataFrame:
    """The verdict join+fold against an already-built per-host rule
    table: scan-side RFC 9309 fold after a broadcast (or shuffle) hash
    join — the half of robots_verdicts that runs per epoch when the
    rule table is a frozen artifact."""
    dim = F.broadcast(by_host) if broadcast else by_host
    return (
        docs.join(dim, "host", "left")
        .withColumn("best", _verdict_fold())
        .select(
            "doc_id",
            "host",
            "path",
            F.coalesce(F.col("best.allow"), F.lit(True)).alias("allowed"),
            F.coalesce(F.col("best.pattern"), F.lit("")).alias(
                "matched_rule"
            ),
        )
    )


def robots_rules_duck_sql(
    bodies_cte: str, agent: str = CRAWLER_AGENT
) -> str:
    """DuckDB twin of :func:`robots_rules` as a CTE chain: given a CTE
    named ``bodies`` (host, body) already defined as ``bodies_cte``,
    returns SQL text defining CTEs up to ``rep_rules`` (host, allow,
    pattern, rx, prio) — the oracle composes it with its own doc side.
    Same parse, same group selection, same regex construction."""
    return f"""
        bodies AS ({bodies_cte}),
        rep_lines AS (
            SELECT host, i AS idx,
                   regexp_extract(ls[i], '{ROBOTS_UA_RE}', 1) AS ua,
                   regexp_extract(ls[i], '{ROBOTS_RULE_RE}', 1) AS kind,
                   regexp_extract(ls[i], '{ROBOTS_RULE_RE}', 2) AS patt
            FROM (SELECT host, string_split(body, chr(10)) AS ls
                  FROM bodies),
                 UNNEST(range(1, len(ls) + 1)) r(i)
        ),
        rep_starters AS (
            SELECT *,
                   CASE WHEN ua != '' AND NOT coalesce(
                       lag(ua != '') OVER (
                           PARTITION BY host ORDER BY idx),
                       false) THEN 1 ELSE 0 END AS starter
            FROM rep_lines
        ),
        rep_grouped AS (
            SELECT *,
                   sum(starter) OVER (
                       PARTITION BY host ORDER BY idx
                       ROWS UNBOUNDED PRECEDING) AS grp
            FROM rep_starters
        ),
        rep_glevel AS (
            SELECT host, grp,
                   max(CASE WHEN lower(ua) = '{agent.lower()}' THEN 2
                            WHEN ua = '*' THEN 1 ELSE 0 END) AS lvl
            FROM rep_grouped WHERE ua != '' GROUP BY host, grp
        ),
        rep_mx AS (
            SELECT host, max(lvl) AS mx FROM rep_glevel
            WHERE lvl > 0 GROUP BY host
        ),
        rep_rules AS (
            SELECT g.host, lower(g.kind) = 'allow' AS allow,
                   g.patt AS pattern,
                   {rule_regex_sql('g.patt', duck=True)} AS rx,
                   length(g.patt) AS prio
            FROM rep_grouped g
            JOIN rep_glevel l ON l.host = g.host AND l.grp = g.grp
            JOIN rep_mx m ON m.host = g.host
            WHERE g.kind != '' AND g.patt != '' AND l.lvl = m.mx
        )
    """
