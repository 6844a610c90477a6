"""robots.txt parsing, compilation, and allow/deny filtering.

Graft analog of the monitored-address allowlist — the reference drops any log
whose address is not in the per-chain allowlist before routing
(cmd/onchain.go:68-72, 95-100). Here the rule table is (host, rule_type,
path_prefix); semantics are longest-prefix-match, allow wins ties, no
matching rule = allowed (standard robots exclusion semantics).

Scale shape (north rule: "robots.txt allow/deny compiled to broadcast
tries"): `compile_robots` linearizes each host's prefix trie into ONE row per
host holding the rules sorted most-specific-first (most pattern octets,
allow before deny at equal length, RFC 9309 §2.2.2) — the flattened
broadcast form of the trie: the first matching element of that ordering IS
the winning rule. Patterns support the full RFC 9309 §2.2.3 syntax: plain
prefixes take a startswith fast path; '*' / trailing-'$' rules are
precompiled to anchored regexes at compile_robots time. `apply_robots` then
broadcast-joins one compiled row per host and picks the winner with
`F.get(F.filter(rules, ...), 0)` — a per-row array probe in whole-stage
codegen. The candidate set is never shuffled, never fanned out per rule, and
never aggregated: at a 10^10-URL frontier the robots stage costs zero
exchanges (the r3 formulation shuffled candidates×matching-rules into a
groupBy(url), which at scale was the round's widest exchange after the seen
anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _path_expr(url_col: str):
    """Path component ('/...') of a canonical absolute URL column.

    Anchors on the FIRST '://' (instr) — query strings can legitimately
    contain '://' after canonicalization, and a last-occurrence split would
    return the embedded URL's path instead of the real one."""
    authority_and_path = f"substr({url_col}, instr({url_col}, '://') + 3)"
    return F.expr(
        f"CASE WHEN instr({authority_and_path}, '/') = 0 THEN '/' "
        f"ELSE substr({authority_and_path}, instr({authority_and_path}, '/')) END"
    )


def _wildcard_rx(p):
    """RFC 9309 §2.2.3 pattern → anchored Java regex, for rules that use
    '*' (any octet sequence) or a trailing '$' (end-of-path anchor). NULL
    for plain prefixes — those keep the cheap startswith fast path.

    Translation: escape every regex metachar EXCEPT '*', then '*' → '.*';
    a '$' at the end of the raw pattern (escaped to '\\$' by the first
    step) becomes a real end anchor. A '$' anywhere else stays literal,
    per the RFC."""
    special = F.contains(p, F.lit("*")) | p.endswith("$")
    esc = F.regexp_replace(p, r"([.^$+?(){}\[\]|\\])", "\\\\$1")
    star = F.replace(esc, F.lit("*"), F.lit(".*"))
    n = F.length(star)
    body = F.when(
        p.endswith("$"), F.concat(F.substring(star, 1, n - 2), F.lit("$"))
    ).otherwise(star)
    return F.when(special, F.concat(F.lit("^"), body))


def compile_robots(robots: DataFrame) -> DataFrame:
    """(host, rule_type, path_prefix) rows → (host, rules) — one row per host.

    `rules` is array<struct<rule_type,path_prefix,rx>> sorted so the first
    match is the most-specific winner (RFC 9309 §2.2.2: most pattern
    octets) with allow beating deny on ties. `rx` is the precompiled
    anchored regex for '*'/'$' patterns (NULL = plain prefix, matched by
    startswith). Rule tables are tiny (a few rules per politeness-relevant
    host), so the groupBy here shuffles kilobytes; callers that run many
    rounds should compile once and cache (run_crawl does). Non-path carrier
    rows (crawl_delay / sitemap) are dropped here, so raw parse_robots_txt
    output is safe to compile directly."""
    robots = robots.filter(F.col("rule_type").isin("allow", "deny"))
    robots = robots.withColumn("rx", _wildcard_rx(F.col("path_prefix")))
    return robots.groupBy("host").agg(
        F.expr(
            """
            array_sort(
              collect_list(struct(rule_type, path_prefix, rx)),
              (l, r) -> CASE
                WHEN length(l.path_prefix) > length(r.path_prefix) THEN -1
                WHEN length(l.path_prefix) < length(r.path_prefix) THEN 1
                WHEN l.rule_type = 'allow' AND r.rule_type <> 'allow' THEN -1
                WHEN r.rule_type = 'allow' AND l.rule_type <> 'allow' THEN 1
                ELSE 0 END
            )
            """
        ).alias("rules")
    )


def apply_robots(
    candidates: DataFrame,
    robots: DataFrame | None,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Keep candidate URLs the robots rule table allows.

    Accepts either the raw (host, rule_type, path_prefix) table or a
    `compile_robots` output (detected by its `rules` column)."""
    if robots is None:
        return candidates
    compiled = robots if "rules" in robots.columns else compile_robots(robots)
    cand = candidates.withColumn("__path", _path_expr(url_col))
    joined = cand.join(
        F.broadcast(compiled.withColumnRenamed("host", host_col)),
        on=host_col,
        how="left",
    )
    # first match in the longest-first ordering = the winning rule; F.get is
    # out-of-bounds-null (ANSI-safe), so empty/absent rule sets fall through
    # to NULL = allowed
    # Plain prefixes match with startswith (the common case, cheap);
    # '*'/'$' patterns match their precompiled anchored regex via
    # regexp_like with a per-element pattern — rule arrays are a handful of
    # entries, so the non-foldable-regex cost is bounded per row.
    best = F.get(
        F.filter(
            F.col("rules"),
            lambda r: F.when(
                r["rx"].isNull(), F.col("__path").startswith(r["path_prefix"])
            ).otherwise(F.regexp_like(F.col("__path"), r["rx"])),
        ),
        F.lit(0),
    )
    allowed = joined.withColumn("__best", best).filter(
        F.col("__best").isNull() | (F.col("__best")["rule_type"] == "allow")
    )
    return allowed.select(*candidates.columns)


def parse_robots_txt(
    fetched: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """Parse raw robots.txt bodies into the engine's rule table.

    Input: one row per host with the fetched /robots.txt text. Output:
    (host, rule_type, path_prefix) rows — Allow/Disallow directives from
    every User-agent section matching `user_agent` or `*` — plus
    (host, 'crawl_delay', <millis-as-string>) rows for Crawl-delay
    directives (see `crawl_delays` to lift those into the hosts-config dim)
    and (host, 'sitemap', <url>) rows for Sitemap directives, which per RFC
    9309 §2.3/sitemaps.org live OUTSIDE user-agent groups and apply to every
    agent (see `sitemap_urls` → operators.sitemaps for the seed pipeline).

    Robots files are one small text per host, so this is a grouped Arrow
    pass (`mapInPandas`), not a per-row Python UDF in a hot path; the rest
    of the pipeline (compile → broadcast → probe) stays JVM-side.
    Section semantics follow RFC 9309: consecutive User-agent lines share
    the following rule group; the most specific matching agent's group
    applies, falling back to the '*' group.
    """
    import pandas as pd

    ua = user_agent.lower()
    out_schema = "host string, rule_type string, path_prefix string"

    def _parse_one(host: str, text: str) -> list[tuple[str, str, str]]:
        # group sections: list of (agents, rules, delay)
        sections: list[tuple[list[str], list[tuple[str, str]], float | None]] = []
        agents: list[str] = []
        rules: list[tuple[str, str]] = []
        delay: float | None = None
        sitemaps: list[str] = []
        in_agents = False
        for raw in (text or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "sitemap":
                # group-independent (applies to every agent), valid even
                # before the first User-agent line — must not reset or join
                # the current section
                if val:
                    sitemaps.append(val)
                continue
            if key == "user-agent":
                if not in_agents:
                    if agents:
                        sections.append((agents, rules, delay))
                    agents, rules, delay = [], [], None
                    in_agents = True
                agents.append(val.lower())
            else:
                in_agents = False
                if not agents:
                    continue  # rule before any User-agent line: ignored
                if key == "disallow" and val:
                    rules.append(("deny", val))
                elif key == "allow" and val:
                    rules.append(("allow", val))
                elif key == "crawl-delay":
                    try:
                        delay = float(val)
                    except ValueError:
                        pass
        if agents:
            sections.append((agents, rules, delay))
        # most specific matching agent wins; '*' is the fallback group
        best_len, best = -1, None
        for sec_agents, sec_rules, sec_delay in sections:
            for a in sec_agents:
                if a == "*":
                    if best_len < 0:
                        best_len, best = 0, (sec_rules, sec_delay)
                elif a in ua or ua in a:
                    if len(a) > best_len:
                        best_len, best = len(a), (sec_rules, sec_delay)
        sitemap_rows = [(host, "sitemap", u) for u in sitemaps]
        if best is None:
            return sitemap_rows
        sec_rules, sec_delay = best
        rows = [(host, rt, p) for rt, p in sec_rules]
        if sec_delay is not None:
            rows.append((host, "crawl_delay", str(int(sec_delay * 1000))))
        return rows + sitemap_rows

    def _gen(batches):
        for pdf in batches:
            rows: list[tuple[str, str, str]] = []
            for host, text in zip(pdf[host_col], pdf[body_col]):
                rows.extend(_parse_one(host, text))
            yield pd.DataFrame(
                rows, columns=["host", "rule_type", "path_prefix"]
            )

    return fetched.select(host_col, body_col).mapInPandas(_gen, out_schema)


def crawl_delays(rules: DataFrame) -> DataFrame:
    """(host, delay_ms) dim from parse_robots_txt's crawl_delay rows —
    unionable into the hosts-config table `select_for_fetch` consumes."""
    return rules.filter(F.col("rule_type") == "crawl_delay").select(
        "host",
        F.col("path_prefix").cast("int").alias("delay_ms"),
        F.lit(None).cast("int").alias("max_parallel"),
    )


def merge_host_config(hosts: DataFrame | None, rules: DataFrame) -> DataFrame:
    """Hosts-config dim = explicit (host, delay_ms, max_parallel) rows ∪
    robots Crawl-delay rows; explicit configuration wins per host (the
    operator's knob overrides the site's hint, matching the reference's
    chains-table precedence over defaults, cmd/crawler_cmd.go:84)."""
    delays = crawl_delays(rules)
    if hosts is None:
        return delays
    return hosts.unionByName(
        delays.join(hosts.select("host"), on="host", how="left_anti")
    )


def path_rules(rules: DataFrame) -> DataFrame:
    """Allow/deny subset of a parse_robots_txt output (drops crawl_delay /
    sitemap carrier rows) — the shape `compile_robots`/`apply_robots`
    expect."""
    return rules.filter(F.col("rule_type").isin("allow", "deny"))


def sitemap_urls(rules: DataFrame) -> DataFrame:
    """(host, url) sitemap advertisements from parse_robots_txt's output —
    feed through sources of sitemap bodies into
    operators.sitemaps.parse_sitemaps → seeds_from_sitemaps → add_seeds."""
    return rules.filter(F.col("rule_type") == "sitemap").select(
        "host", F.col("path_prefix").alias("url")
    ).distinct()
