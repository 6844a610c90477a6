"""Sequential reference-semantics crawl simulator (<200 LoC, auditable).

Plays the role the Go reference's single-threaded block loop plays
(cmd/onchain.go:75-111): a plain-Python, dict-based implementation of the
EXACT round semantics documented in streaming/rounds.py. The Spark engine
must reproduce its fetch log and seen set bit-for-bit at any parallelism
(SURVEY.md §5.2 golden crawl-order fixtures).

Shares only the pure per-row functions (canonicalize/resolve/extract) with
the engine; all orchestration here is independent sequential code."""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field

from layerg_crawler_v2_spark.functions.canon import canonicalize, host_of, resolve
from layerg_crawler_v2_spark.functions.extract import extract_outlinks
from layerg_crawler_v2_spark.operators.scheduler import round_start

SEED_UNITS = 1_000_000_000


@dataclass
class SimResult:
    fetch_log: list[tuple] = field(default_factory=list)  # (round, seq, url, host, depth, fetch_ts, bytes, status)
    seen: set[str] = field(default_factory=set)
    frontier: dict[str, tuple] = field(default_factory=dict)  # url -> (depth, priority_units)


def _robots_rule_matches(path: str, pattern: str) -> bool:
    """RFC 9309 §2.2.3: '*' = any octet sequence, trailing '$' = end
    anchor; plain patterns are prefixes (independent twin of
    operators/robots.py _wildcard_rx)."""
    if "*" in pattern or pattern.endswith("$"):
        rx = "^" + re.escape(pattern).replace(r"\*", ".*")
        if pattern.endswith("$"):
            rx = rx[: -len(re.escape("$"))] + "$"
        return re.search(rx, path) is not None
    return path.startswith(pattern)


def robots_allowed(url: str, host: str, robots: list[tuple] | None) -> bool:
    """(host, rule_type, pattern) rules; most pattern octets win, allow
    ties (RFC 9309 §2.2.2)."""
    if robots is None:
        return True
    rest = url.split("://", 1)[1]
    path = rest[rest.index("/"):] if "/" in rest else "/"
    best_len, best_allow = -1, True
    for h, rule_type, prefix in robots:
        if h != host or not _robots_rule_matches(path, prefix):
            continue
        if len(prefix) > best_len or (len(prefix) == best_len and rule_type == "allow"):
            best_len, best_allow = len(prefix), rule_type == "allow"
    return best_allow


def simulate(
    pages: dict[str, bytes],  # canonical url -> html
    seed_urls: list[str],
    rounds: int,
    delay_ms: dict[str, int] | None = None,
    max_parallel: dict[str, int] | None = None,
    default_delay_ms: int = 500,
    default_max_parallel: int = 8,
    robots: list[tuple] | None = None,
    allow_hosts: set[str] | None = None,
    block_hosts: set[str] | None = None,
) -> SimResult:
    res = SimResult()
    # seed prep: canonicalize, dedup (add-if-absent), filter
    for raw in seed_urls:
        c = canonicalize(raw)
        if c is None or c in res.frontier:
            continue
        h = host_of(c)
        if allow_hosts is not None and h not in allow_hosts:
            continue
        if block_hosts is not None and h in block_hosts:
            continue
        if not robots_allowed(c, h, robots):
            continue
        res.frontier[c] = (0, SEED_UNITS)
        res.seen.add(c)

    for r in range(rounds):
        # schedule: per host, top max_parallel by (priority desc, url asc)
        by_host: dict[str, list[str]] = {}
        for url in res.frontier:
            by_host.setdefault(host_of(url), []).append(url)
        picked: list[tuple] = []  # (fetch_ts, host, url, depth, units, slot)
        for h, urls in by_host.items():
            k = (max_parallel or {}).get(h, default_max_parallel)
            d = (delay_ms or {}).get(h, default_delay_ms)
            urls.sort(key=lambda u: (-res.frontier[u][1], u))
            for slot, u in enumerate(urls[:k]):
                ts = round_start(r) + datetime.timedelta(milliseconds=slot * d)
                depth, units = res.frontier[u]
                picked.append((ts, h, u, depth, units))
        picked.sort(key=lambda t: (t[0], t[1], t[2]))

        discovered: dict[str, tuple] = {}  # url -> [sum_units, min_depth]
        for seq, (ts, h, u, depth, units) in enumerate(picked):
            html = pages.get(u)
            status = "OK" if html is not None else "MISS"
            nbytes = len(html) if html is not None else 0
            res.fetch_log.append((r, seq, u, h, depth, ts, nbytes, status))
            del res.frontier[u]
            if html is None:
                continue
            hrefs = extract_outlinks(html)
            if not hrefs:
                continue
            share = units // len(hrefs)
            for href in hrefs:
                child = resolve(u, href)
                if child is None:
                    continue
                if child in discovered:
                    s, dmin = discovered[child]
                    discovered[child] = (s + share, min(dmin, depth + 1))
                else:
                    discovered[child] = (share, depth + 1)

        for url, (units, depth) in discovered.items():
            h = host_of(url)
            if allow_hosts is not None and h not in allow_hosts:
                continue
            if block_hosts is not None and h in block_hosts:
                continue
            if not robots_allowed(url, h, robots):
                continue
            if url in res.seen:
                continue
            res.frontier[url] = (depth, units)
            res.seen.add(url)
    return res
