"""URL canonicalization: RFC 3986 normalization + SURT host reversal.

This is the graft analog of the reference's key normalization — addresses are
lowercased before every compare/store (cmd/onchain.go:70,98;
cmd/crawler_cmd.go:101; cmd/handler_registry.go:39-45) and event signatures are
hashed to a fixed-width dispatch key (generated/eventhandlers/
event_handlers.go:264-267). Here the normalize step is the full RFC 3986
algorithm and the dispatch key is xxhash64(canonical_url) computed JVM-side
with the native `F.xxhash64` (no Python in that hot path).

All per-row Python runs inside vectorized pandas/Arrow UDFs per the input_hint
mandate. The core `canonicalize` is a pure deterministic function so goldens
hold under any partitioning.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443"}
# RFC 3986 §2.3 unreserved characters
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*):(.*)$", re.S)


def _norm_pct(s: str) -> str:
    """Decode %XX for unreserved chars, uppercase remaining hex (RFC 3986 §6.2.2.2)."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    # "/a/.." -> "/" ; "a/.." -> ""
    if norm == "":
        norm = "/" if path.startswith("/") else ""
    return norm


def canonicalize(url: str) -> str | None:
    """Canonical form of an absolute http(s) URL; None if unparseable/unsupported.

    Steps: lowercase scheme+host, strip fragment, drop default port, normalize
    percent-encoding, remove dot segments, empty path -> "/", sort query
    parameters bytewise (stable dedup of param-order variants).
    """
    if not url:
        return None
    url = url.strip()
    m = _SCHEME_RE.match(url)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = m.group(2)
    if scheme not in ("http", "https") or not rest.startswith("//"):
        return None
    rest = rest[2:]
    # split off fragment first (dropped), then query, then path
    rest = rest.split("#", 1)[0]
    if "?" in rest:
        rest, query = rest.split("?", 1)
    else:
        query = None
    if "/" in rest:
        netloc, path = rest.split("/", 1)
        path = "/" + path
    else:
        netloc, path = rest, ""
    # userinfo not supported for crawl URLs
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if ":" in netloc:
        host, port = netloc.rsplit(":", 1)
        if port == _DEFAULT_PORTS.get(scheme) or port == "":
            port = None
    else:
        host, port = netloc, None
    host = host.lower().rstrip(".")
    if not host:
        return None
    path = _norm_pct(_remove_dot_segments(path)) or "/"
    out = f"{scheme}://{host}"
    if port:
        out += f":{port}"
    out += path
    if query is not None and query != "":
        params = sorted(_norm_pct(query).split("&"))
        out += "?" + "&".join(params)
    return out


def surt(canonical_url: str | None) -> str | None:
    """SURT form of an already-canonical URL: `com,example)/path?q`."""
    if canonical_url is None:
        return None
    m = _SCHEME_RE.match(canonical_url)
    if not m:
        return None
    rest = m.group(2)[2:]
    if "/" in rest:
        netloc, path = rest.split("/", 1)
        path = "/" + path
    else:
        netloc, path = rest, "/"
    if ":" in netloc:
        host, port = netloc.rsplit(":", 1)
        netloc = host + ":" + port
        rev = ",".join(reversed(host.split("."))) + ":" + port
    else:
        rev = ",".join(reversed(netloc.split(".")))
    return rev + ")" + path


def host_of(canonical_url: str | None) -> str | None:
    if canonical_url is None:
        return None
    m = _SCHEME_RE.match(canonical_url)
    if not m or not m.group(2).startswith("//"):
        return None
    netloc = m.group(2)[2:].split("/", 1)[0]
    return netloc


def resolve(base: str, href: str) -> str | None:
    """Resolve an href against a base URL (RFC 3986 §5), then canonicalize."""
    if not href:
        return None
    href = href.strip()
    if _SCHEME_RE.match(href):
        return canonicalize(href)
    base_c = canonicalize(base)
    if base_c is None:
        return None
    m = _SCHEME_RE.match(base_c)
    scheme, rest = m.group(1), m.group(2)[2:]
    if "/" in rest:
        netloc, bpath = rest.split("/", 1)
        bpath = "/" + bpath
    else:
        netloc, bpath = rest, "/"
    if href.startswith("//"):
        return canonicalize(scheme + ":" + href)
    if href.startswith("/"):
        return canonicalize(f"{scheme}://{netloc}{href}")
    # relative path
    base_dir = bpath.rsplit("/", 1)[0]
    return canonicalize(f"{scheme}://{netloc}{base_dir}/{href}")


# --- vectorized Spark surface -------------------------------------------------

def resolve_fast_col(base_col: Column | str, href_col: Column | str) -> Column:
    """JVM fast path for `resolve(base, href)` — NULL when not eligible.

    Covers the shapes that dominate real link graphs (and 4 of the
    generator's 6 variants): already-canonical absolute URLs, absolute URLs
    needing only scheme/host-case, default-port, fragment, or
    single-trailing-host-dot normalization, and host-relative ("/p") or
    protocol-relative ("//h/p") hrefs against an ALREADY-CANONICAL base.
    Everything else (relative paths, dot segments, pct-escapes, queries,
    userinfo, non-default ports, non-ASCII, multi-dot host tails) returns
    NULL and must be routed through the pandas-UDF resolve.

    Guarantee (pinned by tests/test_canon.py): wherever this is non-NULL it
    equals resolve(base, href).

    Performance contract: NO regex anywhere — only contains / startswith /
    endswith / locate / substring_index / lower / trim, all single-scan
    codegen expressions. (A first cut used rlike with alternation + lazy
    quantifiers and was SLOWER than the Python resolver it replaced:
    5.2 s vs 10.7 s per 3M rows for the whole chain at local[4] — regex
    backtracking ate the win.)

    Eligibility reasoning, step by step against canonicalize():
      * fragment = everything from the FIRST '#' (same split);
      * ASCII-only (octet_length == char length), so JVM lower() ==
        Python str.lower() and char positions == byte positions;
      * no '%' (pct-normalization), '?' (query sort), or '@' (userinfo)
        anywhere before the fragment;
      * no "." / ".." path segments: excludes "/./", "/../" and the
        trailing "/." / "/.." forms ("host./d" is safe — that dot has no
        '/' before it);
      * scheme+host[:port] = text before the 3rd '/'; any ':' past
        position 6 must be the scheme's default port (http :80 /
        https :443), which is then dropped; at most ONE trailing host dot
        (".." tail -> slow, canonicalize strips all); host nonempty after
        the strip;
      * empty path -> "/"; the path (positions past the 3rd '/') is
        copied verbatim — path case, inner '//' and ':' are all kept by
        canonicalize too."""
    base = F.col(base_col) if isinstance(base_col, str) else base_col
    href = F.col(href_col) if isinstance(href_col, str) else href_col
    h = F.trim(href)
    pfx7 = F.lower(h.substr(1, 7))
    pfx8 = F.lower(h.substr(1, 8))
    is_abs = (pfx7 == "http://") | (pfx8 == "https://")
    is_proto_rel = h.startswith("//")
    is_host_rel = h.startswith("/") & ~is_proto_rel
    base_pre = F.substring_index(base, "/", 3)  # canonical scheme://host[:port]
    base_scheme = F.substring_index(base, "://", 1)
    cand = (
        F.when(is_abs, h)
        .when(is_proto_rel, F.concat(base_scheme, F.lit(":"), h))
        .when(is_host_rel, F.concat(base_pre, h))
    )
    u = F.substring_index(cand, "#", 1)  # first-# fragment strip
    ascii_ok = F.octet_length(cand) == F.length(cand)
    no_special = (
        ~u.contains("%") & ~u.contains("?") & ~u.contains("@")
    )
    no_dotseg = (
        ~u.contains("/./") & ~u.contains("/../")
        & ~u.endswith("/.") & ~u.endswith("/..")
    )
    pre_raw = F.substring_index(u, "/", 3)  # whole string when no path
    pre = F.lower(pre_raw)
    port80 = pre.endswith(":80") & pre.startswith("http://")
    port443 = pre.endswith(":443") & pre.startswith("https://")
    port_ok = (F.locate(":", pre, 7) == 0) | port80 | port443
    pre2 = (
        F.when(port80, pre.substr(F.lit(1), F.length(pre) - 3))
        .when(port443, pre.substr(F.lit(1), F.length(pre) - 4))
        .otherwise(pre)
    )
    single_dot_tail = ~pre2.endswith("..")
    pre3 = F.when(
        pre2.endswith("."), pre2.substr(F.lit(1), F.length(pre2) - 1)
    ).otherwise(pre2)
    host_ok = (pre3 != "http://") & (pre3 != "https://")
    eligible = (
        ascii_ok & no_special & no_dotseg & port_ok & single_dot_tail & host_ok
    )
    path = u.substr(F.length(pre_raw) + 1, F.length(u))
    fast = F.concat(pre3, F.when(path == "", "/").otherwise(path))
    return F.when(eligible, fast)


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize, na_action="ignore")


@pandas_udf(StringType())
def surt_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: surt(canonicalize(u)), na_action="ignore")


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of, na_action="ignore")


def host_col_native(canon_col: Column | str) -> Column:
    """Host (netloc incl. port) of an ALREADY-CANONICAL URL — pure JVM
    string ops (whole-stage codegen), no Python. canonicalize() guarantees
    `scheme://netloc/path` with a non-empty path, so netloc = text between
    the FIRST '://' and the path's leading '/', i.e. everything after '://'
    in the prefix up to the 3rd '/'. Anchoring on the first separator
    matters: query strings legitimately survive canonicalization and may
    contain '://' (e.g. http://a.com/r?next=http://b.com/x), so a
    last-'://' split would mis-bucket the URL onto the embedded host.
    Equals host_of() on canonical input (asserted by canon parity tests)."""
    c = F.col(canon_col) if isinstance(canon_col, str) else canon_col
    return F.substring_index(F.substring_index(c, "/", 3), "://", -1)


def url_hash_col(canon_col: Column | str) -> Column:
    """xxhash64 of the canonical URL — native JVM expression, no Python.

    Analog of the reference's topic-hash dispatch key
    (cmd/handler_registry.go:41-43)."""
    c = F.col(canon_col) if isinstance(canon_col, str) else canon_col
    return F.xxhash64(c)


def host_bucket_col(host_col: Column | str, n_buckets: int) -> Column:
    """Deterministic host bucket: pmod(xxhash64(host), n)."""
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")
