"""Crawl-trap detection: flag URLs whose shape indicates an infinite or
low-value crawl subspace before they are scheduled.

The reference filters its work queue by a static allowlist before enqueueing
(cmd/onchain.go:68-72); a web frontier additionally needs SHAPE-based
rejection — calendar pages, session-id explosions, and self-linking
directory loops generate unbounded URL sets that pass any allowlist. The
classic trap signals (Heydon & Najork, "Mercator" 1999; industry robots
lore) used here:

  depth             — path-segment count > max_depth (deep auto-generated trees)
  max_seg_repeat    — one path segment repeated >= max_repeat times
                      (directory self-links: /a/b/a/b/a/b/...)
  n_query_params    — parameter count > max_params (faceted-search explosion)
  has_session_param — phpsessid / jsessionid / sessionid in the query
                      (infinite alias space for the same page)
  too_long          — url longer than max_len bytes

Scale shape: one JVM higher-order/regexp pass per row, zero shuffle, fully
codegen — the flags are computed where the frontier rows already live, so
trap rejection adds no exchange to the round (it composes with the
allowlist filter in streaming/rounds.py the same way P2 does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SESSION_PARAM_RE = r"(?i)(phpsessid|jsessionid|sessionid)="
QUERY_PARAM_RE = r"[?&][^&=?]+="


def url_trap_flags(
    url: Column,
    max_depth: int = 12,
    max_repeat: int = 3,
    max_params: int = 8,
    max_len: int = 200,
) -> Column:
    """Struct of trap signals + combined is_trap bit for a URL column."""
    path = F.regexp_extract(url, r"://[^/]+([^?]*)", 1)
    segs = F.filter(
        F.split(path, "/"), lambda s: (s != "") & ~s.rlike(r"\.")
    )
    depth = F.size(segs)
    max_rep = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda s: F.size(F.filter(segs, lambda x: x == s)),
            )
        ),
        F.lit(0),
    )
    nq = F.regexp_count(url, F.lit(QUERY_PARAM_RE))
    sess = F.regexp_count(url, F.lit(SESSION_PARAM_RE)) > 0
    lng = F.length(url) > max_len
    return F.struct(
        depth.alias("depth"),
        max_rep.alias("max_seg_repeat"),
        nq.alias("n_query_params"),
        sess.alias("has_session_param"),
        lng.alias("too_long"),
        (
            (depth > max_depth)
            | (max_rep >= max_repeat)
            | (nq > max_params)
            | sess
            | lng
        ).alias("is_trap"),
    )


def reject_traps(df: DataFrame, url_col: str = "url", **thresholds) -> DataFrame:
    """Drop trap URLs; same row schema out as in."""
    flags = url_trap_flags(F.col(url_col), **thresholds)
    return df.withColumn("__trap", flags["is_trap"]).filter(
        ~F.col("__trap")
    ).drop("__trap")
