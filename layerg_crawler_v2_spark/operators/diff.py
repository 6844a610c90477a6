"""Crawl snapshot diff (CDC): classify every URL as added / removed /
changed between two crawl snapshots by content fingerprint.

A recrawl pipeline needs exactly this delta: `recrawl_schedule`
(operators/recrawl.py) consumes per-URL change observations, and a
training-data refresh wants only the pages whose content moved since the
last dump — re-shipping the unchanged 95%+ of a Common-Crawl-sized corpus
is the expensive mistake. The reference's closest analog is its backfill
re-scan, which re-reads whole block ranges and relies on ON CONFLICT
upserts to absorb the unchanged rows (cmd/worker_cmd.go:147-208); the
diff here computes the delta *before* any rewrite happens.

Physics: one full-outer shuffle join on the key (Spark has no broadcast
path for full-outer — both sides hash-exchange once, sort-merge), then a
null-safe fingerprint compare. Presence is tracked with explicit flag
columns, NOT fingerprint nullness, so a legitimately-NULL fingerprint
(e.g. md5 of a NULL text) still classifies correctly: `added`/`removed`
come from the flags, `changed` from `eqNullSafe` (SQL `IS DISTINCT
FROM`). Output size is O(|delta|), never O(|corpus|); the fingerprints
are fixed-width, so the shuffle moves (key, fp) pairs only — never page
payloads. At Iceberg scale this is the changelog read between two
snapshot ids over a `bucket(N, url)`-partitioned table, where the join
needs no exchange at all (storage-partitioned join).

Precondition: one row per key per snapshot — `canonical_pages()`
(streaming/rounds.py) provides exactly that shape for the pages table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fingerprint_col: str = "fp",
    emit_unchanged: bool = False,
) -> DataFrame:
    """(key, change, old_fp, new_fp) rows; `change` in
    added | removed | changed (| unchanged when emit_unchanged=True).

    `added` = key only in `new`; `removed` = only in `old`; `changed` =
    present in both with fingerprints that differ under null-safe
    equality. Unchanged keys are suppressed by default — the delta, not
    the corpus, is the output."""
    o = old.select(
        F.col(key_col),
        F.col(fingerprint_col).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col),
        F.col(fingerprint_col).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    # USING-style full outer: the key column is coalesce(old.key, new.key)
    j = o.join(n, on=key_col, how="full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col(key_col), change.alias("change"), "old_fp", "new_fp")
    if not emit_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
