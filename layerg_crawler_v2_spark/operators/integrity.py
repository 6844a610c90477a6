"""Merkle integrity tree over a table — equality proofs for crawl state.

The north-star resume contract (BASELINE.json: "a killed job resumes from
the last checkpoint with an identical URL-seen set") is verified in tests
by comparing full tables — fine at sf0.001, impossible at a 10^10-URL
frontier where the seen set IS the big data.  A Merkle tree gives the
production-scale form of the same check: hash every row, fold each hash
bucket into one node hash, fold the bucket nodes into one root.  Two
stores are identical iff their roots match (one 32-char comparison); when
they differ, comparing the O(n_buckets) level-1 nodes localizes WHICH
buckets diverge without shipping any rows — the rsync/Cassandra
anti-entropy discipline applied to crawl snapshots.

Reference analog: the Go service trusts CockroachDB replication for state
integrity; a Spark store on object storage has no such layer, so snapshot
equality (resume-vs-one-shot, replica-vs-replica, pre-vs-post compaction)
needs an explicit mechanism.  SnapshotStore's compaction invariant
(sources/snapshots.py) is exactly a "tree must not change" claim.

Spark-first & oracle-portable:
  * row hash: md5 over a \\x1f-joined, null-sentineled projection —
    deterministic, order-free, identical in DuckDB;
  * bucket: top bits of the row hash itself (conv/'0x'||hex cast), so
    bucketing needs no extra column and is uniform by construction;
  * level-1 node: md5(concat of the bucket's row hashes SORTED) — one
    groupBy(bucket) whose collect_list is bounded by rows/bucket (pick
    n_buckets ~ rows/10^6 at scale; the construction nests to k levels
    by re-bucketing node hashes, each level shrinking by ~10^6x, so two
    levels already cover 10^12 rows);
  * root: the same fold over the <= n_buckets level-1 nodes, in one
    final 1-row aggregation.

Everything is whole-stage codegen + two bounded aggregations; the only
exchange is the bucket groupBy, sized n_buckets regardless of input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTINEL = "\x00"  # NULL marker inside the row projection
SEP = "\x1f"  # unit separator between columns
MERKLE_BUCKETS = 256


def _row_hash(cols: list[str]) -> F.Column:
    return F.md5(
        F.concat_ws(
            SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(SENTINEL)) for c in cols]
        )
    )


def merkle_tree(
    df: DataFrame, cols: list[str], n_buckets: int = MERKLE_BUCKETS
) -> DataFrame:
    """(level, bucket, node_hash, n_rows) — level 1: one node per non-empty
    hash bucket; level 0: the single root (bucket = -1) folding the level-1
    nodes in bucket order.  Row order and partitioning never matter: rows
    are md5-hashed, bucketed by their own hash's top bits, and sorted
    inside each bucket before folding."""
    if not cols:
        raise ValueError("merkle_tree needs at least one column")
    leaves = df.select(_row_hash(cols).alias("rh")).select(
        F.pmod(
            F.conv(F.substring("rh", 1, 15), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ).alias("bucket"),
        "rh",
    )
    nodes = (
        leaves.groupBy("bucket")
        .agg(
            F.md5(F.array_join(F.array_sort(F.collect_list("rh")), "")).alias(
                "node_hash"
            ),
            F.count("*").alias("n_rows"),
        )
        # materialize ONCE (lazily): both the level-1 branch and the root
        # fold consume nodes — without a barrier the full-table hash scan
        # re-executes for the root branch (two FileScans in the plan; at
        # 100 TB that doubles the dominant cost for a <= n_buckets-row
        # intermediate)
        .localCheckpoint(eager=False)
    )
    root = nodes.groupBy().agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bucket", "node_hash"))
                    ),
                    lambda s: s["node_hash"],
                ),
                "",
            )
        ).alias("node_hash"),
        F.sum("n_rows").alias("n_rows"),
    )
    return nodes.select(
        F.lit(1).alias("level"), "bucket", "node_hash", "n_rows"
    ).unionByName(
        root.select(
            F.lit(0).alias("level"),
            F.lit(-1).cast("bigint").alias("bucket"),
            "node_hash",
            "n_rows",
        )
    )


def merkle_diff(tree_a: DataFrame, tree_b: DataFrame) -> DataFrame:
    """Buckets whose level-1 nodes differ between two merkle_tree()
    outputs (same cols + n_buckets) — (bucket, node_hash_a, node_hash_b),
    nulls where a bucket is non-empty on one side only.  Empty result ==
    identical tables.  The exchange is O(n_buckets): no row data moves."""
    a = tree_a.filter(F.col("level") == 1).select(
        "bucket", F.col("node_hash").alias("node_hash_a")
    )
    b = tree_b.filter(F.col("level") == 1).select(
        "bucket", F.col("node_hash").alias("node_hash_b")
    )
    return (
        a.join(b, "bucket", "full_outer")
        .filter(
            ~F.col("node_hash_a").eqNullSafe(F.col("node_hash_b"))
        )
        .orderBy("bucket")
    )
