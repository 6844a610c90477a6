"""Declarative schemas for every engine table.

The reference generates its physical schema from a GraphQL SDL at build time
(cmd/prepare/main.go:33-86, internal/generator/migration_generator.go:131-287).
We keep the "declared schema -> derived everything" architecture but the
declaration is a StructType and derivation is Python introspection — no
codegen-to-files step is needed.

Table shapes follow FIXTURES.md; the `pages` shape is the authoritative
input_hint from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- The graft input table (BASELINE.json input_hint) -----------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# --- Engine-owned frontier tables (FIXTURES.md §B2) --------------------------
# Analog of the reference system tables db/migrations/20250101000000_system_schema.sql:5-45
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("added_depth", T.IntegerType(), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # canonical form
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        # OPIC cash in fixed-point micro-units (LongType, not Double): integer
        # sums are order-independent, so priority ordering is bit-identical at
        # any parallelism — float sums are not (SURVEY.md §7 hard-item (e)).
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),  # QUEUED/FETCHED/SKIPPED
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("first_depth", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rule_type", T.StringType(), False),  # allow | deny
        T.StructField("path_prefix", T.StringType(), False),
    ]
)

HOSTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("delay_ms", T.IntegerType(), False),
        T.StructField("max_parallel", T.IntegerType(), False),
    ]
)

FETCH_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("fetch_ts", T.TimestampType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("status", T.StringType(), False),  # OK | MISS | DENIED
    ]
)

CHECKPOINTS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("frontier_count", T.LongType(), False),
        T.StructField("seen_count", T.LongType(), False),
        T.StructField("fetched_count", T.LongType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("urls_in", T.LongType(), False),
        T.StructField("urls_fetched", T.LongType(), False),
        T.StructField("urls_discovered", T.LongType(), False),
        T.StructField("urls_deduped", T.LongType(), False),
    ]
)

# --- Entity-layer tables (query builder tests; FIXTURES.md §B3) --------------
# Shapes from the reference generated/migrations/20250311154253_migration.sql:9-48
ITEM = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("token_id", T.StringType(), False),  # uint256-as-string
        T.StructField("token_uri", T.StringType(), True),
        T.StructField("standard", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

USER = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

BALANCE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("item_id", T.StringType(), False),
        T.StructField("owner_id", T.StringType(), False),
        T.StructField("value", T.StringType(), False),  # BigInt-as-string
        T.StructField("contract", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
