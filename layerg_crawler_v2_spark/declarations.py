"""The engine's schema declarations — single source every registry derives from.

The reference splits this across schema.graphql + generated Go (models,
migrations, WhereInputs, upsert SQL); here each deployment writes ONE SDL
block and the engine derives StructTypes, the QueryBuilder entity graph,
topo-sorted DDL, and MERGE shapes at plan-build time
(plans/schema_def.py; reference internal/generator/schema_parser.go:54-223,
migration_generator.go:131-389, query-prepare.go:41-123).
"""

from __future__ import annotations

from functools import lru_cache

from .plans.schema_def import SchemaDef, parse_schema

# driver-fixture entity graph over the TPC-H-ish tables: the @fk overrides
# bind relations to the pre-existing physical layout (o_custkey), and
# Customer.orders is the @derivedFrom inverse the J2 rewrite resolves with
# one join + collect_list instead of the reference's per-parent N+1.
DRIVER_SDL = """
type Customer @entity(table: "customer") {
  c_custkey: ID!
  c_name: String!
  c_address: String
  c_nationkey: bigint @index
  c_phone: String
  c_acctbal: decimal(12,2)
  c_mktsegment: String @index
  c_comment: String
  orders: [Order!]! @derivedFrom(field: "customer")
}

type Order @entity(table: "orders") @compositeIndexes(fields: [["o_orderstatus", "o_orderdate"]]) {
  o_orderkey: ID!
  o_orderstatus: String @index
  o_totalprice: decimal(12,2)
  o_orderdate: Timestamp @index
  o_orderpriority: String
  o_clerk: String
  o_shippriority: Int
  o_comment: String
  customer: Customer @fk(column: "o_custkey")
}

type Event @entity(table: "events") {
  event_id: ID!
  user_id: bigint @index
  event_type: String @index
  value: decimal(12,2)
  ts: Timestamp @index
  props: String
}
"""

# indexer write-path entities (streaming/entities.py): get-or-create users,
# signed-delta balances (transfer_handler.go:288-378 / custom.sql.go:29-120)
INDEXER_SDL = """
type User @entity(table: "users") {
  id: ID!
  created_batch: Int!
}

type Balance @entity(table: "balances") {
  user_id: ID!
  balance: decimal(30,2)!
}
"""


@lru_cache(maxsize=None)
def driver_schema() -> SchemaDef:
    return parse_schema(DRIVER_SDL)


@lru_cache(maxsize=None)
def indexer_schema() -> SchemaDef:
    return parse_schema(INDEXER_SDL)
