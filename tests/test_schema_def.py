"""Schema-derivation module (plans/schema_def.py) — the generator analog.

Mirrors the reference generator's test surface: SDL parse
(schema_parser.go:54-223), topo order + cycle detection
(migration_generator.go:343-389), DDL + diff migrations, derived entity
graph / WhereInput whitelist (query-prepare.go:41-123), and MERGE shapes
(sqlc_generator.go).
"""

from __future__ import annotations

import pytest

from layerg_crawler_v2_spark.declarations import driver_schema, indexer_schema
from layerg_crawler_v2_spark.plans.schema_def import (
    SchemaDef,
    SchemaError,
    parse_schema,
)

SDL = """
enum Status {
  ACTIVE
  DELETED
}

type Owner @entity {
  id: ID!
  name: String! @unique
  status: Status
  pets: [Pet!]! @derivedFrom(field: "owner")
}

type Pet @entity(table: "pets") @compositeIndexes(fields: [["name", "owner_id"]]) {
  id: ID!
  name: String @index
  weight: decimal(10,2)
  owner: Owner!
}
"""


@pytest.fixture(scope="module")
def schema() -> SchemaDef:
    return parse_schema(SDL)


def test_parse_fields_and_annotations(schema):
    owner = schema.entities["Owner"]
    assert owner.id_field == "id"
    by_name = {f.name: f for f in owner.fields}
    assert by_name["name"].unique and by_name["name"].non_null
    assert by_name["pets"].is_list and by_name["pets"].derived_from == "owner"
    assert by_name["status"].type == "Status" and "Status" in schema.enums
    assert schema.enums["Status"] == ["ACTIVE", "DELETED"]
    pet = schema.entities["Pet"]
    assert pet.table_name == "pets"
    assert pet.composite_indexes == (("name", "owner_id"),)


def test_struct_type_derivation(schema):
    st = schema.struct_type("Pet").simpleString()
    # 1-1 relation becomes the FK column owner_id (convention), enum -> string
    assert st == (
        "struct<id:bigint,name:string,weight:decimal(10,2),owner_id:bigint>"
    )
    assert (
        schema.struct_type("Owner").simpleString()
        == "struct<id:bigint,name:string,status:string>"
    )


def test_topo_order_parents_first(schema):
    order = schema.topo_order()
    assert order.index("Owner") < order.index("Pet")


def test_cycle_detection():
    cyclic = """
type A @entity {
  id: ID!
  b: B
}
type B @entity {
  id: ID!
  a: A
}
"""
    with pytest.raises(SchemaError, match="cyclic dependency"):
        parse_schema(cyclic).topo_order()


def test_self_cycle_detection():
    with pytest.raises(SchemaError, match="cyclic dependency"):
        parse_schema(
            "type A @entity {\n  id: ID!\n  parent: A\n}"
        ).topo_order()


def test_create_ddl_topo_and_columns(schema):
    ddl = schema.create_ddl()
    assert ddl[0].startswith("CREATE TABLE owner (")
    assert ddl[1].startswith("CREATE TABLE pets (")
    assert "owner_id BIGINT NOT NULL" in ddl[1]
    assert "unique(name)" in ddl[0]
    assert "index(name,owner_id)" in ddl[1]


def test_diff_ddl_add_column_and_new_table(schema):
    widened = SDL.replace("  weight: decimal(10,2)\n",
                          "  weight: decimal(10,2)\n  chipped: Boolean\n")
    new = parse_schema(widened)
    stmts = new.diff_ddl(schema)
    assert stmts == ["ALTER TABLE pets ADD COLUMN chipped BOOLEAN"]
    # NOT NULL column additions are refused (no default backfill)
    bad = parse_schema(SDL.replace("  weight: decimal(10,2)\n",
                                   "  weight: decimal(10,2)\n  chipped: Boolean!\n"))
    with pytest.raises(SchemaError, match="NOT NULL"):
        bad.diff_ddl(schema)
    # dropping an entity is refused
    with pytest.raises(SchemaError, match="refusing to drop"):
        parse_schema("type Owner @entity {\n  id: ID!\n}").diff_ddl(schema)


def test_snapshot_json_roundtrip(schema):
    """to_json/from_json preserve the declaration exactly — derived DDL,
    struct types, topo order, and re-serialization are all identical."""
    back = SchemaDef.from_json(schema.to_json())
    assert back.to_json() == schema.to_json()
    assert back.create_ddl() == schema.create_ddl()
    assert back.topo_order() == schema.topo_order()
    for name in schema.entities:
        assert back.struct_type(name) == schema.struct_type(name)
    assert back.enums == schema.enums
    with pytest.raises(SchemaError, match="version"):
        SchemaDef.from_json('{"version": 99, "entities": []}')


def test_migrate_from_snapshot_persisted_diff(tmp_path, schema):
    """The persisted-snapshot flow (migration_generator.go:62-82, 310-330):
    first run emits full DDL and stores the snapshot; an SDL edit then
    yields exactly the expected ALTERs against the STORED file; a no-op
    rerun yields nothing."""
    snap = str(tmp_path / "schema_snapshot.json")
    first = schema.migrate_from_snapshot(snap)
    assert first == schema.create_ddl()
    assert SchemaDef.from_json(open(snap).read()).to_json() == schema.to_json()
    # no-op rerun: snapshot already matches
    assert schema.migrate_from_snapshot(snap) == []
    # SDL edit -> ALTERs derived from the persisted snapshot, not memory
    widened = parse_schema(
        SDL.replace(
            "  weight: decimal(10,2)\n",
            "  weight: decimal(10,2)\n  chipped: Boolean\n",
        )
    )
    assert widened.migrate_from_snapshot(snap) == [
        "ALTER TABLE pets ADD COLUMN chipped BOOLEAN"
    ]
    # snapshot advanced: rerunning the widened schema is now a no-op
    assert widened.migrate_from_snapshot(snap) == []


def test_entity_graph_relations_and_derived(schema):
    g = schema.entity_graph()
    assert g["pet"].table == "pets"
    assert g["pet"].relations == {"owner": ("owner", "owner_id")}
    assert g["owner"].derived == {"pets": ("pet", "owner_id")}
    assert "name" in g["pet"].filterable and "pets" not in g["owner"].filterable


def test_derived_from_must_point_back():
    with pytest.raises(SchemaError, match="derivedFrom"):
        parse_schema("""
type A @entity {
  id: ID!
  bs: [B!]! @derivedFrom(field: "nope")
}
type B @entity {
  id: ID!
  a: A
}
""")


def test_merge_shapes(schema):
    assert schema.merge_keys("Owner") == ["id", "name"]
    sql = schema.merge_into_sql("Pet")
    assert sql.startswith("MERGE INTO pets t USING updates s ON t.id = s.id ")
    assert "UPDATE SET t.name = s.name, t.weight = s.weight, t.owner_id = s.owner_id" in sql


def test_merge_upsert_executable(spark, schema):
    cur = spark.createDataFrame(
        [(1, "rex", None, 10), (2, "fido", None, 10)],
        schema.struct_type("Pet"),
    )
    upd = spark.createDataFrame(
        [(2, "fido2", None, 11), (3, "bob", None, 12)],
        schema.struct_type("Pet"),
    )
    out = {
        r["id"]: (r["name"], r["owner_id"])
        for r in schema.merge_upsert("Pet", cur, upd).collect()
    }
    assert out == {1: ("rex", 10), 2: ("fido2", 11), 3: ("bob", 12)}


def test_driver_declaration_matches_hand_registry():
    """The derived driver graph must reproduce the r2 hand-built registry
    exactly (the queries it feeds are oracle-gated, but pin it here too)."""
    g = driver_schema().entity_graph()
    assert g["order"].relations == {"customer": ("customer", "o_custkey")}
    assert g["customer"].derived == {"orders": ("order", "o_custkey")}
    assert g["customer"].id_field == "c_custkey"
    assert g["event"].id_field == "event_id"


def test_indexer_declaration_matches_hand_structs():
    s = indexer_schema()
    assert (
        s.struct_type("User").simpleString()
        == "struct<id:bigint,created_batch:int>"
    )
    assert (
        s.struct_type("Balance").simpleString()
        == "struct<user_id:bigint,balance:decimal(30,2)>"
    )
    assert s.merge_keys("Balance") == ["user_id"]


def test_where_whitelist_enforced_through_querybuilder(spark):
    from layerg_crawler_v2_spark.plans.query import QueryBuilder

    schema = parse_schema(SDL)
    pets = spark.createDataFrame(
        [(1, "rex", None, 10)], schema.struct_type("Pet")
    ).withColumn("secret", pets_lit())
    qb = QueryBuilder({"pets": pets}, schema.entity_graph())
    # physical-but-undeclared columns are NOT filterable
    with pytest.raises(KeyError, match="secret"):
        qb.resolve("pet", where={"secret_eq": 1})
    assert qb.resolve("pet", where={"name_eq": "rex"}).count() == 1


def pets_lit():
    from pyspark.sql import functions as F

    return F.lit(1)
