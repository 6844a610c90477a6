"""Declarative schema → derived engine surfaces (the generator analog).

The reference ships an entire code-generation pipeline
(internal/generator/): `schema_parser.go:54-223` parses a GraphQL-SDL
schema with `@entity` / `@index(unique:)` / `@unique` / `@derivedFrom` /
`@compositeIndexes` into Entity/Field structs; `migration_generator.go:
131-389` emits topo-sorted DDL plus diff-based incremental migrations;
`model_generator.go` and `query-prepare.go:41-123` derive Go models and the
per-type WhereInput filter surface; `sqlc_generator.go` derives ON-CONFLICT
upsert SQL. Spark needs no compile step — the same single declaration is
interpreted at plan-build time into:

  parse_schema(sdl)        SDL text → SchemaDef           (schema_parser.go)
  SchemaDef.topo_order()   FK-dependency order + cycle error
                                                 (migration_generator.go:343-389)
  SchemaDef.struct_type(e) StructType per entity          (model_generator.go)
  SchemaDef.create_ddl()   topo-ordered CREATE TABLE DDL
                                                 (migration_generator.go:131-241)
  SchemaDef.diff_ddl(old)  incremental migration statements
                                                 (migration_generator.go:243-341)
  SchemaDef.entity_graph() plans.query.Entity registry — relations +
                           derived inverses — for the QueryBuilder
                                                 (query-prepare.go:41-123)
  SchemaDef.where_fields(e) filter whitelist per entity (WhereInput analog)
  SchemaDef.merge_keys(e) / merge_upsert(...)  MERGE shape + executable
                           full-outer upsert               (sqlc_generator.go)

Everything scalar stays declarative; nothing here touches data — the
derivations produce schemas, plans, and Column expressions that Catalyst
then optimizes like any hand-written ones.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# scalar SDL type -> (Spark type factory, ANSI DDL type)
_SCALARS: dict[str, tuple] = {
    "id": (T.LongType, "BIGINT"),
    "bigint": (T.LongType, "BIGINT"),
    "int": (T.IntegerType, "INT"),
    "string": (T.StringType, "STRING"),
    "text": (T.StringType, "STRING"),
    "boolean": (T.BooleanType, "BOOLEAN"),
    "date": (T.DateType, "DATE"),
    "timestamp": (T.TimestampNTZType, "TIMESTAMP"),
    "double": (T.DoubleType, "DOUBLE"),
    "binary": (T.BinaryType, "BINARY"),
}
_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$", re.I)


def _scalar_type(name: str):
    """(sparkType, ddl) for a scalar SDL type, or None if not scalar."""
    m = _DECIMAL_RE.match(name)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        return T.DecimalType(p, s), f"DECIMAL({p},{s})"
    low = name.lower()
    if low in _SCALARS:
        fac, ddl = _SCALARS[low]
        return fac(), ddl
    return None


@dataclass(frozen=True)
class FieldDef:
    name: str
    type: str                      # scalar name | entity name (relation)
    non_null: bool = False
    indexed: bool = False
    unique: bool = False
    is_list: bool = False          # [Child] inverse relation
    derived_from: str | None = None  # fk FIELD on the child (for is_list)
    fk: str | None = None          # physical FK column override (@fk) — lets
    #                                declarations bind to pre-existing table
    #                                layouts (o_custkey) instead of the
    #                                derived `<field>_<id>` convention

    @property
    def is_relation(self) -> bool:
        return _scalar_type(self.type) is None


@dataclass(frozen=True)
class EntityDef:
    name: str
    fields: tuple[FieldDef, ...]
    table: str | None = None       # physical table; default snake_case(name)
    id_field: str = "id"
    composite_indexes: tuple[tuple[str, ...], ...] = ()

    @property
    def table_name(self) -> str:
        return self.table or _snake(self.name)


def _snake(name: str) -> str:
    return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()


class SchemaError(ValueError):
    pass


class SchemaDef:
    """The single declaration every registry below derives from."""

    def __init__(self, entities: list[EntityDef], enums: dict[str, list[str]] | None = None):
        self.entities: dict[str, EntityDef] = {e.name: e for e in entities}
        self.enums: dict[str, list[str]] = dict(enums or {})
        self._validate()

    # -- validation ---------------------------------------------------------

    def _validate(self) -> None:
        for ent in self.entities.values():
            names = [f.name for f in ent.fields]
            if len(set(names)) != len(names):
                raise SchemaError(f"{ent.name}: duplicate field names")
            if ent.id_field not in names:
                raise SchemaError(f"{ent.name}: missing id field {ent.id_field!r}")
            for f in ent.fields:
                if f.type in self.enums:
                    continue
                if f.is_relation and f.type not in self.entities:
                    raise SchemaError(
                        f"{ent.name}.{f.name}: unknown type {f.type!r}"
                    )
                if f.is_list and not f.is_relation:
                    raise SchemaError(f"{ent.name}.{f.name}: scalar lists unsupported")
                if f.is_list and not f.derived_from:
                    raise SchemaError(
                        f"{ent.name}.{f.name}: list relation needs @derivedFrom"
                    )
                if f.is_list and f.derived_from:
                    child = self.entities.get(f.type)
                    back = (
                        next(
                            (x for x in child.fields if x.name == f.derived_from),
                            None,
                        )
                        if child
                        else None
                    )
                    if back is None or back.is_list or back.type != ent.name:
                        raise SchemaError(
                            f"{ent.name}.{f.name}: @derivedFrom field "
                            f"{f.derived_from!r} is not a {ent.name}-relation "
                            f"on {f.type}"
                        )
                if f.fk and (f.is_list or not f.is_relation):
                    raise SchemaError(
                        f"{ent.name}.{f.name}: @fk only applies to 1-1 relations"
                    )
            # composite indexes name PHYSICAL columns (the reference's DDL
            # indexes snake_case columns, incl. derived FK columns)
            physical = {c[0] for c in self._columns(ent)}
            for idx in ent.composite_indexes:
                for col in idx:
                    if col not in physical:
                        raise SchemaError(
                            f"{ent.name}: composite index on unknown column {col!r}"
                        )

    # -- topological order (migration_generator.go:343-389) ------------------

    def topo_order(self) -> list[str]:
        """Entities in FK-dependency order; SchemaError on cycles."""
        deps = {
            name: [
                f.type
                for f in ent.fields
                if f.is_relation and not f.is_list and f.type in self.entities
            ]
            for name, ent in self.entities.items()
        }
        sorted_: list[str] = []
        visited: set[str] = set()
        in_stack: set[str] = set()

        def visit(name: str) -> None:
            if name in in_stack:
                raise SchemaError(f"cyclic dependency detected at {name}")
            if name in visited:
                return
            in_stack.add(name)
            for dep in deps[name]:
                visit(dep)
            in_stack.discard(name)
            visited.add(name)
            sorted_.append(name)

        for name in sorted(self.entities):
            visit(name)
        return sorted_

    # -- physical columns / StructType (model_generator.go) ------------------

    def _columns(self, ent: EntityDef) -> list[tuple[str, object, str, bool]]:
        """[(col_name, sparkType, ddlType, non_null)] — list relations are
        NOT physical columns (they live on the child as its FK); 1-1
        relations store `<field>_<target_id_field>`."""
        cols = []
        for f in ent.fields:
            if f.is_list:
                continue
            if f.type in self.enums:
                cols.append((f.name, T.StringType(), "STRING", f.non_null))
                continue
            if f.is_relation:
                tgt = self.entities[f.type]
                tgt_id = next(x for x in tgt.fields if x.name == tgt.id_field)
                st, ddl = _scalar_type(tgt_id.type)
                cols.append((self.fk_column(ent.name, f.name), st, ddl, f.non_null))
            else:
                st, ddl = _scalar_type(f.type)
                cols.append((f.name, st, ddl, f.non_null))
        return cols

    def fk_column(self, entity: str, field_name: str) -> str:
        """Physical FK column for a 1-1 relation field: the @fk override
        when declared, else the reference's `<snake(field)>_<id>` convention
        (migration_generator.go:172-178)."""
        f = next(x for x in self.entities[entity].fields if x.name == field_name)
        if f.fk:
            return f.fk
        tgt = self.entities[f.type]
        return f"{_snake(field_name)}_{tgt.id_field}"

    def struct_type(self, entity: str) -> T.StructType:
        return T.StructType(
            [
                T.StructField(name, st, not non_null)
                for name, st, _, non_null in self._columns(self.entities[entity])
            ]
        )

    # -- DDL (migration_generator.go:131-241) --------------------------------

    def create_ddl(self) -> list[str]:
        """Topo-ordered CREATE TABLE statements (Iceberg-flavored ANSI: no
        FK constraints — lineage lives in the declaration, not the
        catalog; indexes surface as comments because Iceberg sorts/clusters
        instead of indexing)."""
        out = []
        for name in self.topo_order():
            ent = self.entities[name]
            lines = []
            for col, _, ddl, non_null in self._columns(ent):
                nn = " NOT NULL" if non_null else ""
                lines.append(f"  {col} {ddl}{nn}")
            stmt = (
                f"CREATE TABLE {ent.table_name} (\n" + ",\n".join(lines) + "\n)"
            )
            notes = [
                f"unique({f.name})" for f in ent.fields if f.unique
            ] + [
                f"index({f.name})" for f in ent.fields if f.indexed and not f.unique
            ] + [
                "index(" + ",".join(ix) + ")" for ix in ent.composite_indexes
            ]
            if notes:
                stmt += "  -- " + "; ".join(notes)
            out.append(stmt)
        return out

    def diff_ddl(self, old: "SchemaDef") -> list[str]:
        """Incremental migration: new tables (topo order) + added columns.
        Drops/renames are refused loudly, like the reference's conservative
        differ (migration_generator.go:243-341 emits adds only)."""
        out = []
        for name in self.topo_order():
            ent = self.entities[name]
            if name not in old.entities:
                for stmt in SchemaDef([*self._closure([name])]).create_ddl():
                    if stmt.startswith(f"CREATE TABLE {ent.table_name} "):
                        out.append(stmt)
                continue
            old_cols = {c[0]: c for c in old._columns(old.entities[name])}
            for col, _, ddl, non_null in self._columns(ent):
                if col not in old_cols:
                    if non_null:
                        raise SchemaError(
                            f"{name}.{col}: cannot add NOT NULL column to an "
                            f"existing table without a default"
                        )
                    out.append(f"ALTER TABLE {ent.table_name} ADD COLUMN {col} {ddl}")
        for name in old.entities:
            if name not in self.entities:
                raise SchemaError(f"refusing to drop entity {name}")
        return out

    # -- snapshot persistence (migration_generator.go:62-82, 310-330) --------

    def to_json(self) -> str:
        """Stable, versioned serialization of the declaration — the analog
        of the reference's on-disk schema_snapshot.json."""
        payload = {
            "version": 1,
            "enums": {k: list(v) for k, v in sorted(self.enums.items())},
            "entities": [
                {
                    "name": ent.name,
                    "table": ent.table,
                    "id_field": ent.id_field,
                    "composite_indexes": [list(ix) for ix in ent.composite_indexes],
                    "fields": [
                        {
                            "name": f.name,
                            "type": f.type,
                            "non_null": f.non_null,
                            "indexed": f.indexed,
                            "unique": f.unique,
                            "is_list": f.is_list,
                            "derived_from": f.derived_from,
                            "fk": f.fk,
                        }
                        for f in ent.fields
                    ],
                }
                for ent in self.entities.values()
            ],
        }
        return json.dumps(payload, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "SchemaDef":
        payload = json.loads(text)
        if payload.get("version") != 1:
            raise SchemaError(f"unknown snapshot version {payload.get('version')!r}")
        ents = [
            EntityDef(
                name=e["name"],
                table=e.get("table"),
                id_field=e.get("id_field", "id"),
                composite_indexes=tuple(
                    tuple(ix) for ix in e.get("composite_indexes", [])
                ),
                fields=tuple(FieldDef(**f) for f in e["fields"]),
            )
            for e in payload["entities"]
        ]
        return cls(ents, enums=payload.get("enums") or {})

    def migrate_from_snapshot(self, path: str) -> list[str]:
        """Incremental migration against the PERSISTED snapshot, then
        rewrite it — the reference's generate flow: load schema_snapshot
        (migration_generator.go:62-82), diff, emit adds only, store the new
        snapshot (310-330). First run (no file) emits the full create_ddl."""
        import os

        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                old = SchemaDef.from_json(fh.read())
            stmts = self.diff_ddl(old)
        else:
            stmts = self.create_ddl()
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(self.to_json())
        os.replace(tmp, path)
        return stmts

    def _closure(self, names: list[str]) -> list[EntityDef]:
        seen: set[str] = set()

        def add(n: str):
            if n in seen:
                return
            seen.add(n)
            for f in self.entities[n].fields:
                if f.is_relation and f.type in self.entities:
                    add(f.type)

        for n in names:
            add(n)
        return [self.entities[n] for n in seen]

    # -- QueryBuilder registry (query-prepare.go:41-123) ----------------------

    def entity_graph(self) -> dict[str, "object"]:
        """{entity_key: plans.query.Entity} — relations map through the
        derived FK columns; @derivedFrom list fields become the inverse
        1-N collect_list path. Keys are snake_case entity names."""
        from .query import Entity as QEntity

        out: dict[str, QEntity] = {}
        for name, ent in self.entities.items():
            relations: dict[str, tuple[str, str]] = {}
            derived: dict[str, tuple[str, str]] = {}
            for f in ent.fields:
                if not f.is_relation or f.type in self.enums:
                    continue
                if f.is_list:
                    child = self.entities[f.type]
                    child_fk_field = f.derived_from
                    derived[f.name] = (
                        _snake(f.type),
                        self.fk_column(f.type, child_fk_field),
                    )
                else:
                    relations[f.name] = (
                        _snake(f.type),
                        self.fk_column(name, f.name),
                    )
            out[_snake(name)] = QEntity(
                table=ent.table_name,
                id_field=ent.id_field,
                relations=relations,
                derived=derived,
                filterable=frozenset(self.where_fields(name)),
            )
        return out

    def where_fields(self, entity: str) -> set[str]:
        """Filterable fields (the per-type WhereInput surface): every
        physical scalar/FK column. Relation and list fields filter through
        their own entities, never through string splicing."""
        return {c[0] for c in self._columns(self.entities[entity])}

    # -- MERGE shapes (sqlc_generator.go ON CONFLICT analog) ------------------

    def merge_keys(self, entity: str) -> list[str]:
        """MERGE ON columns: the id field plus any @unique fields."""
        ent = self.entities[entity]
        keys = [ent.id_field]
        keys += [f.name for f in ent.fields if f.unique and f.name != ent.id_field]
        return keys

    def merge_into_sql(self, entity: str, source: str = "updates") -> str:
        """The Iceberg MERGE INTO template this entity's upsert compiles to
        on a real catalog (documentation artifact + catalog deployments)."""
        ent = self.entities[entity]
        keys = self.merge_keys(entity)
        cols = [c[0] for c in self._columns(ent)]
        non_keys = [c for c in cols if c not in keys]
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys) or ", ".join(
            f"t.{k} = s.{k}" for k in keys
        )
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {ent.table_name} t USING {source} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    def merge_upsert(
        self,
        entity: str,
        current: DataFrame,
        updates: DataFrame,
        combine: dict[str, object] | None = None,
    ) -> DataFrame:
        """Executable MERGE for the snapshot store (no catalog in this
        sandbox): full-outer join on merge_keys; non-key columns take the
        update when present, else the current value; `combine` overrides
        per-column with fn(current_col, update_col) — e.g. balances sum.
        The Iceberg deployment swaps this for merge_into_sql()."""
        keys = self.merge_keys(entity)
        cols = [c[0] for c in self._columns(self.entities[entity])]
        cur = current.alias("t")
        upd = updates.alias("s")
        joined = cur.join(upd, on=keys, how="full_outer")
        out_cols = [F.col(k) for k in keys]
        for c in cols:
            if c in keys:
                continue
            if combine and c in combine:
                out_cols.append(combine[c](F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
            else:
                out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        return joined.select(*out_cols)


# -- SDL parser (schema_parser.go:54-223) -------------------------------------

_TYPE_RE = re.compile(r"^type\s+(\w+)")
_ENUM_RE = re.compile(r"^enum\s+(\w+)")
_FIELD_RE = re.compile(r"^(\w+)\s*:\s*(\[?)(\w+(?:\(\d+,\s*\d+\))?)(!?)(\]?)(!?)(.*)$")
_DERIVED_RE = re.compile(r'@derivedFrom\s*\(\s*field\s*:\s*"(\w+)"\s*\)')
_FK_RE = re.compile(r'@fk\s*\(\s*column\s*:\s*"(\w+)"\s*\)')
_COMPOSITE_RE = re.compile(r"@compositeIndexes\s*\(\s*fields\s*:\s*(\[.*?\])\s*\)")
_TABLE_RE = re.compile(r'@entity\s*\(\s*table\s*:\s*"(\w+)"\s*\)')


def parse_schema(sdl: str) -> SchemaDef:
    """Line-based SDL parser, same grammar family as the reference's
    (schema_parser.go): `type X @entity { field: Type! @index(unique: true)
    @derivedFrom(field: "fk") }`, `enum E { A B }`, plus an
    `@entity(table: "name")` extension for explicit physical names and
    decimal(p,s) scalars. Comments (#) and blank lines ignored."""
    entities: list[EntityDef] = []
    enums: dict[str, list[str]] = {}
    cur_name = cur_table = None
    cur_fields: list[FieldDef] = []
    cur_comp: tuple[tuple[str, ...], ...] = ()
    cur_enum: str | None = None

    for raw in sdl.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _ENUM_RE.match(line)
        if m:
            cur_enum = m.group(1)
            enums[cur_enum] = []
            continue
        m = _TYPE_RE.match(line)
        if m:
            cur_name = m.group(1)
            tm = _TABLE_RE.search(line)
            cur_table = tm.group(1) if tm else None
            cm = _COMPOSITE_RE.search(line)
            cur_comp = (
                tuple(tuple(ix) for ix in json.loads(cm.group(1))) if cm else ()
            )
            cur_fields = []
            continue
        if line.startswith("}"):
            if cur_enum is not None:
                cur_enum = None
            elif cur_name is not None:
                # the ID-typed field is the primary key (query_resolver.go
                # force-includes it); explicit `id`-named field otherwise
                id_field = next(
                    (f.name for f in cur_fields if f.type.lower() == "id"), "id"
                )
                entities.append(
                    EntityDef(
                        name=cur_name,
                        table=cur_table,
                        fields=tuple(cur_fields),
                        id_field=id_field,
                        composite_indexes=cur_comp,
                    )
                )
                cur_name = None
            continue
        if cur_enum is not None:
            enums[cur_enum].append(line)
            continue
        if cur_name is None:
            continue
        m = _FIELD_RE.match(line)
        if not m:
            raise SchemaError(f"unparseable field line: {raw!r}")
        fname, lb, ftype, inner_nn, rb, outer_nn, rest = m.groups()
        if bool(lb) != bool(rb):
            raise SchemaError(f"unbalanced list brackets: {raw!r}")
        dm = _DERIVED_RE.search(rest)
        km = _FK_RE.search(rest)
        cur_fields.append(
            FieldDef(
                name=fname,
                type=ftype,
                non_null=bool(outer_nn or (inner_nn and not lb)),
                indexed="@index" in rest,
                unique="@unique" in rest or "unique: true" in rest,
                is_list=bool(lb),
                derived_from=dm.group(1) if dm else None,
                fk=km.group(1) if km else None,
            )
        )
    return SchemaDef(entities, enums)
