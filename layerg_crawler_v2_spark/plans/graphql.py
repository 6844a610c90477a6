"""GraphQL query-string front end for the QueryBuilder.

The reference exposes its read surface as GraphQL over generated field
configs (generated/query/generated.go:60-338): per entity a single-row
field `Item(id: ID!)` resolved by ResolveSingle and a list field
`Items(page: Int, limit: Int, order: String, where: ItemWhereInput)`
resolved by ResolveMultiple, where-inputs shaped
`{field: {gte: .., lt: ..}, AND: [...], OR: [...]}`
(cmd/core/query_resolver.go:541-614 processWhere).

This module is the string half of that surface: a hand-rolled lexer +
recursive-descent parser (the plans/schema_def.py SDL-parser precedent —
no external GraphQL dependency) from a query document to the SAME request
dicts plans/query.py already compiles, so the string path and the dict
path are provably one engine:

    execute_graphql(qb, '''
      { Orders(limit: 5, order: "o_totalprice desc",
               where: {o_totalprice: {gte: 100000}}) {
          o_orderkey o_totalprice customer { c_name } } }
    ''')

Supported: named/anonymous query operations, variables ($x with a
`variables` dict, declarations parsed and ignored), int/float/string/
boolean/null/enum/list/object values, nested AND/OR where trees, one
level of relation nesting in selection sets (the generator's own depth:
relations resolve entity-typed fields, @derivedFrom lists — deeper
nesting raises, as does anything outside the generated surface:
aliases, fragments, directives, mutations.

Scale shape: the front end is pure driver-side string work producing the
same declarative plan — Catalyst sees identical trees from either path
(pinned by tests/test_graphql.py parity cases), so there is no
performance surface here at all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .query import QueryBuilder

# --- lexer -------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>[,\s]+)
    | (?P<comment>\#[^\n]*)
    | (?P<string>"(?:\\.|[^"\\])*")
    | (?P<float>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
    | (?P<int>-?\d+)
    | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
    | (?P<var>\$[_A-Za-z][_0-9A-Za-z]*)
    | (?P<spread>\.\.\.)
    | (?P<punct>[{}()\[\]:!=@])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(
                f"GraphQL lex error at offset {pos}: {src[pos:pos + 20]!r}"
            )
        kind = m.lastgroup
        if kind not in ("ws", "comment"):
            out.append((kind, m.group()))
        pos = m.end()
    out.append(("eof", ""))
    return out


# --- parser ------------------------------------------------------------------

@dataclass
class GraphQLField:
    """One top-level query field: name + args + selection tree.

    `selection` entries are either a field-name string or a
    (name, [subfield names]) pair for a one-level nested relation."""

    name: str
    args: dict = field(default_factory=dict)
    selection: list = field(default_factory=list)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], variables: dict):
        self.toks = tokens
        self.i = 0
        self.vars = variables

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        kind, val = self.next()
        if val != text:
            raise ValueError(f"GraphQL parse error: expected {text!r}, got {val!r}")

    def document(self) -> list[GraphQLField]:
        kind, val = self.peek()
        if kind == "name":
            if val in ("mutation", "subscription", "fragment"):
                raise ValueError(f"unsupported operation: {val}")
            if val != "query":
                raise ValueError(f"GraphQL parse error: unexpected {val!r}")
            self.next()
            if self.peek()[0] == "name":  # operation name
                self.next()
            if self.peek()[1] == "(":  # variable definitions: parse & ignore
                depth = 0
                while True:
                    _, v = self.next()
                    depth += v == "("
                    depth -= v == ")"
                    if depth == 0:
                        break
        fields = self.selection_set(top=True)
        if self.peek()[0] != "eof":
            raise ValueError(
                f"GraphQL parse error: trailing input {self.peek()[1]!r}"
            )
        return fields

    def selection_set(self, top: bool = False) -> list:
        self.expect("{")
        out = []
        while self.peek()[1] != "}":
            kind, name = self.next()
            if kind == "spread":
                raise ValueError("fragments are not supported")
            if kind != "name":
                raise ValueError(f"GraphQL parse error: unexpected {name!r}")
            if self.peek()[1] == ":":
                raise ValueError("aliases are not supported")
            args: dict = {}
            if self.peek()[1] == "(":
                args = self.arguments()
            if self.peek()[1] == "@":
                raise ValueError("directives are not supported")
            sub = None
            if self.peek()[1] == "{":
                sub = self.selection_set()
            if top:
                out.append(GraphQLField(name, args, sub or []))
            elif sub is not None:
                for s in sub:
                    if not isinstance(s, str):
                        raise ValueError(
                            "selection nesting beyond one relation level "
                            f"is not supported (at {name!r})"
                        )
                out.append((name, sub))
            else:
                out.append(name)
        self.expect("}")
        return out

    def arguments(self) -> dict:
        self.expect("(")
        args: dict = {}
        while self.peek()[1] != ")":
            kind, name = self.next()
            if kind != "name":
                raise ValueError(f"GraphQL parse error: bad argument {name!r}")
            self.expect(":")
            args[name] = self.value()
        self.expect(")")
        return args

    def value(self):
        kind, val = self.next()
        if kind == "int":
            return int(val)
        if kind == "float":
            return float(val)
        if kind == "string":
            return (
                val[1:-1]
                .replace('\\"', '"')
                .replace("\\\\", "\\")
                .replace("\\n", "\n")
                .replace("\\t", "\t")
            )
        if kind == "var":
            name = val[1:]
            if name not in self.vars:
                raise KeyError(f"undefined GraphQL variable: ${name}")
            return self.vars[name]
        if kind == "name":
            if val == "true":
                return True
            if val == "false":
                return False
            if val == "null":
                return None
            return val  # enum value -> bare string
        if val == "[":
            out = []
            while self.peek()[1] != "]":
                out.append(self.value())
            self.next()
            return out
        if val == "{":
            obj = {}
            while self.peek()[1] != "}":
                kind, name = self.next()
                if kind != "name":
                    raise ValueError(f"GraphQL parse error: bad key {name!r}")
                self.expect(":")
                obj[name] = self.value()
            self.next()
            return obj
        raise ValueError(f"GraphQL parse error: unexpected value {val!r}")


def parse_graphql(query: str, variables: dict | None = None) -> list[GraphQLField]:
    """Parse a GraphQL query document into top-level GraphQLFields."""
    return _Parser(_tokenize(query), variables or {}).document()


# --- compilation to QueryBuilder requests ------------------------------------

def _snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def translate_where(where: dict | None) -> dict | None:
    """GraphQL where-input -> parse_where suffix dict:
    {f: {gte: 5, lt: 9}} -> {"f_gte": 5, "f_lt": 9}; AND/OR recurse.
    The op set is validated downstream by parse_where/_OPS."""
    if where is None:
        return None
    out: dict = {}
    for key, val in where.items():
        if key in ("AND", "OR"):
            if not isinstance(val, list):
                raise ValueError(f"{key} expects a list of where objects")
            out[key] = [translate_where(v) for v in val]
        elif isinstance(val, dict):
            for op, opval in val.items():
                out[f"{key}_{op}"] = opval
        else:
            # bare scalar = eq shorthand (the dict path's own convention)
            out[key] = val
    return out


def _parse_order(order) -> list[tuple[str, str]]:
    """The generator's `order: String` arg: "f desc" / "f1 asc, f2 desc"."""
    if order is None:
        return []
    out = []
    for part in str(order).split(","):
        bits = part.split()
        if not bits:
            continue
        fld = bits[0]
        direction = bits[1].lower() if len(bits) > 1 else "asc"
        if direction not in ("asc", "desc"):
            raise ValueError(f"bad order direction: {direction!r}")
        out.append((fld, direction))
    return out


def _entity_for(qb: QueryBuilder, field_name: str) -> tuple[str, bool]:
    """(entity_key, is_list) for a top-level field, by the generator's
    naming rule: `Item` -> single, `Items` -> list (generated.go:246-338)."""
    snake = _snake(field_name)
    if snake in qb.entities:
        return snake, False
    if snake.endswith("s") and snake[:-1] in qb.entities:
        return snake[:-1], True
    raise KeyError(f"unknown query field: {field_name}")


def compile_field(qb: QueryBuilder, f: GraphQLField) -> DataFrame:
    """One top-level field -> the QueryBuilder resolve() call the dict
    path would make (ResolveSingle / ResolveMultiple analog)."""
    entity, is_list = _entity_for(qb, f.name)
    ent = qb.entities[entity]
    select = list(f.selection) if f.selection else None
    if select is not None:
        select = [
            s if isinstance(s, str) else {s[0]: s[1]} for s in select
        ]
    if not is_list:
        if "id" not in f.args:
            raise ValueError(f"{f.name} requires an id argument")
        extra = set(f.args) - {"id"}
        if extra:
            raise ValueError(f"unexpected args for single lookup: {extra}")
        return qb.resolve(
            entity,
            select=select,
            where={f"{ent.id_field}_eq": f.args["id"]},
            limit=1,
        )
    allowed = {"page", "limit", "order", "where"}
    extra = set(f.args) - allowed
    if extra:
        raise ValueError(f"unexpected args: {extra}")
    return qb.resolve(
        entity,
        select=select,
        where=translate_where(f.args.get("where")),
        order=_parse_order(f.args.get("order")),
        limit=f.args.get("limit"),
        page=f.args.get("page"),
    )


def execute_graphql(
    qb: QueryBuilder, query: str, variables: dict | None = None
) -> DataFrame | dict[str, DataFrame]:
    """Run a GraphQL query string against the builder. A single top-level
    field returns its DataFrame directly; multiple fields return
    {field_name: DataFrame}."""
    fields = parse_graphql(query, variables)
    if not fields:
        raise ValueError("empty GraphQL selection")
    results = {f.name: compile_field(qb, f) for f in fields}
    if len(results) == 1:
        return next(iter(results.values()))
    return results
