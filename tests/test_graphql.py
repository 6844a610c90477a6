"""GraphQL string front end (plans/graphql.py) — string-path ≡ dict-path.

VERDICT r4 next-round #6: the parser must be proven equivalent to the
request-dict path on the driver-green QueryBuilder entries (j1_qb_relation,
j2_qb_derived, qb_resolve_single), plus the where/order/page surface and
the generator's error behavior (generated/query/generated.go:60-338,
cmd/core/query_resolver.go:541-614)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.declarations import driver_schema
from layerg_crawler_v2_spark.plans.graphql import (
    execute_graphql,
    parse_graphql,
    translate_where,
)
from layerg_crawler_v2_spark.plans.query import QueryBuilder


@pytest.fixture(scope="module")
def qb(spark, sf_dir):
    tables = {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in ("customer", "orders", "events")
    }
    return QueryBuilder(tables, driver_schema().entity_graph())


def _same(a, b, key=None):
    ca, cb = sorted(a.columns), sorted(b.columns)
    assert ca == cb, (ca, cb)
    ra = [tuple(r) for r in a.select(*ca).collect()]
    rb = [tuple(r) for r in b.select(*ca).collect()]
    if key is None:
        ra, rb = sorted(ra, key=repr), sorted(rb, key=repr)
    assert ra == rb


# --- parity with the driver-green dict-path entries --------------------------

def test_parity_j1_relation(qb):
    """String path of the j1_qb_relation driver entry."""
    s = execute_graphql(
        qb,
        """{ Orders { o_orderkey o_totalprice
                      customer { c_name c_mktsegment } } }""",
    )
    d = qb.resolve(
        "order",
        select=[
            "o_orderkey",
            "o_totalprice",
            {"customer": ["c_name", "c_mktsegment"]},
        ],
    )
    flat = lambda df: df.select(  # noqa: E731
        "o_orderkey",
        "o_totalprice",
        F.col("customer.c_name").alias("c_name"),
        F.col("customer.c_mktsegment").alias("c_mktsegment"),
    )
    _same(flat(s), flat(d))


def test_parity_j2_derived(qb):
    """String path of the j2_qb_derived driver entry (@derivedFrom)."""
    s = execute_graphql(
        qb, "{ Customers { c_custkey c_name orders { o_orderkey } } }"
    )
    d = qb.resolve(
        "customer",
        select=["c_custkey", "c_name", {"orders": ["o_orderkey"]}],
    )
    flat = lambda df: df.select(  # noqa: E731
        "c_custkey",
        "c_name",
        F.coalesce(
            F.to_json(F.transform("orders", lambda x: x["o_orderkey"])),
            F.lit("[]"),
        ).alias("order_keys"),
    )
    _same(flat(s), flat(d))


def test_parity_resolve_single(qb):
    """String path of the qb_resolve_single driver entry: the generator's
    `Customer(id:)` field compiles to id-eq + LIMIT 1."""
    s = execute_graphql(
        qb, "{ Customer(id: 42) { c_custkey c_name c_acctbal } }"
    )
    d = qb.resolve(
        "customer",
        select=["c_custkey", "c_name", "c_acctbal"],
        where={"c_custkey_eq": 42},
        limit=1,
    )
    _same(s, d)


def test_parity_where_order_page(qb):
    """Nested AND/OR where tree + order string + limit/page pagination."""
    q = """
    query Q($lo: Int) {
      Events(limit: 10, page: 2, order: "event_id asc",
             where: {OR: [{value: {gte: $lo}},
                          {event_type: {eq: "purchase"}}],
                     user_id: {lt: 500}}) {
        event_id user_id event_type value
      }
    }
    """
    s = execute_graphql(qb, q, variables={"lo": 900})
    d = qb.resolve(
        "event",
        select=["event_id", "user_id", "event_type", "value"],
        where={
            "OR": [{"value_gte": 900}, {"event_type_eq": "purchase"}],
            "user_id_lt": 500,
        },
        order=[("event_id", "asc")],
        limit=10,
        page=2,
    )
    _same(s, d)
    assert s.count() == 10


def test_parity_multi_op_field(qb):
    """One field object carrying two ops -> two suffix conditions."""
    s = execute_graphql(
        qb,
        '{ Events(where: {value: {gte: 100, lt: 200}}) { event_id value } }',
    )
    d = qb.resolve(
        "event",
        select=["event_id", "value"],
        where={"value_gte": 100, "value_lt": 200},
    )
    _same(s, d)


def test_multi_field_document(qb):
    out = execute_graphql(
        qb,
        """{ Customer(id: 1) { c_name }
             Orders(limit: 3, order: "o_orderkey asc") { o_orderkey } }""",
    )
    assert set(out) == {"Customer", "Orders"}
    assert out["Customer"].count() == 1
    assert out["Orders"].count() == 3


# --- translate_where unit surface --------------------------------------------

def test_translate_where_shapes():
    assert translate_where(None) is None
    assert translate_where({"f": {"gte": 1, "lt": 2}}) == {
        "f_gte": 1,
        "f_lt": 2,
    }
    assert translate_where({"AND": [{"a": {"eq": 1}}, {"b": {"ne": 2}}]}) == {
        "AND": [{"a_eq": 1}, {"b_ne": 2}]
    }
    # bare scalar = eq shorthand, matching the dict path's own convention
    assert translate_where({"f": 7}) == {"f": 7}


# --- parser behavior ---------------------------------------------------------

def test_parser_values_and_variables():
    (f,) = parse_graphql(
        'query ($v: [Int!]) { Events(where: {user_id: {in: $v}, '
        'props: {is_null: true}}) { event_id } }',
        variables={"v": [1, 2, 3]},
    )
    assert f.args["where"] == {
        "user_id": {"in": [1, 2, 3]},
        "props": {"is_null": True},
    }
    (g,) = parse_graphql(
        '{ Events(where: {event_type: {in: ["a", "b"], ne: null}}) '
        "{ event_id } }"
    )
    assert g.args["where"]["event_type"] == {"in": ["a", "b"], "ne": None}


def test_parser_comments_and_commas():
    (f,) = parse_graphql(
        """
        # leading comment
        { Events(limit: 5,) {  # trailing comment
            event_id, user_id,
        } }
        """
    )
    assert f.args == {"limit": 5}
    assert f.selection == ["event_id", "user_id"]


@pytest.mark.parametrize(
    "bad",
    [
        "mutation { x }",
        "{ Events { ...frag } }",
        "{ Events { alias: event_id } }",
        "{ Events @skip { event_id } }",
        "{ Orders { customer { nation { n_name } } } }",  # depth > 1
        "{ Events(where: {user_id: {gte: $x}}) { event_id } }",  # undef var
    ],
)
def test_parser_rejects(bad):
    with pytest.raises((ValueError, KeyError)):
        parse_graphql(bad)


def test_unknown_field_and_args(qb):
    with pytest.raises(KeyError):
        execute_graphql(qb, "{ Widgets { id } }")
    with pytest.raises(ValueError):
        execute_graphql(qb, "{ Customer { c_name } }")  # missing id
    with pytest.raises(ValueError):
        execute_graphql(qb, "{ Customers(frob: 1) { c_name } }")
    with pytest.raises(KeyError):
        # unknown filter field rejected by parse_where's whitelist
        execute_graphql(
            qb, "{ Events(where: {nope: {eq: 1}}) { event_id } }"
        ).collect()


# --- property fuzz (the parser is a security boundary: any string may
# --- arrive; it must parse-or-raise, never hang, never mis-compile) ----------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_IDENT = st.from_regex(r"[_A-Za-z][_0-9A-Za-z]{0,10}", fullmatch=True).filter(
    lambda s: s
    not in ("query", "mutation", "subscription", "fragment", "true",
            "false", "null", "on")
)
_SCALAR = st.one_of(
    st.integers(-10**9, 10**9),
    st.booleans(),
    st.none(),
    st.text(
        st.characters(blacklist_characters='"\\', min_codepoint=32,
                      max_codepoint=126),
        max_size=12,
    ),
)


def _render_value(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    return '"' + v + '"'


@settings(max_examples=60, deadline=None)
@given(
    field=_IDENT,
    args=st.dictionaries(_IDENT, _SCALAR, max_size=4),
    selection=st.lists(_IDENT, min_size=1, max_size=5),
)
def test_fuzz_roundtrip_grammar(field, args, selection):
    """Any document generated FROM the grammar parses back to exactly the
    structure that generated it (args, selection, field name)."""
    arg_src = (
        "(" + ", ".join(f"{k}: {_render_value(v)}" for k, v in args.items()) + ")"
        if args
        else ""
    )
    src = "{ %s%s { %s } }" % (field, arg_src, " ".join(selection))
    (f,) = parse_graphql(src)
    assert f.name == field
    assert f.args == args
    assert f.selection == selection


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_fuzz_garbage_never_hangs(garbage):
    """Arbitrary input parses or raises ValueError/KeyError — no hangs, no
    other exception types leaking from the lexer/parser."""
    try:
        parse_graphql(garbage)
    except (ValueError, KeyError):
        pass


@settings(max_examples=80, deadline=None)
@given(
    st.recursive(
        st.dictionaries(
            _IDENT,
            st.dictionaries(
                st.sampled_from(["eq", "ne", "gt", "gte", "lt", "lte"]),
                st.integers(-1000, 1000),
                min_size=1,
                max_size=2,
            ),
            max_size=2,
        ),
        lambda inner: st.fixed_dictionaries(
            {}, optional={"AND": st.lists(inner, max_size=2),
                          "OR": st.lists(inner, max_size=2)}
        ).flatmap(
            lambda conn: st.dictionaries(
                _IDENT,
                st.dictionaries(
                    st.sampled_from(["eq", "lt"]),
                    st.integers(-1000, 1000),
                    min_size=1,
                    max_size=1,
                ),
                max_size=1,
            ).map(lambda base: {**base, **conn})
        ),
        max_leaves=6,
    )
)
def test_fuzz_where_translation_total(where):
    """translate_where is total over grammar-shaped where trees and
    produces only suffix keys / AND / OR."""
    out = translate_where(where)
    if out is None:
        return

    def check(d):
        for k, v in d.items():
            if k in ("AND", "OR"):
                for sub in v:
                    check(sub)
            else:
                assert "_" in k  # field_op suffix form
                assert not isinstance(v, dict)

    check(out)


def test_single_is_point_lookup_plan(qb):
    """The single path keeps the dict path's plan shape: a filter that
    reaches the scan + LIMIT, no join, no window."""
    df = execute_graphql(qb, "{ Order(id: 7) { o_orderkey o_totalprice } }")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" in plan or "GlobalLimit" in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan
