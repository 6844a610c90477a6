"""Integer-exact PageRank (operators/graph.py): pure-python recurrence
parity, mass accounting, ordering sanity, partitioning-invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.graph import PAGERANK_SCALE, pagerank


def py_pagerank(edges, iterations=3, scale=PAGERANK_SCALE, damp=85):
    """The same integer recurrence, sequentially (the <20-LoC oracle style
    of tests/reference_sim.py)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = ((100 - damp) * scale // n) // 100
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += rank[s] // deg[s]
        rank = {v: base + (damp * inc[v]) // 100 for v in nodes}
    return rank


EDGES = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3), (4, 1)]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["rank"] for r in pagerank(df, **kw).collect()
    }


def test_matches_python_recurrence(spark):
    got = _spark_ranks(spark, EDGES, iterations=3)
    assert got == py_pagerank(EDGES, iterations=3)


def test_single_iteration_matches(spark):
    got = _spark_ranks(spark, EDGES, iterations=1)
    assert got == py_pagerank(EDGES, iterations=1)


def test_mass_bounded_and_positive(spark):
    got = _spark_ranks(spark, EDGES, iterations=3)
    total = sum(got.values())
    # floor rounding + the dangling share may only LOSE mass, never create
    assert 0 < total <= PAGERANK_SCALE
    assert all(r > 0 for r in got.values())


def test_hub_outranks_leaves(spark):
    # star: everyone links to 9; 9 links back to 0 only
    star = [(i, 9) for i in range(9)] + [(9, 0)]
    got = _spark_ranks(spark, star, iterations=3)
    assert got[9] == max(got.values())
    # leaves 1..8 are symmetric: identical integer ranks
    assert len({got[i] for i in range(1, 9)}) == 1


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    one = {r["node"]: r["rank"] for r in pagerank(df.coalesce(1)).collect()}
    many = {r["node"]: r["rank"] for r in pagerank(df.repartition(7)).collect()}
    assert one == many


def test_rejects_bad_params(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damp_pct=101)


def test_dangling_mass_dropped_identically(spark):
    # node 3 has no outlinks: its cash vanishes each round on BOTH the
    # Spark side and the python recurrence (documented semantics)
    dangle = [(1, 2), (2, 3), (1, 3)]
    assert _spark_ranks(spark, dangle, iterations=2) == py_pagerank(
        dangle, iterations=2
    )


def test_triangle_counts_known_graph(spark):
    from layerg_crawler_v2_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4}: C(4,3)=4 triangles, each node in C(3,2)=3 of them;
    # node 5 hangs off node 1 with no triangle
    k4 = [(i, j) for i in range(1, 5) for j in range(1, 5) if i < j]
    edges = spark.createDataFrame(k4 + [(5, 1)], "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_direction_and_dup_invariant(spark):
    from layerg_crawler_v2_spark.operators.graph import triangle_counts

    # same triangle given as mixed directions + duplicates: counted once
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 3)],
        "src long, dst long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_free_graph_empty(spark):
    from layerg_crawler_v2_spark.operators.graph import triangle_counts

    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_counts(path).count() == 0


# --- TrustRank ---------------------------------------------------------------

def test_trustrank_spam_farm_starves(spark):
    from layerg_crawler_v2_spark.operators.graph import trustrank

    # trusted component: 0 -> 1 -> 2 -> 0; spam farm: 10 <-> 11 densely
    # linked but unreachable from the seeds
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["rank"] for r in trustrank(edges, seeds, iterations=3).collect()}
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    # the farm's rank decays geometrically from ZERO teleport: after k=3
    # integer iterations it is exactly 0 (0.85^3 of an initial 0)
    assert got[10] == 0 and got[11] == 0


def test_trustrank_seed_without_edges_keeps_teleport(spark):
    from layerg_crawler_v2_spark.operators.graph import trustrank, PAGERANK_SCALE

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "node long")  # isolated seed
    got = {r["node"]: r["rank"] for r in trustrank(edges, seeds, iterations=1).collect()}
    # the isolated seed holds the full base mass; non-seeds get only
    # link-propagated mass (node 2 inherits 85% of node 1's initial 0)
    assert got[99] == (15 * PAGERANK_SCALE // 1) // 100
    assert got[1] == 0 and got[2] == 0


def test_trustrank_uniform_seed_set_equals_pagerank(spark):
    from layerg_crawler_v2_spark.operators.graph import pagerank, trustrank

    # when EVERY node is a seed, the recurrence is exactly PageRank
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    tr = {r["node"]: r["rank"] for r in trustrank(edges, nodes, iterations=3).collect()}
    assert pr == tr


# --- HITS hubs & authorities --------------------------------------------------

def py_hits(edges, iterations=2, scale=None):
    from layerg_crawler_v2_spark.operators.graph import HITS_SCALE

    scale = scale or HITS_SCALE
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {v: scale // len(nodes) for v in nodes}
    a = dict(h)
    for _ in range(iterations):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[d] += h[s]
        sa = max(sum(raw.values()), 1)
        a = {v: raw[v] * scale // sa for v in nodes}
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[s] += a[d]
        sh = max(sum(raw.values()), 1)
        h = {v: raw[v] * scale // sh for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def _spark_hits(spark, edges, **kw):
    from layerg_crawler_v2_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["hub"], r["authority"]) for r in hits(df, **kw).collect()
    }


def test_hits_matches_python_recurrence(spark):
    assert _spark_hits(spark, EDGES, iterations=2) == py_hits(EDGES, 2)
    assert _spark_hits(spark, EDGES, iterations=1) == py_hits(EDGES, 1)


def test_hits_star_hub_vs_authority(spark):
    # star: 0..8 all link to 9 -> 9 is THE authority with zero hub score;
    # the spokes are equal hubs with zero authority
    star = [(i, 9) for i in range(9)]
    got = _spark_hits(spark, star, iterations=2)
    hubs = {v: h for v, (h, _) in got.items()}
    auths = {v: a for v, (_, a) in got.items()}
    assert auths[9] > 0 and hubs[9] == 0
    assert len({hubs[i] for i in range(9)}) == 1 and hubs[0] > 0
    assert all(auths[i] == 0 for i in range(9))


def test_hits_mass_bounded(spark):
    from layerg_crawler_v2_spark.operators.graph import HITS_SCALE

    got = _spark_hits(spark, EDGES, iterations=3)
    assert 0 < sum(h for h, _ in got.values()) <= HITS_SCALE
    assert 0 < sum(a for _, a in got.values()) <= HITS_SCALE


def test_hits_partitioning_invariant(spark):
    from layerg_crawler_v2_spark.operators.graph import hits

    df = spark.createDataFrame(EDGES, "src long, dst long")
    one = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df.repartition(1), iterations=2).collect()
    }
    many = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df.repartition(7, "dst"), iterations=2).collect()
    }
    assert one == many


def test_hits_rejects_bad_params(spark):
    from layerg_crawler_v2_spark.operators.graph import hits

    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        hits(df, iterations=0)
