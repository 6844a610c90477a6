"""Link-graph PageRank: the batch analog of the crawler's OPIC priority.

The reference maintains crawl priority as an online OPIC cash flow
(SURVEY.md S2/W-rows; the Go scheduler's per-host score mirrors
`internal/worker/worker.go`'s queue ordering) — OPIC is literally
"PageRank computed incrementally while crawling" (Abiteboul et al.,
WWW'03). A batch engine over the same link graph wants the offline twin:
k power-iteration rounds of PageRank over (src, dst) edges, so recrawl
priority / seed scoring can be recomputed from a frontier snapshot.

Cross-engine exactness (the repo's DECIMAL discipline, taken further):
floating-point PageRank is order-dependent — a sum of doubles shuffled
differently disagrees in the last ulp, and a DuckDB oracle would
hash-mismatch. So ranks are integer "cash": the total mass starts as
`scale` (default 1e12) split evenly, every division is *integer* division
(`div` in Spark, `//` in DuckDB), and every sum is a sum of BIGINTs —
associative, commutative, exact on any engine at any partitioning. The
damping update is

    rank' = ((100-d)*scale div n) div 100  +  (d * incoming) div 100

with d=85, i.e. classic 0.85 damping in hundredths. Mass lost to floor
rounding and dangling nodes is deliberately dropped (documented, bounded
by n_nodes + dangling share per round) — both engines drop it identically.

Scale shape (the part that must survive 10^10 URLs):
  * each iteration is ONE shuffle: edges join ranks on src (broadcast-free,
    both sides hash-partitioned on src; outdeg is co-partitioned on the
    same key so AQE coalesces it into the same exchange), then a
    groupBy(dst) whose map-side partial sums shrink the exchange to one
    row per distinct dst per partition;
  * the node set and its count are computed once and reused; the count
    reaches the plan as a broadcast scalar, never a driver round-trip
    inside the loop;
  * k is small and fixed (power iteration converges geometrically; the
    crawler analog recomputes priorities between crawl waves, it does not
    iterate to 1e-9) — the lazy plan is k joins deep, which Catalyst
    handles fine for k <= ~10; a production run at 10^10 edges would
    checkpoint `ranks` every few iterations to cut lineage, exactly like
    the frontier's every-K compaction (streaming/rounds.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 1_000_000_000_000
DAMP_PCT = 85  # 0.85 damping, in hundredths so the update stays integer

# HITS uses a smaller mass than PageRank because its normalization step
# multiplies a raw score (<= scale after the previous normalize) by scale
# before the integer divide: 1e9 * 1e9 = 1e18 < 2^63-1 ~ 9.2e18, with
# headroom for the raw sums (sum_v a_raw <= scale * max_outdeg stays exact
# in int64 for max_outdeg <= ~9e9 — any real host graph).
HITS_SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
    damp_pct: int = DAMP_PCT,
    reuse: bool = True,
) -> DataFrame:
    """k rounds of integer-exact PageRank over distinct (src, dst) edges.

    Returns (node BIGINT, rank BIGINT) with sum(rank) <= scale. Callers
    pass edges already DISTINCT (duplicate edges would double-count cash,
    matching neither PageRank nor the oracle).

    reuse=True persists the two key-sized invariants every iteration
    re-reads (the node set and the out-degree table) with the default
    MEMORY_AND_DISK policy — without it the unrolled lazy plan recomputes
    both subtrees k+1 times (the r4 plan audit counted 50 exchanges for
    k=3; with reuse the recomputation collapses to the per-iteration
    rank shuffle). They stay cached after return because the returned
    frame is lazy; Spark's LRU evicts them, or the caller clears them
    explicitly — the documented trade for a k-times-smaller plan.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0 <= damp_pct <= 100:
        raise ValueError(f"damp_pct must be in [0, 100], got {damp_pct}")

    if reuse:
        # edges are consumed k+3 times (node union x2, out-degrees, one
        # join per iteration): persist them too, or an expensive upstream
        # (e.g. the extracted+canonicalized link graph, two Arrow UDFs per
        # page) re-executes per consumption — the r4s11 UDF-duplication
        # sweep caught 22 extractor re-runs in frontier_pagerank_hosts
        edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    if reuse:
        nodes = nodes.persist()
        deg = deg.persist()
    total = nodes.agg(F.count("*").alias("n_nodes"))

    # even split of the integer mass; the floor remainder (< n_nodes) is
    # dropped identically on both engines
    ranks = nodes.crossJoin(F.broadcast(total)).select(
        "node", F.expr(f"{scale} div n_nodes").alias("rank")
    )
    base = F.expr(f"(({100 - damp_pct} * {scale}) div n_nodes) div {100}")

    for _ in range(iterations):
        incoming = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst"), F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.join(incoming.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                (
                    base
                    + F.expr(f"({damp_pct} * coalesce(inc, CAST(0 AS BIGINT))) div 100")
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").cast("bigint").alias("rank"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph —
    the standard cohesion/spam signal (link farms are near-cliques; honest
    hub neighborhoods are sparse). Input: directed (src, dst) rows; edges
    are canonicalized to (a < b) distinct first, so each undirected edge
    and each triangle is counted exactly once.

    Plan: the two-join enumeration e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) with the
    a < b < c total order — every triangle materializes exactly once as
    its sorted vertex triple. Each join shuffles on one key (b, then
    (a,c) pair); the classic degree-ordering optimization (orient edges
    low-degree -> high-degree so the wedge fan-out is bounded by
    sqrt(|E|)) is a one-column re-sort away and noted here for the
    10^10-edge host graph; at validation scale Catalyst's AQE picks
    broadcast wedges automatically.

    Returns (node, n_triangles), nodes with zero triangles absent.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .filter(F.col("b") < F.col("c"))
        .join(
            e3,
            (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")),
        )
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
    damp_pct: int = DAMP_PCT,
    reuse: bool = True,
) -> DataFrame:
    """k rounds of integer-exact TrustRank (Gyongyi, Garcia-Molina &
    Pedersen, VLDB 2004: "Combating Web Spam with TrustRank") — PageRank
    with the teleport mass personalized onto a trusted seed set. Where
    uniform PageRank hands every node (100-d)% base mass each round, here
    ONLY seeds receive it:

        rank'(v) = [v in seeds] * ((100-d)*scale div |seeds|) div 100
                   + (d * incoming(v)) div 100

    so trust decays outward along links and a spam farm with no inlink
    path from the seeds converges to ~0 regardless of its internal link
    density — the host-demotion signal a crawl scheduler wants next to
    raw PageRank (which dense farms inflate). Seeds with no edges keep
    their teleport mass (node set = graph nodes UNION seeds).

    Same integer-cash discipline and shuffle shape as `pagerank` (ONE
    edges-to-ranks shuffle + one map-side-combined groupBy(dst) per
    iteration; node set / out-degrees / the seed flag persisted once,
    reuse=True); the seed flag rides the persisted node frame, so
    personalization adds ZERO exchanges. Floor-rounding and dangling mass
    are dropped identically on both engines."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0 <= damp_pct <= 100:
        raise ValueError(f"damp_pct must be in [0, 100], got {damp_pct}")

    if reuse:
        edges = edges.persist()  # consumed k+3 times (pagerank rationale)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .union(seeds.select(F.col("node")))
        .distinct()
        .join(
            seeds.select(F.col("node"), F.lit(True).alias("is_seed")),
            "node",
            "left",
        )
        .select("node", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    if reuse:
        nodes = nodes.persist()
        deg = deg.persist()
    n_seeds = seeds.agg(F.count("*").alias("n_seeds"))

    ranks = nodes.crossJoin(F.broadcast(n_seeds)).select(
        "node",
        F.when(F.col("is_seed"), F.expr(f"{scale} div n_seeds"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank"),
    )
    base = F.when(
        F.col("is_seed"),
        F.expr(f"(({100 - damp_pct} * {scale}) div n_seeds) div {100}"),
    ).otherwise(F.lit(0))

    for _ in range(iterations):
        incoming = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst"), F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.join(incoming.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(n_seeds))
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({damp_pct} * coalesce(inc, CAST(0 AS BIGINT))) div 100"
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").cast("bigint").alias("rank"))


def hits(
    edges: DataFrame,
    iterations: int = 2,
    scale: int = HITS_SCALE,
    reuse: bool = True,
) -> DataFrame:
    """k rounds of integer-exact HITS (Kleinberg, JACM 1999: "Authoritative
    sources in a hyperlinked environment") over distinct (src, dst) edges.

    The mutual-reinforcement pair PageRank collapses into one score:

        authority(v) = sum of hub(u) over edges u -> v
        hub(u)       = sum of authority(v) over edges u -> v

    each half-step followed by L1 renormalization back to `scale` — the
    crawl reading: authorities are the pages worth fetching, hubs are the
    index/listing pages worth re-crawling for link DISCOVERY (a high-hub
    page's outlinks reach the good content), a signal OPIC/PageRank can't
    give because they only reward being linked TO.

    Cross-engine exactness (the pagerank/trustrank integer-cash
    discipline): classic HITS L2-normalizes in floats, which is
    order-dependent and would hash-mismatch a DuckDB oracle; here the
    normalize is integer L1 —

        x'(v) = (x_raw(v) * scale) div max(sum_raw, 1)

    — exact on any engine at any partitioning (BIGINT sums are associative;
    the divide floors identically). Floor mass is dropped identically on
    both engines; nodes with no inlinks hold authority 0, no outlinks hub 0.

    Scale shape: per iteration exactly TWO rank shuffles (edges join h on
    src + map-side-combined groupBy(dst); then edges join a on dst +
    groupBy(src)) — the minimum HITS admits, mirroring pagerank's
    one-per-iteration. Each normalization sum is a 1-row aggregate that
    reaches the plan as a broadcast scalar (crossJoin(broadcast(...)), the
    pagerank n_nodes pattern), never a driver round-trip. The node set is
    persisted once (reuse=True, same trade as pagerank's).

    Returns (node, hub BIGINT, authority BIGINT), every graph node present.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")

    if reuse:
        edges = edges.persist()  # consumed 2k+2 times (pagerank rationale)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if reuse:
        nodes = nodes.persist()
    total = nodes.agg(F.count("*").alias("n_nodes"))

    hub = nodes.crossJoin(F.broadcast(total)).select(
        "node", F.expr(f"{scale} div n_nodes").alias("x")
    )

    def _half(x: DataFrame, key: str, out: str) -> DataFrame:
        # x is keyed by `key`'s JOIN side: authority step folds hub over
        # src and groups by dst; hub step folds authority over dst and
        # groups by src
        other = "dst" if key == "src" else "src"
        raw = (
            edges.join(x.withColumnRenamed("node", key), key)
            .groupBy(F.col(other).alias("node"))
            .agg(F.sum("x").alias("raw"))
        )
        s = raw.agg(F.sum("raw").alias("s_raw"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(s))
            .select(
                "node",
                F.expr(
                    f"(coalesce(raw, CAST(0 AS BIGINT)) * {scale})"
                    " div greatest(s_raw, CAST(1 AS BIGINT))"
                ).alias("x"),
            )
        )

    auth = hub
    for _ in range(iterations):
        auth = _half(hub, "src", "dst")
        hub = _half(auth, "dst", "src")
    return (
        nodes.join(hub.withColumnRenamed("x", "hub"), "node")
        .join(auth.withColumnRenamed("x", "authority"), "node")
        .select(
            "node",
            F.col("hub").cast("bigint").alias("hub"),
            F.col("authority").cast("bigint").alias("authority"),
        )
    )
