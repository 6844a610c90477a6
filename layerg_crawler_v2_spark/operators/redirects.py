"""Redirect-chain resolution by pointer doubling — O(log H) shuffles.

A crawl's fetch log is full of 3xx hops: the URL the frontier scheduled is
not the URL whose content got stored, and dedup/canonicalization wants
every source URL mapped to its *terminal* target (the analog of the
reference's canonical-entity resolution on write,
internal/services/query_service.go's ResolveSingle discipline — every
lookup lands on the one canonical row). The naive plan follows one hop per
pass: H self-joins for the longest chain H. At 10^10 URLs with chains up
to ~20 hops that is 20 full shuffles of the whole mapping.

Pointer doubling (a.k.a. pointer jumping, the classic PRAM list-ranking
move) gets the same answer in ceil(log2(H)) rounds: maintain for every
node a pair (cur, hops) = "the node 2^k redirects ahead (saturating at a
terminal), and how many real hops that skipped", then compose the map with
itself — jump[x] = jump[jump[x]], hops adding. Terminals self-loop with
hop cost 0, so resolved rows saturate exactly; rows still sitting on a
node with an outgoing edge after the final round are redirect *cycles*
(or chains longer than 2^rounds) and come back unresolved=false, the same
verdict the DuckDB oracle's depth-capped recursive CTE reaches.

Scale shape: each round is ONE self-equi-join of the map on its own key
(shuffle on `cur`) — no driver state, no iteration-count proportional to
chain length, and the map is |nodes| rows throughout. 6 rounds cover
chains of length 64; real redirect chains beyond a handful of hops are
policy-rejected by crawlers anyway (the politeness scheduler's analog of
max_redirects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame, rounds: int = 6, reuse: bool = True
) -> DataFrame:
    """Resolve every redirect source to its terminal URL.

    `edges` is (src, dst) with at most one outgoing edge per src (a
    redirect map is a function; callers dedupe upstream). Returns one row
    per distinct src:

        (url, terminal_url, hops BIGINT, resolved BOOLEAN)

    where chains longer than 2**rounds and cycles yield
    (url, NULL, NULL, false) — matching a WITH RECURSIVE oracle whose
    recursion is capped at 2**rounds hops.

    reuse=True (the pagerank(reuse=True) discipline, operators/graph.py)
    persists `edges` — consumed 4 times: node union x2, the k=0 jump
    join, the terminal probe — and `localCheckpoint`s the jump map at
    the top of every doubling round. Without the checkpoint the
    self-composition doubles the LINEAGE each round too: jump_k's plan
    embeds jump_{k-1} twice, so 6 rounds unroll to a 2^6-leaf tree (the
    r4 plan audit counted 390 exchanges) that recomputes every earlier
    round exponentially often and would not survive real chain depth.
    Checkpointing truncates the plan to the one materialized map, so
    each round is exactly ONE |nodes|-row shuffle — O(log H) total, the
    complexity the algorithm promises. The trade: the call becomes
    EAGER (each checkpoint runs a job on call, not on first action),
    the same trade iterative jobs always make.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")

    if reuse:
        edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # jump map at k=0: one redirect ahead, terminals self-loop at cost 0
    jump = nodes.join(edges, nodes["node"] == edges["src"], "left").select(
        "node",
        F.coalesce("dst", "node").alias("cur"),
        F.when(F.col("dst").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("hops"),
    )
    for _ in range(rounds):
        if reuse:
            # truncate the doubled lineage: materialize THIS round's map
            # once and compose over the checkpointed scan, not over two
            # copies of the entire prior plan (old checkpoints are
            # unpersisted by the ContextCleaner once unreferenced)
            jump = jump.localCheckpoint(eager=True)
        ahead = jump.select(
            F.col("node").alias("a_node"),
            F.col("cur").alias("a_cur"),
            F.col("hops").alias("a_hops"),
        )
        # compose the map with itself: every cur IS a node (dst and
        # terminals are both in the node set), so inner join is total
        jump = jump.join(ahead, jump["cur"] == ahead["a_node"]).select(
            "node",
            F.col("a_cur").alias("cur"),
            (F.col("hops") + F.col("a_hops")).alias("hops"),
        )

    has_out = edges.select(F.col("src").alias("cur")).distinct().withColumn(
        "open", F.lit(True)
    )
    return (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .join(jump, "node")
        .join(has_out, "cur", "left")
        .select(
            F.col("node").alias("url"),
            F.when(F.col("open").isNull(), F.col("cur")).alias("terminal_url"),
            F.when(F.col("open").isNull(), F.col("hops"))
            .cast("bigint")
            .alias("hops"),
            F.col("open").isNull().alias("resolved"),
        )
    )


def pagination_series(next_edges: DataFrame, reuse: bool = True) -> DataFrame:
    """Assemble rel=next pagination chains into ordered series — the
    consumer of functions/extract.py's _RelNextPrevExtractor: multi-page
    articles/listings become ONE logical document (series-granularity
    dedup, in-order seq-packing) instead of N disconnected pages.

    `next_edges` is (url, next_url): each page's declared successor
    (first-declaration-wins upstream, so one outgoing edge per url;
    conflicting *incoming* edges — two pages declaring the same next —
    are resolved deterministically to the lexicographically-least
    predecessor, and the orphaned predecessor starts its own series).

    Reuses resolve_redirects' pointer doubling on the REVERSED edges:
    following predecessor pointers from any page reaches the series HEAD
    in O(log H) self-join rounds, and the accumulated hop count IS the
    page's position. Heads (never anyone's next) anchor position 0.

    Returns (url, series_head, position BIGINT, resolved BOOLEAN) — one
    row per URL in the next-graph; cycles (malformed pagination loops)
    and chains past 2^rounds come back (url, NULL, NULL, false), same
    verdict as the redirect resolver.

    reuse=True `localCheckpoint`s the (possibly expensive — typically an
    Arrow tree-extractor pass upstream) edge frame, consumed here by the
    reversed-map groupBy AND the heads anti-join, so the extractor runs
    exactly once and downstream plans scan the materialized RDD; it
    flows through to resolve_redirects' per-round localCheckpoint so the
    doubling lineage stays linear in rounds (see resolve_redirects).
    """
    edges = next_edges.select(
        F.col("url").cast("string").alias("u"),
        F.col("next_url").cast("string").alias("n"),
    ).filter(F.col("n").isNotNull() & (F.col("u") != F.col("n")))
    if reuse:
        edges = edges.localCheckpoint(eager=True)
    # reversed (successor -> predecessor) map; dedupe conflicting
    # incoming edges to the least predecessor (deterministic)
    rev = edges.groupBy(F.col("n").alias("src")).agg(
        F.min("u").alias("dst")
    )
    # (url, terminal_url, hops, resolved)
    resolved = resolve_redirects(rev, reuse=reuse)
    successors = resolved.select(
        F.col("url"),
        F.col("terminal_url").alias("series_head"),
        F.col("hops").alias("position"),
        "resolved",
    )
    # heads: in the graph but never a successor — position 0 of their own
    # series (includes orphaned predecessors after conflict dedup)
    heads = (
        edges.select(F.col("u").alias("url"))
        .distinct()
        .join(rev.select(F.col("src").alias("url")), "url", "left_anti")
        .select(
            "url",
            F.col("url").alias("series_head"),
            F.lit(0).cast("bigint").alias("position"),
            F.lit(True).alias("resolved"),
        )
    )
    return successors.unionByName(heads)
