#!/usr/bin/env python
"""Bench harness (driver contract + scaling-evidence protocol).

Default mode: run the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a synthetic-frontier
crawl throughput measurement, and print ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`--crawl-only --cpus N` mode: run ONLY the frontier crawl job at local[N] and
print its JSON (used by --scaling via subprocesses so each parallelism level
gets a fresh JVM — the sandbox proxy for the N vs 4N executor-cluster rule in
BASELINE.json / BASELINE.md §protocol).

`--scaling` mode: run the identical crawl input at local[N] and local[4N],
compute efficiency = (thr_4N / thr_N) / 4, and write BENCH/BASELINE.md.

`--ab <git-ref>` mode: strictly-interleaved A/B of this tree vs the ref's
own bench.py (detached worktree) on identical input — the one-command
engine-vs-host-noise regression answer (VERDICT r3 next #1).

Every timed window is bracketed by a fixed-work CPU probe AND a fixed-size
IO probe (write+fsync+reread on the bench tmp fs) whose wall times are
published in the JSON (`probe_*` / `io_probe_*` fields, `contended` flag),
so a noise-contaminated record — CPU-starved or writeback-starved — is
self-identifying at record time.

Queries are forced end-to-end with a `noop`-format write (full plan executes,
zero driver collect cost) — the same discipline as Spark's own benchmarks.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q1_pricing_summary",      # TPC-H Q1 agg over lineitem (A-class)
    "q3_shipping_priority",    # 3-way join + agg + top-N (J/O-class)
    "j2_derived_collect_list", # inverse-relation join (kills reference N+1)
    "a4_balance_replay",       # signed-delta stateful replay (A4)
    "w2_topk_per_key",         # window top-K per key (W2)
    "o3_pagination",           # row_number pagination (O3)
    "set_anti_seen_diff",      # seen-set anti-join (A2/J6 analog)
    "text_quality_score",      # text pipeline over documents
    "dedup_minhash_lsh_pairs_xx",  # MinHash+LSH band join (xxhash64 family —
                                   # production hash; the md5 twin exists for
                                   # DuckDB-oracle bit-parity, not speed)
    "dedup_simhash",           # JVM simhash (r3: explode→xxhash64→bit-majority;
                               # new headline entry per VERDICT r2 #4)
    "dedup_winnow_fingerprints_xx",  # r4s9: MOSS winnowing, production
                                     # 64-bit hash family (one numpy sweep
                                     # per Arrow batch; the md5 twin exists
                                     # for DuckDB-oracle bit-parity — it
                                     # pays interpreted HOF-lambda folds,
                                     # measured 12.5s vs ~0.3s at sf0.1)
    "ann_cosine_topk",         # brute-force cosine top-k over embeddings
    "link_graph_pagerank",     # r4s3: 3-iteration integer PageRank (3 shuffles)
    "bm25_keyword_topk",       # r4s3: postings-proportional BM25 retrieval
    "events_sessionize",       # r4s3: native session windows (1 shuffle)
]

CRAWL_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
CRAWL_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))

# --- CPU-contention probe (VERDICT r3 'what's wrong' #1) ---------------------
# Fixed-work scaler run immediately before/after every timed window: P
# concurrent python processes each burn a fixed integer loop; the wall time
# is stored next to every published number so a noise-contaminated record is
# self-identifying at record time instead of needing a post-hoc A/B.
PROBE_PROCS = int(os.environ.get("SPARK_GRAFT_PROBE_PROCS", "32"))
PROBE_LOOPS = int(os.environ.get("SPARK_GRAFT_PROBE_LOOPS", "3000000"))
# Calibration (this host, nothing running in-container): quiet walls for
# (32 procs x 3M loops) range 1.05-1.72 s — the box shares cores with
# OUT-of-container neighbors, so even "quiet" jitters ±30%. Under a full
# 32-process in-container load the probe reads 2.1-2.4 s. Nominal = quiet
# median; the contended threshold sits between the quiet tail and the
# loaded floor. Override via env on different hardware.
PROBE_NOMINAL_S = float(os.environ.get("SPARK_GRAFT_PROBE_NOMINAL", "1.25"))
PROBE_CONTENDED_RATIO = 1.5  # WARN + contended:true above 1.5x nominal

_PROBE_SRC = (
    "import sys\n"
    "n = int(sys.argv[1]); x = 1\n"
    "for i in range(n): x = (x * 1103515245 + 12345) & 0x7FFFFFFF\n"
)


def cpu_probe(procs: int = PROBE_PROCS, loops: int = PROBE_LOOPS) -> float:
    """Wall seconds for `procs` concurrent fixed-work processes."""
    t0 = time.perf_counter()
    ps = [
        subprocess.Popen([sys.executable, "-c", _PROBE_SRC, str(loops)])
        for _ in range(procs)
    ]
    for p in ps:
        p.wait()
    return round(time.perf_counter() - t0, 3)


# --- IO-contention probe (r4s8) ----------------------------------------------
# The CPU probe misses the host's dominant noise source: shared-disk
# writeback stalls (an r4s3 HEAD leg ran 2.3x slow on IO with quiet CPU
# probes). This probe times a fixed write+fsync+reread on the same tmp
# filesystem the crawl store uses. Calibration (quiet): 0.8-1.2 s median
# with writeback spikes to ~3.1 s even when idle — so the contended
# threshold sits ABOVE the quiet tail; a single high sample is jitter,
# both samples high brackets a genuinely IO-starved window.
IO_PROBE_MB = int(os.environ.get("SPARK_GRAFT_IO_PROBE_MB", "256"))
IO_PROBE_NOMINAL_S = float(os.environ.get("SPARK_GRAFT_IO_PROBE_NOMINAL", "1.1"))
IO_PROBE_CONTENDED_RATIO = 4.0
# Official-record bar (VERDICT r4 next #4): the 4.0 contended gate only
# catches catastrophic IO starvation, so an official record could silently
# carry up to ~1.7x IO headwind (the r4 31.3s-official vs 18.3s-quiet gap).
# A headline record is published `official` only when the chosen crawl leg's
# quieter probe side read BELOW this ratio; the harness retries extra legs
# into a quiet window to get there, and discloses `io_headwind` either way.
IO_PROBE_OFFICIAL_RATIO = float(
    os.environ.get("SPARK_GRAFT_IO_OFFICIAL_RATIO", "2.0")
)


def io_probe(mb: int = IO_PROBE_MB) -> float:
    """Wall seconds to write+fsync+reread `mb` MB on the bench tmp fs."""
    blk = b"\xa5" * (1 << 22)
    fd, path = tempfile.mkstemp(prefix="ioprobe_")
    t0 = time.perf_counter()
    try:
        with os.fdopen(fd, "wb") as f:
            for _ in range(mb // 4):
                f.write(blk)
            f.flush()
            os.fsync(f.fileno())
        with open(path, "rb") as f:
            while f.read(1 << 22):
                pass
    finally:
        os.unlink(path)
    return round(time.perf_counter() - t0, 3)


def probe_report(samples: list[float], io_samples: list[float] | None = None) -> dict:
    """Summarize probe samples vs the calibrated nominals; WARN on contention."""
    worst = max(samples) if samples else 0.0
    ratio = round(worst / PROBE_NOMINAL_S, 3) if PROBE_NOMINAL_S else 0.0
    io_samples = io_samples or []
    io_worst = max(io_samples) if io_samples else 0.0
    io_ratio = (
        round(io_worst / IO_PROBE_NOMINAL_S, 3) if IO_PROBE_NOMINAL_S else 0.0
    )
    contended = ratio > PROBE_CONTENDED_RATIO or io_ratio > IO_PROBE_CONTENDED_RATIO
    if contended:
        print(
            f"WARNING: host contended during timed window(s): worst cpu probe "
            f"{worst}s vs nominal {PROBE_NOMINAL_S}s (x{ratio}), worst io "
            f"probe {io_worst}s vs nominal {IO_PROBE_NOMINAL_S}s "
            f"(x{io_ratio}) — treat the published numbers as lower bounds; "
            f"re-run in a quiet window",
            file=sys.stderr,
        )
    out = {
        "probe_nominal_s": PROBE_NOMINAL_S,
        "probe_samples_s": samples,
        "probe_worst_ratio": ratio,
        "contended": contended,
    }
    if io_samples:
        out["io_probe_nominal_s"] = IO_PROBE_NOMINAL_S
        out["io_probe_samples_s"] = io_samples
        out["io_probe_worst_ratio"] = io_ratio
    return out


def _spark(cpus: int, fixed_shuffle: int | None = None):
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ.pop("SPARK_GRAFT_MASTER", None)
    # cluster semantics: memory scales with executor count (an N-executor
    # cluster has N x per-executor heap) — local-mode analog is heap ∝ cores
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{max(8, int(cpus * 1.5))}g")
    from layerg_crawler_v2_spark.session import get_spark

    # scaling runs pin shuffle partitions so BOTH levels execute the identical
    # plan and only core count differs (the cluster-size variable)
    return get_spark(
        master=f"local[{cpus}]",
        app_name=f"bench-{cpus}",
        shuffle_partitions=fixed_shuffle,
    )


def _force(df) -> int:
    """Execute the full plan; return row count via a cheap count on top."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def gen_pages_parquet(spark, n_docs: int, out_path: str) -> None:
    """Materialize the canonical pages corpus ONCE (at full parallelism) so
    every scaling level reloads the identical bytes instead of re-running the
    Python generator on its own (possibly 1-core) session. Setup is untimed
    either way; this only buys wall-clock."""
    from layerg_crawler_v2_spark.datagen import build_pages_synthetic
    from layerg_crawler_v2_spark.streaming.rounds import canonical_pages

    canonical_pages(
        build_pages_synthetic(spark, n_docs, partitions=64), num_partitions=64
    ).write.mode("overwrite").parquet(out_path)


def run_crawl_bench(spark, n_docs: int, rounds: int, pages_path: str | None = None) -> dict:
    """Synthetic frontier crawl: URLs scheduled+fetched/sec (the north metric).

    Shape mirrors a production big-frontier round, not a cold ramp-up: ALL doc
    URLs are seeded (as a distributed table, never a driver list), so round 0
    schedules/fetches the politeness-capped bulk of the frontier and the timed
    work — schedule window, fetch join, Arrow extract, canon, OPIC merge,
    bloom+anti-join, snapshot commit — is compute-dominated. Input is generated
    and cached before timing; a mini-crawl warms codegen + Python workers."""
    from layerg_crawler_v2_spark.datagen import build_pages_synthetic, seed_df, seed_urls
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import (
        CrawlConfig,
        canonical_pages,
        run_crawl,
    )
    from layerg_crawler_v2_spark import schema as S

    # 64 input partitions at every level: identical physical plan, the only
    # variable between scaling levels is the number of cores executing it.
    # The canonical-url-bucketed pages cache is the production page store
    # (SURT-keyed, like the Common-Crawl index) — built untimed, exactly as a
    # real crawler reads an existing Iceberg table rather than re-keying 100TB
    # of html per round.
    if pages_path and os.path.isdir(pages_path):
        # pre-generated corpus: re-establish the url_canon hash partitioning
        # (parquet doesn't carry it) and cache — still fully untimed setup
        pages = (
            spark.read.parquet(pages_path).repartition(64, "url_canon").cache()
        )
    else:
        pages = canonical_pages(
            build_pages_synthetic(spark, n_docs, partitions=64), num_partitions=64
        ).cache()
    pages.count()  # materialize outside the timed window

    # untimed warmup: 1-round mini-crawl warms JVM codegen + Python workers so
    # the timed window measures the engine, not first-run compilation
    wtmp = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        wpages = build_pages_synthetic(spark, 2000).cache()
        run_crawl(spark, wpages, seed_urls(2000, n_seeds=32),
                  SnapshotStore(wtmp), CrawlConfig(rounds=1))
        wpages.unpersist()
    finally:
        shutil.rmtree(wtmp, ignore_errors=True)

    seeds = seed_df(spark, n_docs, n_seeds=n_docs, partitions=64).cache()
    seeds.count()

    tmp = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        store = SnapshotStore(tmp)
        cfg = CrawlConfig(
            rounds=rounds,
            default_max_parallel=256,
            use_bloom=True,
            n_host_buckets=256,
            collect_counters=False,
        )
        probe_before = cpu_probe()
        io_before = io_probe()
        t0 = time.perf_counter()
        run_crawl(spark, pages, seeds, store, cfg, pages_are_canonical=True)
        wall = time.perf_counter() - t0
        probe_after = cpu_probe()
        io_after = io_probe()
        log = store.read(spark, "fetch_log", S.FETCH_LOG)
        fetched = log.count()
        seen = store.last_counter("seen_total", 0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        pages.unpersist()
        seeds.unpersist()
    return {
        "wall_s": round(wall, 3),
        "urls_fetched": fetched,
        "urls_seen": seen,
        "urls_per_sec": round(fetched / wall, 1) if wall > 0 else 0.0,
        "rounds": rounds,
        "n_docs": n_docs,
        "probe_before_s": probe_before,
        "probe_after_s": probe_after,
        "io_probe_before_s": io_before,
        "io_probe_after_s": io_after,
    }


def crawl_leg_quiet(c: dict) -> bool:
    """True when a crawl-bench leg saw an UNcontended host at least once
    (min over its before/after probes — a spike on one side of the window
    doesn't condemn a leg whose other side was quiet). Gates the headline
    mode's third-attempt retry."""
    return (
        min(c["probe_before_s"], c["probe_after_s"])
        <= PROBE_NOMINAL_S * PROBE_CONTENDED_RATIO
        and min(c["io_probe_before_s"], c["io_probe_after_s"])
        <= IO_PROBE_NOMINAL_S * IO_PROBE_CONTENDED_RATIO
    )


def crawl_leg_io_headwind(c: dict) -> float:
    """The published leg's quieter-side IO ratio — the residual IO headwind
    the record carries even after bracketing (min over before/after: a
    spike on one side of the window doesn't condemn the leg)."""
    return round(
        min(c["io_probe_before_s"], c["io_probe_after_s"]) / IO_PROBE_NOMINAL_S,
        3,
    )


def crawl_leg_official(c: dict) -> bool:
    """Official-record bar: cpu quiet at the 1.5x gate AND io headwind
    under IO_PROBE_OFFICIAL_RATIO (2.0 default) — the stricter gate
    VERDICT r4 prescribed so official records can't silently carry a
    ~1.7x writeback headwind."""
    return (
        min(c["probe_before_s"], c["probe_after_s"])
        <= PROBE_NOMINAL_S * PROBE_CONTENDED_RATIO
        and crawl_leg_io_headwind(c) <= IO_PROBE_OFFICIAL_RATIO
    )


def run_headline(
    spark,
    sf_dir: str,
    probes: list[float] | None = None,
    io_probes: list[float] | None = None,
) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    if probes is not None:
        probes.append(cpu_probe())
    if io_probes is not None:
        io_probes.append(io_probe())
    for name in HEADLINE:
        fn = qs[name]
        # best-of-2: this host's neighbor load swings identical queries 2×
        # (see BENCH/BASELINE.md) — the second run also strips first-scan
        # parquet-footer costs, so best-of approximates the uncontended time
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    if probes is not None:
        probes.append(cpu_probe())
    if io_probes is not None:
        io_probes.append(io_probe())
    return out


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--ab", type=str, default=None, metavar="GIT_REF",
                    help="interleaved A/B: alternate the frontier crawl "
                         "between this tree and GIT_REF's own bench.py in a "
                         "detached worktree, identical input, fresh JVM per "
                         "run; reports the HEAD/ref throughput ratio")
    ap.add_argument("--gen-pages", action="store_true",
                    help="only materialize the canonical pages corpus to "
                         "--pages-path, then exit")
    ap.add_argument("--pages-path", type=str, default=None,
                    help="pre-generated canonical pages parquet (untimed "
                         "setup shared across scaling levels)")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--docs", type=int, default=None,
                    help="crawl corpus size; defaults to CRAWL_DOCS "
                         "(SPARK_GRAFT_BENCH_DOCS) except for --scaling, "
                         "which defaults to the 8,000,000-doc published "
                         "gate-pair size")
    ap.add_argument("--rounds", type=int, default=CRAWL_ROUNDS)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--note", type=str, default="",
                    help="label for this scaling session in the persistent "
                         "BENCH/sessions.jsonl transparency log")
    ap.add_argument("--levels", type=str, default="1,4",
                    help="N,4N core counts for --scaling. 1,4 keeps the 4N "
                         "level below this shared host's ~35k urls/sec "
                         "memory/disk-bandwidth ceiling (at 2,8 the 8-core "
                         "level pins against the box cap, so engine speedups "
                         "at N read as efficiency LOSSES); 8 cores are "
                         "always actually free here, 32 threads thrash on "
                         "neighbor spikes")
    args = ap.parse_args()
    if args.docs is None:
        args.docs = 8_000_000 if args.scaling else CRAWL_DOCS

    if args.scaling:
        run_scaling(args)
        return
    if args.ab:
        run_ab(args)
        return

    spark = _spark(args.cpus, fixed_shuffle=64 if (args.crawl_only or args.gen_pages) else None)
    try:
        if args.gen_pages:
            gen_pages_parquet(spark, args.docs, args.pages_path)
            print(json.dumps({"metric": "gen_pages", "path": args.pages_path,
                              "docs": args.docs}))
            return
        if args.crawl_only:
            crawl = run_crawl_bench(spark, args.docs, args.rounds, args.pages_path)
            probe = probe_report(
                [crawl["probe_before_s"], crawl["probe_after_s"]],
                io_samples=[crawl["io_probe_before_s"], crawl["io_probe_after_s"]],
            )
            print(json.dumps({"metric": "frontier_urls_per_sec",
                              "value": crawl["urls_per_sec"], "unit": "urls/sec",
                              **crawl, **probe}))
            return

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        t0 = time.perf_counter()
        probes: list[float] = []
        io_probes: list[float] = []
        queries = run_headline(spark, sf_dir, probes=probes, io_probes=io_probes)
        # best-of-2 for the crawl too (same noisy-host rationale as above),
        # plus ONE extra attempt when every leg so far ran on a contended
        # host (both probes hot): a best-of-2 that is 2.8x off its
        # predecessor is how the r3 74.7s record happened — the retry gives
        # the official record one more chance to land in a quiet moment,
        # and the probe fields still disclose whatever it saw.
        crawl = None
        crawl_legs = 0
        # retry budget raised 3 -> 5 (VERDICT r4 next #4): the loop now
        # chases the OFFICIAL bar (io headwind < 2.0x on the chosen leg),
        # not just the 4.0x catastrophic-contention gate, so the quiet-band
        # number becomes the official number instead of a footnote.
        while crawl_legs < 5:
            c = run_crawl_bench(
                spark,
                int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000")),
                args.rounds,
            )
            crawl_legs += 1
            probes += [c["probe_before_s"], c["probe_after_s"]]
            io_probes += [c["io_probe_before_s"], c["io_probe_after_s"]]
            if crawl is None or c["urls_per_sec"] > crawl["urls_per_sec"]:
                crawl = c
            if crawl_legs >= 2:
                if crawl_leg_official(crawl):
                    break
                print(
                    f"bench: best crawl leg after {crawl_legs} attempts still "
                    f"over the official bar (cpu probe "
                    f"{min(crawl['probe_before_s'], crawl['probe_after_s'])}s, "
                    f"io headwind {crawl_leg_io_headwind(crawl)}x vs official "
                    f"<= {IO_PROBE_OFFICIAL_RATIO}x)"
                    + ("; retrying" if crawl_legs < 5
                       else "; publishing as-is with official:false"),
                    file=sys.stderr,
                )
        queries["frontier_crawl"] = crawl["wall_s"]
        # value = sum of best-of-2 per-query times: the comparable suite
        # cost (the raw harness wall below includes BOTH repeats of every
        # query and is dominated by this host's neighbor noise)
        total = round(sum(queries.values()), 3)
        report = {
            "metric": "headline_suite_wall_seconds",
            "value": total,
            "harness_wall_s": round(time.perf_counter() - t0, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf_of(sf_dir),
            "crawl_urls_per_sec": crawl["urls_per_sec"],
            "crawl_urls_fetched": crawl["urls_fetched"],
            "crawl_io_headwind": crawl_leg_io_headwind(crawl),
            "crawl_official": crawl_leg_official(crawl),
            "cpus": args.cpus,
            **probe_report(probes, io_samples=io_probes),
        }
        print(json.dumps(report))
        _log_headline(report, note=args.note)
    finally:
        spark.stop()


def _ensure_pages(docs: int, pages_path: str | None) -> str:
    """Materialize the shared canonical-pages corpus once (untimed setup)."""
    path = pages_path or f"/tmp/bench_pages_{docs}"
    if not os.path.isdir(path):
        env = dict(os.environ)
        env["SPARK_GRAFT_DRIVER_MEM"] = "24g"
        gen = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--gen-pages",
             "--cpus", "32", "--docs", str(docs),
             "--pages-path", path],
            capture_output=True, text=True, cwd=REPO, env=env,
        )
        assert os.path.isdir(path), gen.stderr[-2000:]
    return path


def _crawl_subprocess(cwd: str, cpus: int, docs: int, rounds: int,
                      pages_path: str) -> dict:
    """One fresh-JVM --crawl-only run of the bench.py living at `cwd`."""
    env = dict(os.environ)
    # EQUAL heap at every level/side: cores (or code) is the only variable
    env["SPARK_GRAFT_DRIVER_MEM"] = "24g"
    cmd = [sys.executable, os.path.join(cwd, "bench.py"), "--crawl-only",
           "--cpus", str(cpus), "--docs", str(docs),
           "--rounds", str(rounds), "--pages-path", pages_path]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=cwd, env=env)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, (out.stderr or out.stdout)[-2000:]
    return json.loads(lines[-1])


def _prune_stale_ab_worktrees() -> None:
    """Remove bench_ab_* worktrees left behind by a killed prior --ab run
    (SIGKILL skips the finally-cleanup); a fresh --ab must not inherit —
    or be failed by — a dead run's residue."""
    out = subprocess.run(
        ["git", "-C", REPO, "worktree", "list", "--porcelain"],
        capture_output=True, text=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("worktree ") and "/bench_ab_" in line:
            path = line.split(" ", 1)[1]
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force", path],
                capture_output=True,
            )
            shutil.rmtree(path, ignore_errors=True)
    subprocess.run(
        ["git", "-C", REPO, "worktree", "prune"], capture_output=True
    )


def run_ab(args) -> None:
    """Interleaved A/B: HEAD tree vs --ab <git-ref> on identical input.

    The one-command regression answer VERDICT r3 prescribed: a detached
    worktree of the ref runs ITS OWN bench.py, strictly alternated with this
    tree's, same pre-generated corpus, fresh JVM and equal heap per run —
    so 'did this round regress the engine?' separates from host noise at
    record time (each side also carries its own contention probes)."""
    ref = args.ab
    rev = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", ref],
        capture_output=True, text=True,
    )
    assert rev.returncode == 0, rev.stderr
    short = rev.stdout.strip()
    _prune_stale_ab_worktrees()
    wt = tempfile.mkdtemp(prefix=f"bench_ab_{short}_")
    os.rmdir(wt)  # `git worktree add` wants a fresh path
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, ref],
        check=True, capture_output=True,
    )
    try:
        pages_path = _ensure_pages(args.docs, args.pages_path)
        sides = (("head", REPO), (short, wt))
        best: dict[str, dict] = {}
        for r in range(args.repeats):
            for side, cwd in sides:
                # parent-side probes bracket EVERY leg (the ref side's own
                # bench.py may predate in-process probes), so contamination
                # of either side is visible symmetrically
                pb = cpu_probe()
                run = _crawl_subprocess(
                    cwd, args.cpus, args.docs, args.rounds, pages_path
                )
                run["parent_probe_before_s"] = pb
                run["parent_probe_after_s"] = cpu_probe()
                print(
                    f"ab run {r} {side}: {run['urls_per_sec']} urls/sec "
                    f"({run['wall_s']}s, probes {run.get('probe_before_s')}"
                    f"/{run.get('probe_after_s')}, parent "
                    f"{run['parent_probe_before_s']}/{run['parent_probe_after_s']})",
                    file=sys.stderr,
                )
                if side not in best or run["urls_per_sec"] > best[side]["urls_per_sec"]:
                    best[side] = run
        ratio = best["head"]["urls_per_sec"] / best[short]["urls_per_sec"]
        report = {
            "metric": "ab_head_vs_ref_throughput_ratio",
            "value": round(ratio, 3),
            "unit": "ratio",
            "ref": ref, "ref_short": short,
            "docs": args.docs, "rounds": args.rounds, "repeats": args.repeats,
            "cpus": args.cpus,
            "head_best": best["head"], "ref_best": best[short],
            "protocol": "interleaved best-of-N, identical pre-generated "
                        "input, fresh JVM + equal heap per run",
        }
        print(json.dumps(report))
        _append_session_row({
            "note": (getattr(args, "note", "") or f"A/B head vs {ref}"),
            "docs": args.docs,
            "levels": f"ab@{args.cpus}",
            "best_n": best[short]["urls_per_sec"],
            "best_4n": best["head"]["urls_per_sec"],
            "eff": round(ratio, 3),
        })
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )


def run_scaling(args) -> None:
    """N vs 4N cores on the identical input; fresh JVM per run.

    The sandbox host has noisy neighbors (load from outside the container),
    so levels run INTERLEAVED (8, 32, 8, 32, ...) and each level reports its
    best run — best-of-N approximates the uncontended time at each level,
    and interleaving stops a load spike from biasing one level only."""
    repeats = getattr(args, "repeats", 2)
    lo, hi = (int(x) for x in args.levels.split(","))
    if args.docs < 1_000_000:
        print(
            f"bench: --scaling at {args.docs:,} docs is dominated by "
            "per-round fixed costs (job scheduling, snapshot commits), not "
            "by the work that scales with cores — the published gate pairs "
            "use 8,000,000 docs; pass --docs 8000000 for a comparable row",
            file=sys.stderr,
        )
    pages_path = _ensure_pages(args.docs, args.pages_path)
    results: dict[int, dict] = {}
    for r in range(repeats):
        for cpus in (lo, hi):
            run = _crawl_subprocess(REPO, cpus, args.docs, args.rounds, pages_path)
            print(f"run {r} local[{cpus}]: {run['urls_per_sec']} urls/sec "
                  f"({run['wall_s']}s, probes {run.get('probe_before_s')}"
                  f"/{run.get('probe_after_s')}, io {run.get('io_probe_before_s')}"
                  f"/{run.get('io_probe_after_s')})", file=sys.stderr)
            if cpus not in results or run["urls_per_sec"] > results[cpus]["urls_per_sec"]:
                results[cpus] = run
    eff = (results[hi]["urls_per_sec"] / results[lo]["urls_per_sec"]) / (hi / lo)
    report = {
        "metric": "scaling_efficiency_4N_vs_N",
        "value": round(eff, 3),
        "unit": "ratio",
        "levels": {str(k): v for k, v in results.items()},
        "docs": args.docs,
        "rounds": args.rounds,
        "repeats": repeats,
        "levels_run": [lo, hi],
        "protocol": "interleaved best-of-N per level (noisy-neighbor sandbox)",
    }
    print(json.dumps(report))
    _append_session(report, lo, hi, getattr(args, "note", "") or "")
    _write_bench_md(report, lo, hi)


def _append_session(report: dict, lo: int, hi: int, note: str) -> None:
    """Append this run to the persistent session log (BENCH/sessions.jsonl).

    Every scaling run of every round lands here and is rendered into
    BENCH/BASELINE.md, so the headline efficiency can never silently drift
    behind a favorable level pair — the unflattering datapoints stay visible
    (VERDICT r2 'keep the scaling evidence honest')."""
    _append_session_row({
        "note": note,
        "docs": report["docs"],
        "levels": f"{lo}/{hi}",
        "best_n": report["levels"][str(lo)]["urls_per_sec"],
        "best_4n": report["levels"][str(hi)]["urls_per_sec"],
        "eff": report["value"],
    })


def _log_headline(report: dict, note: str = "") -> None:
    """Append this headline run to BENCH/headlines.jsonl — the headline
    analog of the sessions log (same honesty rule: io-slowed runs stay
    visible), rendered into BASELINE.md by _headlines_table so hand-edited
    record tables can't be lost to a --scaling rewrite."""
    if os.environ.get("SPARK_GRAFT_BENCH_NO_LOG"):
        return
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    row = {
        "note": note or "",
        "sf": report.get("sf"),
        "cpus": report.get("cpus"),
        "suite_s": report["value"],
        "crawl_s": report["queries"].get("frontier_crawl"),
        "urls_per_sec": report.get("crawl_urls_per_sec"),
        "cpu_worst_ratio": report.get("probe_worst_ratio"),
        "io_worst_ratio": report.get("io_probe_worst_ratio"),
        "contended": report.get("contended"),
        "io_headwind": report.get("crawl_io_headwind"),
        "official": report.get("crawl_official"),
    }
    with open(os.path.join(REPO, "BENCH", "headlines.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def _headlines_table() -> str:
    """Render BENCH/headlines.jsonl as the headline-records table."""
    path = os.path.join(REPO, "BENCH", "headlines.jsonl")
    if not os.path.exists(path):
        return ""
    with open(path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    out = [
        "## Headline records (sf0.1, local[32], probe-bracketed)",
        "",
        "Persistent log (BENCH/headlines.jsonl); full per-query JSONs in",
        "`BENCH/headline_*.json`. Same-build crawl times track the io probe",
        "(shared-disk writeback is this host's dominant noise — CPU probes",
        "stay quiet); the engine's quiet-host record is 18.3 s (4,133 urls/s).",
        "The crawl leg is best-of-2 with automatic retries (up to 5 legs)",
        "until the chosen leg clears the OFFICIAL bar — cpu quiet at 1.5x",
        "AND io headwind (quieter probe side) under 2.0x nominal",
        "(`bench.crawl_leg_official`, VERDICT r4 #4); rows that never got a",
        "quiet window publish official=False with the residual io headwind",
        "disclosed. Off-profile rows (smoke runs at other sf/cpu levels)",
        "say so in their note.",
        "",
        "| run | suite (s) | crawl (s) | urls/s | cpu worst | io worst "
        "| io headwind | official |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        io = r["io_worst_ratio"]
        hw = r.get("io_headwind")
        official = r.get("official")
        out.append(
            f"| {r['note'] or '(unlabeled)'} | {r['suite_s']} | {r['crawl_s']} "
            f"| {r['urls_per_sec']:,} | {r['cpu_worst_ratio']}x "
            f"| {'n/a' if io is None else f'{io}x'} "
            f"| {'n/a' if hw is None else f'{hw}x'} "
            f"| {'pre-gate' if official is None else official} |"
        )
    return "\n".join(out) + "\n\n"


def _append_session_row(row: dict) -> None:
    if os.environ.get("SPARK_GRAFT_BENCH_NO_LOG"):
        return  # tests exercise the harness without polluting the evidence log
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "sessions.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def _sessions_table() -> str:
    """Render BENCH/sessions.jsonl (plus the pre-log r1/r2 history) as the
    transparency table embedded in BENCH/BASELINE.md."""
    # history predating the session log (from the r1/r2 BASELINE.md tables)
    rows = [
        {"note": "r1 final (full-frontier rewrite per round)", "docs": 4_000_000,
         "levels": "2/8", "best_n": 10_681, "best_4n": 33_404, "eff": 0.782},
        {"note": "r2 + append-delta frontier", "docs": 4_000_000,
         "levels": "2/8", "best_n": 12_657, "best_4n": 35_920, "eff": 0.709},
        {"note": "r2 + delta frontier, pair moved to 1/4", "docs": 8_000_000,
         "levels": "1/4", "best_n": 7_692, "best_4n": 24_272, "eff": 0.792},
        {"note": "r2 + html consumed in the join pass (never cached)",
         "docs": 8_000_000, "levels": "1/4", "best_n": 7_692, "best_4n": 28_714,
         "eff": 0.933},
    ]
    path = os.path.join(REPO, "BENCH", "sessions.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            rows += [json.loads(ln) for ln in f if ln.strip()]
    out = ["| session | docs | levels | best N | best 4N | eff |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        out.append(
            f"| {r['note'] or '(unlabeled)'} | {r['docs']:,} | {r['levels']} "
            f"| {r['best_n']:,}/s | {r['best_4n']:,}/s | {r['eff']} |"
        )
    return "\n".join(out)


def _write_bench_md(report: dict, lo: int = 1, hi: int = 4) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lvn, lv4n = report["levels"][str(lo)], report["levels"][str(hi)]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — measured scaling evidence (sandbox proxy for N vs 4N executors)

North rule: frontier URLs scheduled+fetched/sec at two cluster sizes, scaling
efficiency (4N vs N) >= 0.8. No real cluster exists in this sandbox, so per
the driver instruction the same job runs at two parallelism levels on the
same input (fresh JVM per run, plans pinned identical — 64 shuffle/input
partitions and equal 24 GB heap at both levels, so the ONLY variable is
cores).

## Protocol

Implemented by `bench.py --scaling`: identical synthetic frontier input
({report['docs']:,} URLs, {report['rounds']} round(s), seed-fixed generator,
fully materialized + canonical-url-bucketed + cached before timing — the
production page-store shape), identical job (`bench.py --crawl-only`), run
at two parallelism levels in fresh JVMs. The timed window = seed commit +
one politeness-saturated frontier round: host-window top-K schedule →
shuffle-hash fetch join (pages html never re-shuffled) → Arrow-UDF outlink
extract → resolve+canonicalize → OPIC cash merge (groupBy) → persistent
per-bucket bloom prefilter + exact anti-join vs the seen set → snapshot-
atomic append-delta commit. Untimed warmup crawl first. This host shares
CPU/disk with neighbors, so levels run INTERLEAVED (N, 4N, N, 4N, …) and
each level reports its best of {report['repeats']}.

Level pair local[{lo}]/local[{hi}]: the driver rule allows any N/4N pair;
both the 1/4 and 2/8 pairs are measured every round and logged below. The
per-leg CPU probes (probe_before/after vs nominal, stored in every report)
mark which sessions ran on a contended host: under neighbor load the 8-core
level pins against shared memory/disk bandwidth (~35k urls/sec observed),
so engine speedups at N read there as efficiency losses; on a probe-verified
quiet host the same level reached 48k+ urls/sec and the 2/8 pair clears the
>=0.8 gate as well (r4 session below).

## Result (best-of-{report['repeats']} per level, interleaved)

| level | wall (s) | URLs fetched | URLs/sec |
|---|---|---|---|
| local[{lo}]  (N)  | {lvn['wall_s']} | {lvn['urls_fetched']:,} | {lvn['urls_per_sec']:,} |
| local[{hi}] (4N) | {lv4n['wall_s']} | {lv4n['urls_fetched']:,} | {lv4n['urls_per_sec']:,} |

**Scaling efficiency = ({lv4n['urls_per_sec']:,} / {lvn['urls_per_sec']:,}) / {hi // lo} = {report['value']}** (target >= 0.8).

Config: PySpark local mode, AQE on, shuffle partitions 64, Arrow batch 10k,
zstd parquet, file-committer v2, equal heap at both levels, seed-fixed
input, append-delta frontier storage, persistent per-bucket bloom seen set.
Reproduce: `python bench.py --scaling --docs {report['docs']} --rounds {report['rounds']} --repeats {report['repeats']} --levels {lo},{hi}`.

{_headlines_table()}## All scaling sessions

Persistent log (BENCH/sessions.jsonl) — every run of every round, both
level pairs, unflattering datapoints included:

{_sessions_table()}
""")


if __name__ == "__main__":
    main()
