#!/usr/bin/env python3
"""spark-submit entry point for the frontier crawler — the cluster shape.

The BASELINE north rule requires the job to run "via spark-submit --py-files
on a multi-executor cluster"; this script is that job main, and
tests/test_submit.py proves the path end-to-end by actually invoking
spark-submit with the package shipped as a zip (driver AND executors import
the engine from the --py-files archive, never from the checkout).

Cluster:

    python -m zipfile -c layerg_crawler_v2_spark.zip layerg_crawler_v2_spark
    spark-submit --master spark://head:7077 \
        --py-files layerg_crawler_v2_spark.zip \
        scripts/submit_crawl.py \
        --pages /warehouse/pages --seeds-file seeds.txt \
        --store /shared/crawl_store --rounds 10 --seen-filter cuckoo

`--master` is deliberately NOT set by this script unless passed explicitly:
under spark-submit the master/deploy-mode come from the submit line, and the
engine confs applied here (session.engine_confs) are master-agnostic tuning
only. Re-running with the same --store resumes from the last committed
snapshot (T2); the final line printed is the last checkpoint row as JSON.

Reference analog: cmd/crawler_cmd.go:43-118 (the `crawler` cobra command
that wires config -> chains -> workers), re-expressed as a Spark job main.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_session(args):
    from pyspark.sql import SparkSession

    from layerg_crawler_v2_spark.session import engine_confs

    builder = SparkSession.builder.appName("layerg-crawler-v2-spark")
    if args.master:
        builder = builder.master(args.master)
    for k, v in engine_confs(args.shuffle_partitions).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _load_seeds(args) -> list[str]:
    if args.seeds_file:
        with open(args.seeds_file) as f:
            return [line.strip() for line in f if line.strip()]
    if args.seeds:
        return [s for s in args.seeds.split(",") if s]
    raise SystemExit("one of --seeds / --seeds-file is required")


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--pages", required=True,
                   help="parquet path of the pages table (url, warc_ts, html, text, lang)")
    p.add_argument("--store", required=True, help="snapshot-store directory (shared fs)")
    p.add_argument("--seeds", default=None, help="comma-separated seed URLs")
    p.add_argument("--seeds-file", default=None, help="file of seed URLs, one per line")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--seen-filter", default="exact",
                   choices=["exact", "bloom", "cuckoo"])
    p.add_argument("--compact-every", type=int, default=16)
    p.add_argument("--salt-buckets", type=int, default=0,
                   help="hot-host skew-split shards for the scheduler window")
    p.add_argument("--hosts", default=None,
                   help="optional parquet dim (host, delay_ms, max_parallel)")
    p.add_argument("--robots", default=None,
                   help="optional parquet rules (host, rule_type, path_prefix)")
    p.add_argument("--master", default=None,
                   help="only for plain-python runs; under spark-submit leave unset")
    p.add_argument("--shuffle-partitions", type=int, default=64)
    p.add_argument("--expire-keep", type=int, default=0, metavar="N",
                   help="after the crawl, fold snapshots older than the "
                        "newest N into a base snapshot and delete orphaned "
                        "delta dirs (Iceberg expire_snapshots analog); 0 "
                        "keeps full time-travel history")
    args = p.parse_args(argv)

    spark = _build_session(args)

    from layerg_crawler_v2_spark import schema as S
    from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
    from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl

    pages = spark.read.schema(S.PAGES).parquet(args.pages)
    hosts = spark.read.schema(S.HOSTS).parquet(args.hosts) if args.hosts else None
    robots = spark.read.schema(S.ROBOTS).parquet(args.robots) if args.robots else None
    cfg = CrawlConfig(
        rounds=args.rounds,
        seen_filter=args.seen_filter,
        frontier_compact_every=args.compact_every,
        scheduler_salt_buckets=args.salt_buckets,
    )
    store = SnapshotStore(args.store)
    run_crawl(spark, pages, _load_seeds(args), store, cfg,
              hosts=hosts, robots=robots, resume=True)

    # the LATEST checkpoint row, not the row at last_round(): maintenance
    # commits (compact_store) and resubmits with already-satisfied rounds can
    # leave last_round() ahead of the newest crawl round, and a missing-row
    # crash here would hide a successful crawl (ADVICE r3)
    cp_rows = (
        store.read(spark, "checkpoints", S.CHECKPOINTS)
        .orderBy("round", ascending=False)
        .limit(1)
        .collect()
    )
    if not cp_rows:
        raise SystemExit(f"store {args.store} has no checkpoint rows")
    cp = cp_rows[0].asDict()
    result = {"store": args.store, **cp}
    if args.expire_keep > 0:
        result["expire"] = store.expire_snapshots(keep_last=args.expire_keep)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
