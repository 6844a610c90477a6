"""Step-timer for one frontier round — finds where wall time goes."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.session import get_spark
from layerg_crawler_v2_spark.datagen import build_pages_synthetic, seed_df
from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming import rounds as R
from layerg_crawler_v2_spark import schema as S

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

spark = get_spark()
t = time.perf_counter()
def lap(msg):
    global t
    now = time.perf_counter()
    print(f"{msg:45s} {now - t:7.2f}s", flush=True)
    t = now

pages = build_pages_synthetic(spark, N, partitions=64).cache()
pages.count()
lap("build+cache pages")

pages_canon = pages.select(
    R.canonicalize_udf("url").alias("url_canon"), "html"
).filter(F.col("url_canon").isNotNull()).cache()
pages_canon.count()
lap("canonicalize pages (cache)")

store = SnapshotStore(tempfile.mkdtemp(prefix="prof_"))
cfg = R.CrawlConfig(rounds=2, default_max_parallel=256, n_host_buckets=256, use_bloom=True, collect_counters=False)
seeds_df = R.prepare_seeds(spark, seed_df(spark, N, N, partitions=64), cfg, None)
from layerg_crawler_v2_spark.operators.seen import (
    BLOOM_SCHEMA, broadcast_blooms, build_bloom_buckets, filter_unseen,
    update_bloom_buckets,
)
store.commit(-1,
             appends={"frontier": seeds_df,
                      "url_seen": R._seen_delta(seeds_df, cfg.n_host_buckets)},
             replaces={"bloom": build_bloom_buckets(seeds_df.select("url_hash"),
                                                    cfg.bloom_buckets)},
             counters={})
lap("seed commit (frontier+seen deltas + bloom buckets)")

for rnd in (0, 1):
    queued = R.read_frontier_queued(spark, store)
    seen = store.read(spark, "url_seen", S.URL_SEEN)
    selected = R.select_for_fetch(queued, None, rnd, cfg.default_delay_ms, cfg.default_max_parallel).cache()
    n_sel = selected.count()
    lap(f"r{rnd} select_for_fetch ({n_sel})")

    fetched = (pages_canon.join(selected, on=pages_canon["url_canon"] == selected["url"], how="inner")
               .drop("url_canon").cache())
    nf = fetched.count()
    lap(f"r{rnd} fetch join ({nf})")

    misses = selected.join(fetched.select("url"), on="url", how="left_anti")
    fetch_rows = (fetched.select("url", "host", "depth", "fetch_ts",
                                 F.octet_length("html").cast("long").alias("bytes"),
                                 F.lit("OK").alias("status"), "priority", "html")
                  .unionByName(misses.select("url", "host", "depth", "fetch_ts",
                                             F.lit(0).cast("long").alias("bytes"),
                                             F.lit("MISS").alias("status"), "priority",
                                             F.lit(None).cast("binary").alias("html"))).cache())
    fetch_rows.count()
    lap(f"r{rnd} fetch_rows union")

    from layerg_crawler_v2_spark.operators.sequence import with_global_seq
    fetch_log = with_global_seq(
        fetch_rows.select("url", "host", "depth", "fetch_ts", "bytes", "status"),
        [F.asc("fetch_ts"), F.asc("host"), F.asc("url")], seq_col="seq",
    ).select(F.lit(rnd).alias("round"), F.col("seq").cast("int"),
             "url", "host", "depth", "fetch_ts", "bytes", "status")
    fetch_log.write.mode("overwrite").format("noop").save()
    lap(f"r{rnd} fetch_log seq+noop")

    ok = fetch_rows.filter(F.col("status") == "OK")
    links = ok.select("url", "depth", "priority", R.extract_outlinks_udf("html").alias("hrefs")).withColumn("n_out", F.size("hrefs"))
    links.write.format("noop").mode("overwrite").save()
    lap(f"r{rnd}   links noop")
    exploded = links.filter(F.col("n_out") > 0).select(
        F.col("url").alias("base_url"), (F.col("depth") + 1).alias("child_depth"),
        F.expr("priority div n_out").alias("child_units"), F.explode("hrefs").alias("href"))
    exploded.write.format("noop").mode("overwrite").save()
    lap(f"r{rnd}   exploded noop")
    resolved = exploded.select(R._resolve_udf(F.col("base_url"), F.col("href")).alias("url"),
                               "child_depth", "child_units").filter(F.col("url").isNotNull())
    resolved.write.format("noop").mode("overwrite").save()
    lap(f"r{rnd}   resolved noop")
    discovered = resolved.groupBy("url").agg(F.sum("child_units").alias("priority"),
                                             F.min("child_depth").alias("depth"))
    discovered.write.format("noop").mode("overwrite").save()
    lap(f"r{rnd}   grouped noop")
    discovered = (discovered.withColumn("url_hash", R.url_hash_col("url"))
                  .withColumn("host", R.host_udf("url"))
                  .withColumn("host_bucket", R.host_bucket_col("host", cfg.n_host_buckets))
                  .withColumn("depth", F.col("depth").cast("int"))
                  .withColumn("discovered_round", F.lit(rnd + 1))
                  .withColumn("state", F.lit("QUEUED"))).cache()
    nd = discovered.count()
    lap(f"r{rnd} extract+resolve+groupBy ({nd})")

    blooms_tbl = store.read(spark, "bloom", BLOOM_SCHEMA)
    bloom = broadcast_blooms(spark, blooms_tbl, cfg.bloom_buckets)
    lap(f"r{rnd} bloom broadcast (persistent buckets)")

    new = filter_unseen(discovered, seen, bloom=bloom).select([f.name for f in S.FRONTIER.fields]).cache()
    nn = new.count()
    lap(f"r{rnd} anti-join seen ({nn})")

    lineage = (selected.groupBy("host").agg(F.min("depth").alias("depth"), F.count("*").alias("urls_in"))
               .join(fetch_rows.filter(F.col("status") == "OK").groupBy("host").agg(F.count("*").alias("urls_fetched")), on="host", how="left")
               .join(new.groupBy("host").agg(F.count("*").alias("urls_discovered")), on="host", how="left")
               .select(F.lit(rnd).alias("round"), "host", "depth",
                       F.coalesce("urls_in", F.lit(0)).cast("long").alias("urls_in"),
                       F.coalesce("urls_fetched", F.lit(0)).cast("long").alias("urls_fetched"),
                       F.coalesce("urls_discovered", F.lit(0)).cast("long").alias("urls_discovered"),
                       F.lit(0).cast("long").alias("urls_deduped")))
    store.commit(rnd, appends={"fetch_log": fetch_log,
                               "url_seen": R._seen_delta(new, cfg.n_host_buckets),
                               "lineage": lineage,
                               "frontier": new},
                 replaces={"bloom": update_bloom_buckets(
                     blooms_tbl, new.select("url_hash"), cfg.bloom_buckets)},
                 counters={})
    lap(f"r{rnd} commit (4 append deltas + bloom)")
    for df in (selected, fetched, fetch_rows, discovered, new):
        df.unpersist()

spark.stop()
