"""Isolate the first-run cost of the extract->resolve->groupBy chain."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import pandas as pd
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.session import get_spark
from layerg_crawler_v2_spark.datagen import build_pages_synthetic
from layerg_crawler_v2_spark.functions.extract import extract_outlinks_udf
from layerg_crawler_v2_spark.streaming.rounds import _resolve_udf
from layerg_crawler_v2_spark.functions.canon import host_udf, url_hash_col

N = 100_000
spark = get_spark()
t = time.perf_counter()
def lap(msg):
    global t
    now = time.perf_counter()
    print(f"{msg:40s} {now - t:7.2f}s", flush=True)
    t = now

pages = build_pages_synthetic(spark, N).limit(8000).select("url", "html").cache()
pages.count()
lap("pages subset cache (8000)")

links = pages.select("url", extract_outlinks_udf("html").alias("hrefs"))
links.write.format("noop").mode("overwrite").save()
lap("extract_outlinks only")

exploded = links.select(F.col("url").alias("base_url"), F.explode("hrefs").alias("href"))
exploded.write.format("noop").mode("overwrite").save()
lap("  + explode")

resolved = exploded.select(_resolve_udf(F.col("base_url"), F.col("href")).alias("url"))
resolved.write.format("noop").mode("overwrite").save()
lap("  + resolve")

grouped = resolved.groupBy("url").agg(F.count("*").alias("n"))
grouped.write.format("noop").mode("overwrite").save()
lap("  + groupBy")

final = grouped.withColumn("url_hash", url_hash_col("url")).withColumn("host", host_udf("url"))
final.write.format("noop").mode("overwrite").save()
lap("  + hash/host")

# second run of everything
final.write.format("noop").mode("overwrite").save()
lap("full chain 2nd run")
spark.stop()
