"""SparkSession factory with the engine's standard configuration.

Single place that sets AQE / shuffle-partition / Arrow knobs so tests, bench
and the driver entrypoint all run the same way. Designed for multi-executor
clusters (partition counts scale with parallelism); tested on local[N].
"""

from __future__ import annotations

import os
import pathlib

from pyspark.sql import SparkSession

_PKG_ROOT = str(pathlib.Path(__file__).resolve().parent.parent)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "layerg-crawler-v2-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    AQE is on: it coalesces small shuffle partitions, re-plans joins to
    broadcast at runtime, and splits skewed partitions — the runtime analog of
    the reference's static per-chain concurrency knobs (config/params.go:6-8).
    """
    # Local-mode analog of `spark-submit --py-files`: Python executor workers
    # are spawned with PYTHONPATH from the environment, so the package root
    # must be on it for pandas-UDF closures to unpickle. On a real cluster,
    # ship the package with --py-files instead.
    pp = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in pp.split(":"):
        os.environ["PYTHONPATH"] = f"{_PKG_ROOT}:{pp}" if pp else _PKG_ROOT

    cpus = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )
    builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in engine_confs(shuffle_partitions).items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    ).config("spark.ui.enabled", "false")
    return builder.getOrCreate()


def engine_confs(shuffle_partitions: int) -> dict[str, str]:
    """The engine's tuning confs, master-agnostic — shared by get_spark
    (local/test) and scripts/submit_crawl.py (spark-submit --py-files on a
    real cluster, where --master/--deploy-mode come from the submit line and
    MUST NOT be set here)."""
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.default.parallelism": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # zstd halves parquet bytes vs snappy on URL/text-heavy tables; its
        # CPU cost is per-task (parallel) while disk bandwidth is shared —
        # the right trade at every cluster size
        "spark.sql.parquet.compression.codec": "zstd",
        # v2 commit: task-side renames — the v1 committer serializes every
        # output-file rename through the driver (hurts multi-table commits)
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.session.timeZone": "UTC",
    }
