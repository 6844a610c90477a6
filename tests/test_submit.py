"""End-to-end spark-submit --py-files evidence (BASELINE north rule).

Launches a REAL `spark-submit --py-files layerg_crawler_v2_spark.zip` crawl
in a subprocess — package imported from the zip archive, cwd outside the
checkout so nothing resolves from the repo — then asserts the resulting
fetch log is bit-identical to an in-process crawl of the same pages+seeds at
a different parallelism (local[4] vs the test session's local[8]): the
submit path exercises the same deterministic engine, and the engine is
parallelism-invariant across launch modes."""

from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import sys
import zipfile

import pytest

from layerg_crawler_v2_spark import schema as S
from layerg_crawler_v2_spark.datagen import build_pages, seed_urls
from layerg_crawler_v2_spark.sources.snapshots import SnapshotStore
from layerg_crawler_v2_spark.streaming.rounds import CrawlConfig, run_crawl

from .test_rounds import fetch_log_tuples

REPO = pathlib.Path(__file__).resolve().parent.parent
ROUNDS = 2


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def _zip_package(dest: pathlib.Path) -> pathlib.Path:
    zip_path = dest / "layerg_crawler_v2_spark.zip"
    pkg = REPO / "layerg_crawler_v2_spark"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for f in sorted(pkg.rglob("*.py")):
            zf.write(f, f.relative_to(REPO))
    return zip_path


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_pyfiles_crawl_matches_inprocess(spark, sf_dir, tmp_path):
    pages = build_pages(spark, sf_dir).cache()
    n = pages.count()
    seeds = seed_urls(n, n_seeds=5)
    pages_path = str(tmp_path / "pages_parquet")
    pages.write.parquet(pages_path)

    # in-process baseline crawl (test session parallelism)
    base_store = SnapshotStore(str(tmp_path / "store_inproc"))
    run_crawl(spark, pages, seeds, base_store, CrawlConfig(rounds=ROUNDS))

    # spark-submit run: fresh JVM, local[4], package ONLY via --py-files
    zip_path = _zip_package(tmp_path)
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("\n".join(seeds) + "\n")
    submit_store = str(tmp_path / "store_submit")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(REPO / "scripts" / "submit_crawl.py"),
            "--pages", pages_path,
            "--seeds-file", str(seeds_file),
            "--store", submit_store,
            "--rounds", str(ROUNDS),
            "--shuffle-partitions", "8",
        ],
        cwd=str(tmp_path),  # outside the checkout
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert '"fetched_count"' in proc.stdout  # final checkpoint row printed

    sub = SnapshotStore(submit_store)
    assert fetch_log_tuples(spark, sub) == fetch_log_tuples(spark, base_store)
    seen = lambda st: {
        r["url"] for r in st.read(spark, "url_seen", S.URL_SEEN).collect()
    }
    assert seen(sub) == seen(base_store)
    # resume via a second submit: more rounds, no re-fetch of seen URLs
    proc2 = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(REPO / "scripts" / "submit_crawl.py"),
            "--pages", pages_path,
            "--seeds-file", str(seeds_file),
            "--store", submit_store,
            "--rounds", str(ROUNDS + 1),
            "--shuffle-partitions", "8",
            "--expire-keep", "1",  # post-crawl maintenance through the CLI
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    assert '"expire"' in proc2.stdout  # maintenance result reported
    snaps = SnapshotStore(submit_store).snapshots()
    assert len(snaps) == 2 and snaps[0].get("base") is True
    log = sub.read(spark, "fetch_log", S.FETCH_LOG)
    from pyspark.sql import functions as F

    assert log.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    assert sub.last_round() == ROUNDS  # rounds 0..ROUNDS committed
