"""Z-order layout: interleave math, quantization edges, and the actual
file-skip (the pruning entry's oracle proves no rows lost; these prove
files are really skipped and the layout beats a single-column sort)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from layerg_crawler_v2_spark.sources.layout import (
    column_bounds,
    morton_interleave,
    parquet_file_stats,
    pruned_paths,
    pruned_read,
    write_zordered,
    zorder_quantize,
)


def test_morton_known_values(spark):
    df = spark.createDataFrame(
        [(3, 1), (0, 0), (65535, 0), (0, 65535)], "x long, y long"
    )
    got = [
        r["z"]
        for r in df.select(morton_interleave("x", "y", 16).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    # (0,0)->0; (0,65535)-> odd bits set; (3,1)-> x bits at 0,2 | y bit at 1
    odd = sum(1 << (2 * i + 1) for i in range(16))
    even = sum(1 << (2 * i) for i in range(16))
    assert got == sorted([0b111, 0, even, odd]) or set(got) == {0b111, 0, even, odd}


def test_quantize_degenerate_span(spark):
    df = spark.createDataFrame([(5,), (5,)], "v long")
    got = df.select(zorder_quantize("v", 5, 5).alias("q")).collect()
    assert all(r["q"] == 0 for r in got)


def test_prune_skips_files_and_loses_nothing(spark, tmp_path):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"))
    )
    zdir = str(tmp_path / "z")
    write_zordered(ev, zdir, "user_id", "ts_s", n_files=8)
    n_files = len([f for f in os.listdir(zdir) if f.endswith(".parquet")])
    assert n_files >= 6  # repartitionByRange produced a real multi-file layout

    box = {"user_id": (3, 7), "ts_s": (1704844800, 1705276800)}
    stats = parquet_file_stats(zdir, list(box))
    kept = pruned_paths(stats, box)
    assert 0 < len(kept) < n_files, (len(kept), n_files)

    got = sorted(r["event_id"] for r in pruned_read(spark, zdir, box).collect())
    want = sorted(
        r["event_id"]
        for r in ev.filter(
            F.col("user_id").between(3, 7)
            & F.col("ts_s").between(1704844800, 1705276800)
        ).collect()
    )
    assert got == want and len(want) > 0


def test_zorder_prunes_better_than_time_sort(spark, tmp_path):
    """A time-sorted layout cannot skip on user_id (every file spans all
    users); the z-layout skips on both axes."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"))
    )
    lin = str(tmp_path / "lin")
    ev.repartitionByRange(8, "ts_s").sortWithinPartitions("ts_s").write.parquet(lin)
    zdir = str(tmp_path / "z")
    write_zordered(ev, zdir, "user_id", "ts_s", n_files=8)

    # user-only predicate: the axis the time sort throws away
    box = {"user_id": (3, 7)}
    lin_kept = pruned_paths(parquet_file_stats(lin, ["user_id"]), box)
    z_kept = pruned_paths(parquet_file_stats(zdir, ["user_id"]), box)
    lin_total = len([f for f in os.listdir(lin) if f.endswith(".parquet")])
    assert len(lin_kept) == lin_total  # time sort: zero skip on user_id
    assert len(z_kept) < len(lin_kept)


def test_bounds_and_missing_stats_kept(spark):
    df = spark.createDataFrame([(1, 10), (9, 90)], "a long, b long")
    assert column_bounds(df, ["a", "b"]) == {"a": (1, 9), "b": (10, 90)}
    stats = [{"path": "p", "min": {"a": None}, "max": {"a": None}}]
    assert pruned_paths(stats, {"a": (0, 1)}) == ["p"]  # prune only on proof
