"""Bench-harness instrumentation: contention probe + interleaved A/B mode.

VERDICT r3 'what's wrong' #1: the r3 headline record (frontier_crawl 74.7 s)
could not distinguish an engine regression from host noise at record time.
These tests pin the two instruments that close that gap: the fixed-work CPU
probe published next to every timed window, and `bench.py --ab <ref>` — the
one-command strictly-interleaved HEAD-vs-ref comparison on identical input.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_cpu_probe_measures_fixed_work():
    import bench

    t = bench.cpu_probe(procs=2, loops=20_000)
    assert 0 < t < 30


def test_probe_report_contention_flag(capsys):
    import bench

    quiet = bench.probe_report([bench.PROBE_NOMINAL_S * 0.9])
    assert not quiet["contended"]
    assert quiet["probe_nominal_s"] == bench.PROBE_NOMINAL_S

    loud = bench.probe_report(
        [bench.PROBE_NOMINAL_S * 0.9, bench.PROBE_NOMINAL_S * 2.0]
    )
    assert loud["contended"] and loud["probe_worst_ratio"] == 2.0
    assert "WARNING" in capsys.readouterr().err


def test_io_probe_measures_fixed_io():
    import bench

    t = bench.io_probe(mb=16)
    assert 0 < t < 30


def test_probe_report_io_contention_flag(capsys):
    """IO samples flag contention independently of quiet CPU probes — the
    r4s3 failure mode (2.3x IO-slow leg, quiet CPU probe) is now visible
    at record time."""
    import bench

    quiet = bench.probe_report(
        [bench.PROBE_NOMINAL_S * 0.9],
        io_samples=[bench.IO_PROBE_NOMINAL_S * 0.9],
    )
    assert not quiet["contended"]
    assert quiet["io_probe_nominal_s"] == bench.IO_PROBE_NOMINAL_S
    assert quiet["io_probe_worst_ratio"] == 0.9

    loud = bench.probe_report(
        [bench.PROBE_NOMINAL_S * 0.9],  # CPU quiet
        io_samples=[bench.IO_PROBE_NOMINAL_S * (bench.IO_PROBE_CONTENDED_RATIO + 1)],
    )
    assert loud["contended"]
    assert "io probe" in capsys.readouterr().err

    no_io = bench.probe_report([bench.PROBE_NOMINAL_S * 0.9])
    assert "io_probe_worst_ratio" not in no_io  # absent, never fabricated


def test_ab_mode_head_vs_head(tmp_path):
    """--ab HEAD runs both sides through real fresh-JVM crawls on the same
    tiny corpus: identical fetched counts, sane throughput ratio, probe
    fields present on the HEAD side, and no session-log pollution."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_NO_LOG"] = "1"
    env["SPARK_GRAFT_PROBE_PROCS"] = "2"
    env["SPARK_GRAFT_PROBE_LOOPS"] = "100000"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--ab", "HEAD", "--docs", "3000", "--rounds", "1",
         "--repeats", "1", "--cpus", "4",
         "--pages-path", str(tmp_path / "pages")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, (out.stderr or out.stdout)[-3000:]
    rep = json.loads(lines[-1])
    assert rep["metric"] == "ab_head_vs_ref_throughput_ratio"
    assert rep["head_best"]["urls_fetched"] == rep["ref_best"]["urls_fetched"]
    assert rep["head_best"]["urls_fetched"] > 0
    # HEAD vs HEAD: same engine, so only host noise separates the sides
    assert 0.2 < rep["value"] < 5.0
    assert "probe_before_s" in rep["head_best"]
    # worktree cleaned up
    wt = subprocess.run(
        ["git", "-C", REPO, "worktree", "list"], capture_output=True, text=True
    )
    assert "bench_ab_" not in wt.stdout


def test_crawl_leg_quiet_gate():
    """Headline mode retries the crawl leg a third time only when BOTH
    best-of-2 legs were probe-contended; a quiet probe on either side of a
    leg's timed window marks the leg quiet."""
    import bench

    cpu_q = bench.PROBE_NOMINAL_S * 0.9
    cpu_hot = bench.PROBE_NOMINAL_S * bench.PROBE_CONTENDED_RATIO * 1.2
    io_q = bench.IO_PROBE_NOMINAL_S * 0.9
    io_hot = bench.IO_PROBE_NOMINAL_S * bench.IO_PROBE_CONTENDED_RATIO * 1.2

    def leg(b, a, iob, ioa):
        return {
            "probe_before_s": b, "probe_after_s": a,
            "io_probe_before_s": iob, "io_probe_after_s": ioa,
        }

    assert bench.crawl_leg_quiet(leg(cpu_q, cpu_q, io_q, io_q))
    # one quiet side is enough (spike after the window doesn't condemn it)
    assert bench.crawl_leg_quiet(leg(cpu_q, cpu_hot, io_q, io_hot))
    # sustained CPU or IO pressure across the whole window marks it hot
    assert not bench.crawl_leg_quiet(leg(cpu_hot, cpu_hot, io_q, io_q))
    assert not bench.crawl_leg_quiet(leg(cpu_q, cpu_q, io_hot, io_hot))
