"""Per-partition cuckoo filters — the URL-seen set's exact-ish fast path.

The reference keeps its dedup sets as in-process hash maps
(cmd/helpers/unique-set-onchain.go:11-46) — unbounded driver-side state that
cannot survive 10^10 URLs. Here the seen set is partitioned by
pmod(url_hash, P) and each partition owns ONE cuckoo filter, persisted as a
single binary row in a `cuckoo` table committed with every snapshot:

    cuckoo(partition_id int, n_keys long, data binary)

Why cuckoo (vs bloom): supports deletes and bounded ~3-5% memory overhead at
high load factors, and the per-partition split means each filter stays a few
MB — it travels inside a cogrouped Arrow batch, never through the driver.

Dataflow per round (engine wiring in streaming/rounds.py):
  * membership: discovered ⟂ filters cogrouped on partition_id via
    `applyInPandas`; output rows keep only definite-unseen (filter miss) —
    filter hits are false-positive candidates that MUST take the exact
    anti-join (cuckoo fpp ≈ 2^-bits·2b/slots, not zero);
  * maintenance: new URLs' hashes inserted into their partition's filter in
    the same cogrouped pass that produces the updated filter rows; the new
    `cuckoo` table is committed atomically with the seen delta.

Vectorization: lookups are fully numpy-vectorized; inserts loop per key
(cuckoo eviction chains are inherently sequential) but run inside Arrow
batches per partition — no per-row Python UDF crosses the JVM boundary
(input_hint mandate).

All arithmetic is fixed 64-bit (splitmix64 mixing), so filters are
byte-deterministic for a given insertion order; insertion order is pinned by
sorting keys within each partition before insert.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray | np.uint64, salt: int) -> np.ndarray | np.uint64:
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        x = (x + np.uint64(salt)) & _M64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
        return x ^ (x >> np.uint64(31))


class CuckooFilter:
    """(2^log_buckets) buckets × 4 slots of 16-bit fingerprints, numpy-backed."""

    def __init__(self, log_buckets: int):
        self.log_buckets = log_buckets
        self.n_buckets = 1 << log_buckets
        self.mask = np.uint64(self.n_buckets - 1)
        self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)
        self.n_keys = 0

    @classmethod
    def for_capacity(cls, n: int) -> "CuckooFilter":
        """Size for n keys at ≤0.95 load factor."""
        need = max(16, int(n / (_SLOTS * 0.95)) + 1)
        return cls(int(need - 1).bit_length())

    # -- key -> (fingerprint, bucket1); bucket2 = bucket1 ^ hash(fp) ---------
    def _fp_and_b1(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        u = keys.astype(np.int64).view(np.uint64)
        h = _mix64(u, 0x9E3779B97F4A7C15)
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
        b1 = (_mix64(u, 0xD1B54A32D192ED03) & self.mask).astype(np.uint64)
        return fp, b1

    def _alt_bucket(self, fp: np.ndarray, b: np.ndarray) -> np.ndarray:
        fph = _mix64(fp.astype(np.uint64), 0x8CB92BA72F3D8DD7)
        return (b ^ fph) & self.mask

    # -- vectorized membership ------------------------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1 = self._fp_and_b1(keys)
        b2 = self._alt_bucket(fp, b1)
        t1 = self.table[b1.astype(np.int64)]  # (n, SLOTS)
        t2 = self.table[b2.astype(np.int64)]
        fpc = fp[:, None]
        return ((t1 == fpc) | (t2 == fpc)).any(axis=1)

    # -- insert (sequential eviction chains) ---------------------------------
    def insert_many(self, keys: np.ndarray) -> int:
        """Insert keys (caller pre-sorts for determinism). Returns #inserted.

        Raises RuntimeError when an eviction chain exceeds MAX_KICKS — the
        filter is overfull; callers size with for_capacity()."""
        if len(keys) == 0:
            return 0
        fp, b1 = self._fp_and_b1(keys)
        b2 = self._alt_bucket(fp, b1)
        ins = 0
        for i in range(len(keys)):
            if self._insert_one(int(fp[i]), int(b1[i]), int(b2[i])):
                ins += 1
        self.n_keys += ins
        return ins

    def _insert_one(self, fp: int, b1: int, b2: int) -> bool:
        row = self.table[b1]
        hit = np.flatnonzero(row == fp)
        if hit.size:  # already present — add-if-absent semantics
            return False
        row2 = self.table[b2]
        if (row2 == fp).any():
            return False
        empty = np.flatnonzero(row == 0)
        if empty.size:
            self.table[b1, empty[0]] = fp
            return True
        empty = np.flatnonzero(row2 == 0)
        if empty.size:
            self.table[b2, empty[0]] = fp
            return True
        # evict: deterministic slot choice (slot = kicks % SLOTS)
        b, cur = b1, fp
        for kick in range(_MAX_KICKS):
            slot = kick % _SLOTS
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            b = int(self._alt_bucket(np.uint16(cur), np.uint64(b)))
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                self.table[b, empty[0]] = cur
                return True
        raise RuntimeError(
            f"cuckoo filter overfull (buckets={self.n_buckets}, keys={self.n_keys})"
        )

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove keys (one fingerprint copy each); returns #removed.

        SAFETY: only valid for keys PROVEN inserted into this filter. Deleting
        a key that was never inserted (or whose duplicate insert was skipped)
        clears another key's fingerprint-colliding slot, creating false
        negatives. The crawl engine never deletes (the seen set is
        append-only); this exists for completeness of the data structure and
        is exercised only by unit tests on known-inserted keys."""
        removed = 0
        if len(keys) == 0:
            return 0
        fp, b1 = self._fp_and_b1(keys)
        b2 = self._alt_bucket(fp, b1)
        for i in range(len(keys)):
            f = fp[i]
            for b in (int(b1[i]), int(b2[i])):
                hit = np.flatnonzero(self.table[b] == f)
                if hit.size:
                    self.table[b, hit[0]] = 0
                    removed += 1
                    break
        self.n_keys -= removed
        return removed

    # -- (de)serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.log_buckets, self.n_keys], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        head = np.frombuffer(data[:16], dtype=np.int64)
        f = cls(int(head[0]))
        f.n_keys = int(head[1])
        f.table = (
            np.frombuffer(data[16:], dtype=np.uint16)
            .reshape(f.n_buckets, _SLOTS)
            .copy()
        )
        return f


# --- filter stacks: deterministic local growth -------------------------------
#
# A cuckoo filter stores fingerprints only, so an overfull filter cannot be
# rebuilt larger in-place (the original keys are gone). Instead a partition's
# persisted blob is a STACK of filters: membership = hit in any; inserts go to
# the newest; when the newest would exceed 0.95 load a fresh filter (≥2× the
# previous capacity) is appended. Growth is purely local to the cogrouped
# Arrow pass — no scan of the seen table, no driver action — and
# byte-deterministic (append decision depends only on n_keys + batch size).
# Stack fpp ≈ sum of member fpps; false positives only cost exact anti-join
# checks, never correctness. Blobs are self-describing (each filter's header
# carries its size), so single-filter blobs from older snapshots parse as a
# 1-deep stack.


def stack_from_bytes(data: bytes) -> list[CuckooFilter]:
    out: list[CuckooFilter] = []
    off = 0
    data = bytes(data)
    while off < len(data):
        head = np.frombuffer(data[off : off + 16], dtype=np.int64)
        n_buckets = 1 << int(head[0])
        ln = 16 + n_buckets * _SLOTS * 2
        out.append(CuckooFilter.from_bytes(data[off : off + ln]))
        off += ln
    return out


def stack_to_bytes(filters: list[CuckooFilter]) -> bytes:
    return b"".join(f.to_bytes() for f in filters)


def stack_contains(filters: list[CuckooFilter], keys: np.ndarray) -> np.ndarray:
    hit = np.zeros(len(keys), dtype=bool)
    for f in filters:
        hit |= f.contains(keys)
    return hit


def stack_insert(filters: list[CuckooFilter], keys: np.ndarray, headroom: float) -> None:
    """Insert sorted keys into the stack's newest filter, growing if needed."""
    if len(keys) == 0:
        return
    top = filters[-1]
    if top.n_keys + len(keys) > top.n_buckets * _SLOTS * 0.95:
        grown = CuckooFilter.for_capacity(
            max(int(len(keys) * headroom), top.n_buckets * _SLOTS * 2)
        )
        filters.append(grown)
        top = grown
    top.insert_many(keys)


# --- Spark surface ----------------------------------------------------------


def partition_col(hash_col: str, n_partitions: int) -> F.Column:
    return F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int")


def build_filters(
    seen: DataFrame,
    n_partitions: int,
    hash_col: str = "url_hash",
    headroom: float = 4.0,
) -> DataFrame:
    """One cuckoo filter per seen-partition, built executor-side.

    `headroom` over-sizes each filter so subsequent rounds can keep inserting
    into the SAME byte layout without resizing (resize = full rebuild)."""
    keyed = seen.select(
        partition_col(hash_col, n_partitions).alias("partition_id"),
        F.col(hash_col).alias("key"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        keys = np.sort(pdf["key"].to_numpy(np.int64))
        f = CuckooFilter.for_capacity(max(int(len(keys) * headroom), 64))
        f.insert_many(keys)
        return pd.DataFrame(
            {"partition_id": [pid], "n_keys": [f.n_keys], "data": [f.to_bytes()]}
        )

    return keyed.groupBy("partition_id").applyInPandas(build, schema=CUCKOO_SCHEMA)


def update_filters(
    filters: DataFrame,
    new_keys: DataFrame,
    n_partitions: int,
    hash_col: str = "url_hash",
    headroom: float = 4.0,
) -> DataFrame:
    """Insert this round's new keys into their partitions' filter stacks.

    Cogrouped Arrow pass: each partition sees (its filter row, its new keys)
    and emits the updated filter row. Partitions with no new keys pass
    through; partitions with no filter yet are created. A stack whose top
    filter would exceed 0.95 load grows by appending a ≥2×-capacity filter
    (see the filter-stack notes above) — a growing crawl never crashes on
    overflow and never rescans the seen table to resize."""
    keyed = new_keys.select(
        partition_col(hash_col, n_partitions).alias("partition_id"),
        F.col(hash_col).alias("key"),
    )

    def merge(key, fdf: pd.DataFrame, kdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        keys = np.sort(kdf["key"].to_numpy(np.int64)) if len(kdf) else np.array([], np.int64)
        if len(fdf):
            stack = stack_from_bytes(fdf["data"].iloc[0])
        else:
            stack = [CuckooFilter.for_capacity(max(int(len(keys) * headroom), 64))]
        stack_insert(stack, keys, headroom)
        n_keys = sum(f.n_keys for f in stack)
        return pd.DataFrame(
            {"partition_id": [pid], "n_keys": [n_keys], "data": [stack_to_bytes(stack)]}
        )

    return (
        filters.groupby("partition_id")
        .cogroup(keyed.groupby("partition_id"))
        .applyInPandas(merge, schema=CUCKOO_SCHEMA)
    )


def filter_unseen_cuckoo(
    discovered: DataFrame,
    filters: DataFrame,
    seen: DataFrame,
    n_partitions: int,
    hash_col: str = "url_hash",
    url_col: str = "url",
    cleanup: list | None = None,
) -> DataFrame:
    """Definite-unseen via per-partition cuckoo check; FP candidates take the
    exact anti-join.

    INVARIANT: the filter table must cover every key in `seen` (maintained by
    committing `update_filters` output atomically with each seen delta) — a
    partition with no filter row is treated as all-unseen, which is only
    correct when that partition truly has no seen keys. The engine guards the
    resume-after-mode-switch case (seen non-empty, cuckoo table absent) by
    rebuilding via `build_filters` before calling this (streaming/rounds.py).

    `cleanup`: optional registry — when passed, the cogrouped tag output is
    cached (it feeds two filters) and appended for the caller to unpersist
    after materialization; otherwise the Python cogroup runs twice."""
    cols = discovered.columns
    keyed = discovered.withColumn(
        "partition_id", partition_col(hash_col, n_partitions)
    )

    out_schema = T.StructType(
        keyed.schema.fields + [T.StructField("__maybe_seen", T.BooleanType(), False)]
    )

    def check(key, ddf: pd.DataFrame, fdf: pd.DataFrame) -> pd.DataFrame:
        if len(ddf) == 0:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        if len(fdf) == 0:
            ddf = ddf.copy()
            ddf["__maybe_seen"] = False
            return ddf
        stack = stack_from_bytes(fdf["data"].iloc[0])
        ddf = ddf.copy()
        ddf["__maybe_seen"] = stack_contains(stack, ddf[hash_col].to_numpy(np.int64))
        return ddf

    tagged = (
        keyed.groupby("partition_id")
        .cogroup(filters.groupby("partition_id"))
        .applyInPandas(check, schema=out_schema)
    )
    if cleanup is not None:
        tagged = tagged.cache()
        cleanup.append(tagged)
    definitely_new = tagged.filter(~F.col("__maybe_seen")).select(cols)
    candidates = tagged.filter(F.col("__maybe_seen")).select(cols)
    checked = candidates.join(seen, on=[hash_col, url_col], how="left_anti")
    return definitely_new.unionByName(checked)
