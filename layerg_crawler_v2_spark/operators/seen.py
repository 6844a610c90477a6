"""URL-seen set: batch add-if-absent at frontier scale.

Rebuilds the reference's in-memory unique sets — `AddressSet`/`TokenIdSet`
add-if-absent then enumerate (cmd/helpers/unique-set-onchain.go:11-46) — as
distributed state that never lives in driver memory:

  * authoritative path: LEFT ANTI join of discovered URLs against the
    persisted `url_seen` table on (url_hash, url) — hash narrows the shuffle
    key, the url equality makes collisions harmless;
  * fast path: a broadcast Bloom filter over seen url_hashes. Discovered URLs
    whose hash is NOT in the bloom are *definitely* unseen and skip the join
    entirely; only possible-dupes take the exact anti-join. At Common-Crawl
    scale most discovered URLs are dupes of hot pages, so the bloom's job is
    to shrink the anti-join's left side; its false-positive rate only costs
    extra exact checks, never correctness.

State model: blooms are PERSISTENT, per-bucket, and incrementally maintained
— a `bloom` table (bucket, n_keys, data) committed atomically with each seen
delta, one row per pmod(url_hash, B) bucket. Each round's update is a
cogrouped Arrow pass that ORs only the round's NEW keys into their buckets
(cost ∝ delta, never a rescan of the seen table), and growth appends a
larger bloom to the bucket's STACK (membership = hit in any; a bloom's bits
cannot be resized in place) — the same growth discipline as cuckoo.py. At
membership time the fixed-size bucket rows ship via SparkContext.broadcast
(once per executor, not once per task-closure), so the prefilter itself
stays shuffle-free.

Scale notes (10^10 URLs): total bloom state is ~12 GB at 10 bits/key — past
broadcastability. That regime is what the per-partition cuckoo filters in
cuckoo.py are for (cogrouped membership, no broadcast at all); the broadcast
bloom is the mid-scale (≤ ~10^9 seen) fast path that avoids shuffling the
discovered set entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

BITS_PER_KEY = 10  # ~1% fpp at k=5; false positives only cost exact checks


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 over a uint64 vector — derives the k bloom probes."""
    x = (x + np.uint64(salt)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class NumpyBloom:
    """Picklable vectorized bloom filter over int64 keys."""

    def __init__(self, n_bits: int, k: int = 5):
        n_bits = max(64, n_bits)
        self.n_bits = n_bits
        self.k = k
        self.n_keys = 0  # inserts counted for capacity/growth decisions
        self.bits = np.zeros((n_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        u = keys.astype(np.int64).view(np.uint64)
        return np.stack(
            [
                _mix64(u, 0x9E3779B97F4A7C15 * (i + 1) & 0xFFFFFFFFFFFFFFFF)
                % np.uint64(self.n_bits)
                for i in range(self.k)
            ]
        )

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        self.n_keys += len(keys)
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = np.ones(len(keys), dtype=bool)
        for row in pos:
            word = self.bits[(row >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (row & np.uint64(63))) & np.uint64(1) != 0
        return hit

    def merge(self, other: "NumpyBloom") -> None:
        self.bits |= other.bits


def build_bloom(
    seen: DataFrame,
    hash_col: str = "url_hash",
    bits_per_key: int = 10,
    n: int | None = None,
) -> NumpyBloom:
    """LEGACY monolithic build (full seen scan + driver OR-merge per call).

    The engine's round loop uses the persistent per-bucket bloom table below
    instead (delta-cost updates, broadcast shipping); this remains for
    one-shot/offline uses. Only the fixed-size bit arrays travel to the
    driver, never the keys. Pass `n` (tracked key count) to avoid the sizing
    count job."""
    n = max(n if n is not None else seen.count(), 1)
    n_bits = int(n * bits_per_key)

    def per_partition(it):
        b = NumpyBloom(n_bits)
        for pdf in it:
            b.add_many(pdf[hash_col].to_numpy())
        yield pd.DataFrame({"bits": [b.bits.tobytes()]})

    parts = seen.select(hash_col).mapInPandas(per_partition, schema="bits binary").collect()
    out = NumpyBloom(n_bits)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    out.n_keys = n
    return out


# --- persistent per-bucket bloom state ---------------------------------------
#
# Serialization: a bucket's blob is a STACK of blooms, each
# [n_bits, n_keys, k : int64×3][words : uint64×((n_bits+63)//64)] — the
# header makes blobs self-describing, so stacks parse without a version tag.


def bloom_stack_to_bytes(stack: list[NumpyBloom]) -> bytes:
    out = []
    for b in stack:
        out.append(np.array([b.n_bits, b.n_keys, b.k], dtype=np.int64).tobytes())
        out.append(b.bits.tobytes())
    return b"".join(out)


def bloom_stack_from_bytes(data: bytes) -> list[NumpyBloom]:
    data = bytes(data)
    out: list[NumpyBloom] = []
    off = 0
    while off < len(data):
        n_bits, n_keys, k = (int(x) for x in np.frombuffer(data[off : off + 24], np.int64))
        off += 24
        b = NumpyBloom(n_bits, k)
        b.n_keys = n_keys
        n_words = (n_bits + 63) // 64
        b.bits = np.frombuffer(data[off : off + n_words * 8], np.uint64).copy()
        off += n_words * 8
        out.append(b)
    return out


def bloom_stack_contains(stack: list[NumpyBloom], keys: np.ndarray) -> np.ndarray:
    hit = np.zeros(len(keys), dtype=bool)
    for b in stack:
        hit |= b.might_contain(keys)
    return hit


def bloom_stack_insert(
    stack: list[NumpyBloom], keys: np.ndarray, bits_per_key: int = BITS_PER_KEY
) -> None:
    """Add keys to the stack's newest bloom; append a ≥2×-capacity bloom when
    the newest is at capacity (bits are not resizable in place — growth is
    the same stacking discipline as cuckoo.py; stack fpp ≈ sum of members')."""
    if len(keys) == 0:
        return
    top = stack[-1]
    if (top.n_keys + len(keys)) * bits_per_key > top.n_bits:
        grown = NumpyBloom(max(len(keys) * bits_per_key * 2, top.n_bits * 2))
        stack.append(grown)
        top = grown
    top.add_many(keys)


def bucket_col(hash_col: str, n_buckets: int) -> F.Column:
    return F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")


def build_bloom_buckets(
    keys: DataFrame,
    n_buckets: int,
    hash_col: str = "url_hash",
    bits_per_key: int = BITS_PER_KEY,
    headroom: float = 2.0,
) -> DataFrame:
    """One bloom stack per pmod(url_hash, B) bucket, built executor-side —
    the initial `bloom` table (seed commit, or bootstrap when resuming a
    store that predates bloom state)."""
    keyed = keys.select(
        bucket_col(hash_col, n_buckets).alias("bucket"),
        F.col(hash_col).alias("key"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        ks = pdf["key"].to_numpy(np.int64)
        b = NumpyBloom(max(1024, int(len(ks) * bits_per_key * headroom)))
        b.add_many(ks)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "n_keys": [b.n_keys],
                "data": [bloom_stack_to_bytes([b])],
            }
        )

    return keyed.groupBy("bucket").applyInPandas(build, schema=BLOOM_SCHEMA)


def update_bloom_buckets(
    blooms: DataFrame,
    new_keys: DataFrame,
    n_buckets: int,
    hash_col: str = "url_hash",
    bits_per_key: int = BITS_PER_KEY,
) -> DataFrame:
    """OR this round's new keys into their buckets' stacks (cogrouped Arrow
    pass, cost ∝ |new_keys| — the seen table is never rescanned)."""
    keyed = new_keys.select(
        bucket_col(hash_col, n_buckets).alias("bucket"),
        F.col(hash_col).alias("key"),
    )

    def merge(key, bdf: pd.DataFrame, kdf: pd.DataFrame) -> pd.DataFrame:
        ks = kdf["key"].to_numpy(np.int64) if len(kdf) else np.zeros(0, np.int64)
        if len(bdf):
            stack = bloom_stack_from_bytes(bdf["data"].iloc[0])
        else:
            stack = [NumpyBloom(max(1024, len(ks) * bits_per_key * 2))]
        bloom_stack_insert(stack, ks, bits_per_key)
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "n_keys": [sum(b.n_keys for b in stack)],
                "data": [bloom_stack_to_bytes(stack)],
            }
        )

    return (
        blooms.groupby("bucket")
        .cogroup(keyed.groupby("bucket"))
        .applyInPandas(merge, schema=BLOOM_SCHEMA)
    )


def broadcast_blooms(spark: SparkSession, blooms: DataFrame, n_buckets: int):
    """Collect the fixed-size bucket rows and ship once per executor via
    SparkContext.broadcast (closure capture re-pickles per task). Driver cost
    ∝ total bloom bits (MBs), never ∝ seen keys. Caller destroys the
    broadcast after the round's outputs are materialized."""
    rows = blooms.collect()
    state = {
        int(r["bucket"]): bloom_stack_from_bytes(r["data"]) for r in rows
    }
    return spark.sparkContext.broadcast((n_buckets, state))


def filter_unseen(
    discovered: DataFrame,
    seen: DataFrame,
    bloom=None,
    hash_col: str = "url_hash",
    url_col: str = "url",
    cleanup: list | None = None,
) -> DataFrame:
    """Rows of `discovered` whose (url_hash, url) is absent from `seen`.

    `bloom` is either a Broadcast[(n_buckets, {bucket: bloom stack})] from
    `broadcast_blooms` (the engine path), a bare NumpyBloom (legacy
    monolith), or None (pure exact anti-join). A bucket with no state holds
    no seen keys, so its URLs are definitely new — correct because the bloom
    table covers every committed seen delta (same invariant as cuckoo.py).

    `cleanup`: optional registry — the tagged frame feeds two filters, so it
    is cached and appended for the caller to unpersist post-materialization."""
    if bloom is None:
        return discovered.join(seen, on=[hash_col, url_col], how="left_anti")

    if isinstance(bloom, NumpyBloom):
        b = bloom  # closure-captured; ships once per task via the pickled UDF

        @pandas_udf(BooleanType())
        def in_bloom(h: pd.Series) -> pd.Series:
            return pd.Series(b.might_contain(h.to_numpy()))

    else:
        bc = bloom

        @pandas_udf(BooleanType())
        def in_bloom(h: pd.Series) -> pd.Series:
            n_buckets, state = bc.value
            hv = h.to_numpy(np.int64)
            bkt = hv % np.int64(n_buckets)  # floored mod == Spark pmod
            out = np.zeros(len(hv), dtype=bool)
            for b_ in np.unique(bkt):
                stack = state.get(int(b_))
                if stack is None:
                    continue
                m = bkt == b_
                out[m] = bloom_stack_contains(stack, hv[m])
            return pd.Series(out)

    tagged = discovered.withColumn("__maybe_seen", in_bloom(F.col(hash_col)))
    if cleanup is not None:
        tagged = tagged.cache()
        cleanup.append(tagged)
    definitely_new = tagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    candidates = tagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    checked = candidates.join(seen, on=[hash_col, url_col], how="left_anti")
    return definitely_new.unionByName(checked)
