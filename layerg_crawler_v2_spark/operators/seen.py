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

Scale notes (10^10 URLs): one monolithic bloom is ~12 GB at 1% fpp — too big
to broadcast. The deployment shape is one bloom per host_bucket (the frontier
is already partitioned by bucket), each a few hundred MB, broadcast only to
the tasks processing that bucket; `build_bloom` takes an optional bucket
filter for exactly that. The per-partition exact structure is the cuckoo
filter in `cuckoo.py`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


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
    """Distributed bloom build: per-partition blooms OR-merged on the driver.

    Only the fixed-size bit arrays travel to the driver, never the keys.
    Pass `n` (tracked key count) to avoid the sizing count job."""
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
    return out


def filter_unseen(
    discovered: DataFrame,
    seen: DataFrame,
    bloom: NumpyBloom | None = None,
    hash_col: str = "url_hash",
    url_col: str = "url",
    cleanup: list | None = None,
) -> DataFrame:
    """Rows of `discovered` whose (url_hash, url) is absent from `seen`.

    `cleanup`: optional registry — the tagged frame feeds two filters, so it
    is cached and appended for the caller to unpersist post-materialization."""
    if bloom is None:
        return discovered.join(seen, on=[hash_col, url_col], how="left_anti")

    b = bloom  # closure-captured; ships once per task via the pickled UDF

    @pandas_udf(BooleanType())
    def in_bloom(h: pd.Series) -> pd.Series:
        return pd.Series(b.might_contain(h.to_numpy()))

    tagged = discovered.withColumn("__maybe_seen", in_bloom(F.col(hash_col)))
    if cleanup is not None:
        tagged = tagged.cache()
        cleanup.append(tagged)
    definitely_new = tagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    candidates = tagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    checked = candidates.join(seen, on=[hash_col, url_col], how="left_anti")
    return definitely_new.unionByName(checked)
