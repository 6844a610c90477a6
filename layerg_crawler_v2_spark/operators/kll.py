"""KLL-style mergeable quantile sketch — distribution telemetry without a
global sort.

The crawl scheduler's latency/size/score distributions (fetch-delay
percentiles per round, page-size p99 for shard sizing, quality-score
deciles for threshold picking) need quantiles over 10^10 rows. Exact
percentiles (operators/stats.py) pay a per-group sort — right for the
oracled per-group analysis pass, wrong for an every-round telemetry probe
over the whole frontier. The KLL compactor hierarchy (Karnin, Lang,
Liberty, FOCS'16; lineage: Munro-Paterson / Manku-Rajagopalan-Lindsay)
answers any quantile within eps*N rank error from O((1/eps)*log(N))
retained items, and two sketches MERGE into one with the same bound —
the treeAggregate shape Spark needs.

Determinism: compaction keeps odd- or even-indexed items; the classic
randomized coin becomes a DETERMINISTIC alternating parity per compactor
(the original Munro-Paterson discipline). Same input partitioning =>
bit-identical sketch; different partitionings => possibly different
retained items but the SAME rank-error guarantee (what the property
tests pin — bit-invariance across partitionings is impossible for any
merge-order-dependent summary and is declared, not hidden).

Scale shape (the CMS/HLL discipline, operators/sketch.py): one
mapInPandas pass builds a per-partition sketch (numpy sorts over <=
capacity items — Arrow-batched, no per-row Python), the exchange carries
ONE sketch-sized row per partition (never data), and the driver folds
P sketches with the same merge the executors used. No groupBy over the
value domain, no sort, no Window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 200  # per-level capacity target; eps ~ O(1/k)


@dataclass
class KLLSketch:
    """Compactor hierarchy: levels[i] holds items each representing 2^i
    input rows. Level arrays are kept sorted; `parities[i]` alternates
    the kept offset per compaction (deterministic)."""

    k: int = DEFAULT_K
    levels: list[np.ndarray] = field(default_factory=list)
    parities: list[int] = field(default_factory=list)
    n: int = 0

    # -- construction ---------------------------------------------------------

    def _capacity(self, height: int, idx: int) -> int:
        # geometric decay (2/3 ratio) of per-level capacity below the top,
        # floored at 2 — the standard KLL schedule
        c = int(np.ceil(self.k * (2.0 / 3.0) ** (height - 1 - idx)))
        return max(2, c)

    def _ensure_level(self, i: int) -> None:
        while len(self.levels) <= i:
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parities.append(0)

    def update_batch(self, values: np.ndarray) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self._ensure_level(0)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self.n += int(vals.size)
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            height = len(self.levels)
            cap = self._capacity(height, i)
            if self.levels[i].size > cap:
                arr = np.sort(self.levels[i])
                # odd sizes: the unpaired FIRST item stays at this level
                # (deterministic; never dropped)
                odd = arr.size % 2
                keep_here = arr[:odd]
                pairs = arr[odd:]
                kept = pairs[self.parities[i]::2]
                self.parities[i] ^= 1
                self._ensure_level(i + 1)
                self.levels[i] = keep_here
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], kept]
                )
            i += 1

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        assert self.k == other.k, "merging sketches with different k"
        out = KLLSketch(k=self.k)
        h = max(len(self.levels), len(other.levels))
        if h:
            out._ensure_level(h - 1)
        for i in range(h):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels[i] = np.concatenate([a, b])
            out.parities[i] = (
                self.parities[i] if i < len(self.parities) else 0
            ) ^ (other.parities[i] if i < len(other.parities) else 0)
        out.n = self.n + other.n
        out._compress()
        return out

    # -- queries --------------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, arr in enumerate(self.levels):
            if arr.size:
                items.append(arr)
                weights.append(np.full(arr.size, 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        """Value whose weighted rank ~ q*n (q in [0, 1])."""
        items, weights = self._weighted()
        if items.size == 0:
            return float("nan")
        target = q * float(self.n)
        cum = np.cumsum(weights)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(items[min(idx, items.size - 1)])

    def rank(self, value: float) -> int:
        """Estimated number of input rows <= value."""
        items, weights = self._weighted()
        if items.size == 0:
            return 0
        return int(weights[items <= value].sum())

    def retained(self) -> int:
        return int(sum(arr.size for arr in self.levels))

    # -- serialization (for the executor -> driver row) -----------------------

    def to_row(self) -> dict:
        return {
            "k": self.k,
            "n": self.n,
            "sizes": [int(a.size) for a in self.levels],
            "parities": list(self.parities),
            "items": np.concatenate(
                [a for a in self.levels] or [np.empty(0)]
            ).tolist(),
        }

    @classmethod
    def from_row(cls, row) -> "KLLSketch":
        s = cls(k=int(row["k"]))
        s.n = int(row["n"])
        flat = np.asarray(list(row["items"]), dtype=np.float64)
        pos = 0
        for size, par in zip(row["sizes"], row["parities"]):
            s.levels.append(flat[pos:pos + int(size)].copy())
            s.parities.append(int(par))
            pos += int(size)
        return s


_SKETCH_SCHEMA = (
    "k int, n long, sizes array<int>, parities array<int>, "
    "items array<double>"
)


def kll_partition_sketches(
    df: DataFrame, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """ONE sketch-row per partition: the only exchange downstream carries
    O(P * k log(N/P)) numbers, never data rows."""

    def per_partition(batches):
        sk = KLLSketch(k=k)
        for pdf in batches:
            sk.update_batch(pdf[value_col].to_numpy(dtype=np.float64))
        if sk.n:
            yield pd.DataFrame([sk.to_row()])

    return df.select(value_col).mapInPandas(per_partition, _SKETCH_SCHEMA)


def kll_sketch(
    df: DataFrame, value_col: str, k: int = DEFAULT_K
) -> KLLSketch:
    """Build the global sketch: partition pass + driver fold of the
    P sketch rows (model-sized collect — the CMS/HLL discipline)."""
    rows = kll_partition_sketches(df, value_col, k).collect()
    out = KLLSketch(k=k)
    for row in rows:
        out = out.merge(KLLSketch.from_row(row))
    return out


def kll_quantiles(
    df: DataFrame, value_col: str, qs: list[float], k: int = DEFAULT_K
) -> DataFrame:
    """(q, value) for each requested quantile — the telemetry surface."""
    sk = kll_sketch(df, value_col, k)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(q), sk.quantile(q)) for q in qs], "q double, value double"
    )


def kll_grouped_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qs: list[float],
    k: int = DEFAULT_K,
) -> DataFrame:
    """(key, n, q, value) per group — per-host fetch-latency percentiles,
    per-language size deciles: the grouped telemetry shape.

    Two-phase, never whole-group-in-memory: phase 1 is one mapInPandas
    pass building a sketch PER KEY PER PARTITION (task memory = keys in
    that partition x sketch size, independent of group row counts); the
    exchange then carries sketch rows keyed by `key` — O(P) rows per key,
    never data — and phase 2 merges each key's P sketches with
    applyInPandas and answers the quantiles. A hot key (one host = 10^8
    fetches) costs its partitions' sketches, not its rows."""

    def per_partition(batches):
        sketches: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(key_col, dropna=False):
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = KLLSketch(k=k)
                sk.update_batch(grp[value_col].to_numpy(dtype=np.float64))
        rows = [
            {"key": key, **sk.to_row()}
            for key, sk in sketches.items()
            if sk.n
        ]
        if rows:
            yield pd.DataFrame(rows)

    partials = df.select(
        F.col(key_col).cast("string").alias(key_col), value_col
    ).mapInPandas(per_partition, f"key string, {_SKETCH_SCHEMA}")

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k=k)
        for _, row in pdf.iterrows():
            sk = sk.merge(KLLSketch.from_row(row))
        return pd.DataFrame(
            {
                "key": pdf["key"].iloc[0],
                "n": sk.n,
                "q": [float(q) for q in qs],
                "value": [sk.quantile(q) for q in qs],
            }
        )

    return partials.groupBy("key").applyInPandas(
        merge_group, "key string, n long, q double, value double"
    )
