"""Dedup-then-batch-enrich: the reference's batched RPC lookup as an operator.

Graft analog of rpc.BatchCallContext (cmd/onchain.go:326-343): instead of one
RPC per row, the reference groups keys into one batched call. Spark shape
(SURVEY.md §2 S5):

  1. DISTINCT the lookup keys (dedup — hot keys resolve once per job, not
     once per row);
  2. call the user's `lookup_fn` on SLICES of each Arrow batch inside
     `mapInPandas` (one external call per ≤batch_size keys, never per row —
     executors each own a disjoint key range, so a cluster issues
     O(unique_keys / batch_size) calls total);
  3. LEFT JOIN the enrichment back onto the original rows (AQE broadcasts it
     when small).

`lookup_fn(keys: list) -> list[dict]` is the user's I/O boundary (HTTP
metadata endpoint, KV store, token-URI resolver). It must be deterministic
per key for replays to be idempotent; failures should raise (the Spark task
retry is the RPC retry).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def batched_lookup(
    df: DataFrame,
    key_col: str,
    lookup_fn: Callable[[list], list[dict]],
    result_schema: T.StructType,
    batch_size: int = 100,
) -> DataFrame:
    """Enrich `df` with `lookup_fn` results, one batched call per
    ≤batch_size distinct keys. `result_schema` must include `key_col`."""
    assert key_col in [f.name for f in result_schema.fields], (
        f"result_schema must carry the join key {key_col!r}"
    )
    keys = df.select(key_col).distinct()
    names = [f.name for f in result_schema.fields]

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = pdf[key_col].tolist()
            rows: list[dict] = []
            for i in range(0, len(ks), batch_size):
                rows.extend(lookup_fn(ks[i : i + batch_size]))
            yield pd.DataFrame(rows, columns=names)

    enriched = keys.mapInPandas(per_partition, schema=result_schema)
    return df.join(enriched, on=key_col, how="left")
