"""Snapshot-atomic multi-table commits over plain Parquet.

Iceberg semantics without requiring an Iceberg catalog in the sandbox
(SURVEY.md §7 P0/P6): every round commits ALL its table deltas (frontier,
seen, fetch_log, lineage, checkpoint) in ONE atomic manifest swap, so a
killed job resumes from the last complete round with an identical URL-seen
set. This closes the replay window the reference leaves open by writing
`latest_block` only after side effects (cmd/onchain.go:114-119) and absorbing
replays with ON CONFLICT upserts (db/graphqldb/custom.sql.go:29-42).

Mechanics: table deltas land in content-addressed directories first; the
manifest (JSON) referencing them is then atomically `os.replace`d. Orphan
directories from a crashed commit are simply never referenced. On a real
cluster the same API is backed by Iceberg `writeTo(...).append()` inside a
single transaction; the store hides which backend is active.

Tables support two modes per commit: `append` (fetch_log, lineage, url_seen
deltas, frontier adds, checkpoints) and `replace` (periodic compactions —
e.g. the frontier's every-K-rounds consolidation; a replace resets the
table's path list, so reads never fan over unbounded delta dirs).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import schema as S


class SnapshotStore:
    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(os.path.join(self.base, "tables"), exist_ok=True)
        self._manifest_path = os.path.join(self.base, "manifest.json")

    # -- manifest ------------------------------------------------------------
    def _load(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        return self._load()["snapshots"]

    def last_round(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["round"] if snaps else None

    def last_counter(self, name: str, default: int = 0) -> int:
        """Most recent value of a commit counter (e.g. cumulative seen_total).

        Lets hot-path gates (bloom build threshold) run without a Spark job."""
        for snap in reversed(self.snapshots()):
            if name in snap.get("counters", {}):
                return snap["counters"][name]
        return default

    # -- commit --------------------------------------------------------------
    def commit(
        self,
        round_no: int,
        appends: dict[str, DataFrame],
        replaces: dict[str, DataFrame] | None = None,
        counters: dict[str, int] | None = None,
        checkpoint: dict[str, int] | None = None,
        partitioned_replaces: (
            dict[str, tuple[DataFrame, str, list[int]]] | None
        ) = None,
        deferred_appends: dict[str, Callable[[], DataFrame]] | None = None,
    ) -> str:
        """Write all deltas, then atomically publish one snapshot.

        `partitioned_replaces` maps table -> (df, bucket_col, bucket_ids):
        ONE partitionBy(bucket_col) write, then a per-bucket replace entry
        `{table}#b{k}` pointing at the bucket's subdirectory — the sandbox
        analog of Iceberg MERGE rewriting only matched files. Buckets absent
        from `bucket_ids` keep their previous paths byte-identical, so the
        commit cost is ∝ dirty buckets, not table size (VERDICT r3 wrong #2).

        `deferred_appends` maps table -> zero-arg builder. The builder runs
        INSIDE the concurrent write pool, so a table whose plan needs its own
        pre-jobs (the fetch log's range-sample + per-partition count for the
        global sequence) no longer serializes in front of the OTHER tables'
        writes — everything independent starts immediately. `counters` and
        `checkpoint` may be zero-arg callables, resolved AFTER all table
        writes complete (counters first) — which lets their values come from
        `Observation`s piggybacked on the writes themselves instead of
        dedicated count jobs; the checkpoint row then costs one serial 1-row
        write before the manifest swap.

        `checkpoint` (keys frontier_count/seen_count/fetched_count) appends a
        one-row `checkpoints` table IN the same snapshot — the queryable
        analog of the reference's chains.latest_block cursor row
        (cmd/onchain.go:115-119), except it can never run ahead of or behind
        the data it describes: the row and the deltas publish in one manifest
        swap. Counts come from the caller's incremental counters, so the row
        costs no extra Spark jobs beyond its own 1-row write."""
        snapshot_id = f"snap-{round_no}-{uuid.uuid4().hex[:12]}"
        appends = dict(appends or {})

        def _spark_for_row() -> SparkSession:
            dfs_in = {**appends, **(replaces or {})}
            if dfs_in:
                return next(iter(dfs_in.values())).sparkSession
            # checkpoint-only commit (no table deltas): fall back to the
            # active session instead of StopIteration (ADVICE r3)
            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    "checkpoint-only commit requires an active SparkSession"
                )
            return spark

        def _checkpoint_df(ck: dict[str, int]) -> DataFrame:
            return _spark_for_row().createDataFrame(
                [
                    (
                        round_no,
                        snapshot_id,
                        int(ck["frontier_count"]),
                        int(ck["seen_count"]),
                        int(ck["fetched_count"]),
                    )
                ],
                S.CHECKPOINTS,
            )

        if checkpoint is not None and not callable(checkpoint):
            appends["checkpoints"] = _checkpoint_df(checkpoint)
        entry: dict = {
            "snapshot_id": snapshot_id,
            "round": round_no,
            "append": {},
            "replace": {},
            "counters": {},
        }
        # the table writes are independent Spark jobs on disjoint paths —
        # submit them concurrently (Spark's scheduler interleaves their
        # stages) so the commit's wall is max(write), not sum(write). The
        # manifest swap below stays the single serial commit point.
        # path carries the kind so a commit that BOTH replaces and appends the
        # same table (e.g. compaction folding `checkpoints` while adding its
        # own checkpoint row) writes two distinct directories
        writes: list[tuple[DataFrame, str, str | None]] = []
        for kind, tables in (("append", appends or {}), ("replace", replaces or {})):
            for name, df in tables.items():
                path = os.path.join(
                    self.base, "tables", name, f"{snapshot_id}-{kind}"
                )
                writes.append((df, path, None))
                entry[kind][name] = path
        for name, (df, bucket_col, bucket_ids) in (partitioned_replaces or {}).items():
            path = os.path.join(self.base, "tables", name, f"{snapshot_id}-preplace")
            writes.append((df, path, bucket_col))
            for k in bucket_ids:
                entry["replace"][f"{name}#b{int(k)}"] = os.path.join(
                    path, f"{bucket_col}={int(k)}"
                )

        deferred: list[tuple[Callable[[], DataFrame], str]] = []
        for name, build in (deferred_appends or {}).items():
            path = os.path.join(self.base, "tables", name, f"{snapshot_id}-append")
            deferred.append((build, path))
            entry["append"][name] = path

        def _write(df: DataFrame, path: str, part_col: str | None) -> None:
            w = df.write.mode("overwrite")
            if part_col is not None:
                w = w.partitionBy(part_col)
            w.parquet(path)

        def _write_deferred(build: Callable[[], DataFrame], path: str) -> None:
            _write(build(), path, None)

        n_tasks = len(writes) + len(deferred)
        if n_tasks > 1:
            with ThreadPoolExecutor(max_workers=n_tasks) as pool:
                futs = [pool.submit(_write, *args) for args in writes] + [
                    pool.submit(_write_deferred, *args) for args in deferred
                ]
                for f in futs:
                    f.result()
        else:
            for args in writes:
                _write(*args)
            for args in deferred:
                _write_deferred(*args)

        # post-write resolution: counters first (checkpoint callables may
        # read what they computed), then the checkpoint row's 1-row write
        if callable(counters):
            counters = counters()
        entry["counters"] = counters or {}
        if checkpoint is not None and callable(checkpoint):
            path = os.path.join(
                self.base, "tables", "checkpoints", f"{snapshot_id}-append"
            )
            _write(_checkpoint_df(checkpoint()), path, None)
            entry["append"]["checkpoints"] = path
        manifest = self._load()
        # idempotent replay: drop any snapshot for the same round (a retried
        # round replaces its partial predecessor — exactly-once on resume)
        manifest["snapshots"] = [
            s for s in manifest["snapshots"] if s["round"] < round_no
        ]
        manifest["snapshots"].append(entry)
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # the atomic commit point
        return snapshot_id

    # -- read ----------------------------------------------------------------
    def _paths_for(self, table: str, as_of_round: int | None = None) -> list[str]:
        paths: list[str] = []
        for snap in self.snapshots():
            if as_of_round is not None and snap["round"] > as_of_round:
                break  # snapshots are round-ordered; later ones don't exist yet
            if table in snap["replace"]:
                p = snap["replace"][table]
                # a base snapshot (expire_snapshots) folds state into a path
                # LIST; ordinary replaces stay single strings
                paths = list(p) if isinstance(p, list) else [p]
            if table in snap["append"]:
                paths.append(snap["append"][table])
        return paths

    def has_table(self, table: str) -> bool:
        return bool(self._paths_for(table))

    def appends_since_replace_of(self, table: str, anchor: str) -> list[str]:
        """Append paths of `table` from snapshots strictly AFTER the last
        snapshot that replaced `anchor` (all appends if `anchor` was never
        replaced). Powers delta-table reads where a periodic compaction of
        `anchor` already folded older deltas in — e.g. the frontier reads
        fetch_log tombstones only since its own last compaction."""
        paths: list[str] = []
        for snap in self.snapshots():
            if snap.get("base"):
                # an expire_snapshots base is NOT an `anchor` compaction: the
                # folded `anchor` state was built from adds-minus-consumed
                # views, so pre-base consumption records must survive. The
                # base's folded `table` paths stand in for every pre-base
                # append (possibly a superset of the true tail — safe for
                # consumption anti-joins, where absent keys no-op).
                p = snap["replace"].get(table, [])
                paths = list(p) if isinstance(p, list) else [p]
            elif anchor in snap["replace"]:
                # a compaction of `anchor` folds everything through its own
                # snapshot in — same-snapshot appends of `table` are skipped
                paths = []
            elif table in snap["append"]:
                paths.append(snap["append"][table])
        return paths

    def read(
        self,
        spark: SparkSession,
        table: str,
        schema: T.StructType,
        as_of_round: int | None = None,
    ) -> DataFrame:
        """Current state of `table`, or — with `as_of_round` — its state as of
        that round's snapshot (Iceberg time travel: `VERSION AS OF`). Reads
        replay the manifest only through snapshots with round <= as_of_round,
        so the URL-seen set / frontier / fetch_log of ANY past round is
        byte-reproducible from the same store, which is what makes the
        per-round lineage auditable after later rounds have committed."""
        snaps = self.snapshots()
        if (
            as_of_round is not None
            and snaps
            and snaps[0].get("base")
            and as_of_round < snaps[0]["round"]
        ):
            raise ValueError(
                f"time travel to round {as_of_round} is below the expire "
                f"horizon (oldest retained state: round {snaps[0]['round']})"
            )
        paths = self._paths_for(table, as_of_round)
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)

    def expire_snapshots(
        self, keep_last: int = 3, delete_orphans: bool = True
    ) -> dict:
        """Iceberg `expire_snapshots` + `remove_orphan_files` analog: fold
        every snapshot older than the newest `keep_last` into ONE synthetic
        base snapshot whose replace entries list the surviving paths — pure
        metadata, no data rewrite — then delete delta directories the new
        manifest no longer references (crashed-commit and rollback orphans
        included). Time travel below the base round raises; current-state
        reads are byte-identical before and after. Bounds manifest growth
        and storage for long-running crawls the way Iceberg's snapshot
        expiration does."""
        snaps = self.snapshots()
        expired = 0
        if len(snaps) > keep_last:
            cut = len(snaps) - keep_last
            folded, kept = snaps[:cut], snaps[cut:]
            cutoff_round = folded[-1]["round"]
            tables: set[str] = set()
            for s in folded:
                tables |= set(s["append"]) | set(s["replace"])
            # carry forward the most recent value of every counter so
            # last_counter() is unchanged by expiration
            counters: dict[str, int] = {}
            for s in folded:
                counters.update(s.get("counters", {}))
            base = {
                "snapshot_id": f"base-{cutoff_round}-{uuid.uuid4().hex[:12]}",
                "round": cutoff_round,
                "base": True,
                "append": {},
                "replace": {
                    t: self._paths_for(t, as_of_round=cutoff_round)
                    for t in sorted(tables)
                },
                "counters": counters,
            }
            manifest = self._load()
            manifest["snapshots"] = [base] + kept
            tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, self._manifest_path)
            expired = cut
        orphans = self._delete_orphans() if delete_orphans else 0
        return {"expired": expired, "orphans_deleted": orphans}

    def _delete_orphans(self) -> int:
        """Remove tables/<name>/<delta-dir> directories no manifest entry
        references (directly or via a bucket subpath)."""
        referenced: list[str] = []
        for snap in self.snapshots():
            for kind in ("append", "replace"):
                for p in snap[kind].values():
                    referenced.extend(p if isinstance(p, list) else [p])
        refs = [os.path.normpath(p) for p in referenced]
        deleted = 0
        tables_root = os.path.join(self.base, "tables")
        for name in os.listdir(tables_root):
            tdir = os.path.join(tables_root, name)
            if not os.path.isdir(tdir):
                continue
            for delta in os.listdir(tdir):
                ddir = os.path.normpath(os.path.join(tdir, delta))
                if not any(
                    r == ddir or r.startswith(ddir + os.sep) for r in refs
                ):
                    shutil.rmtree(ddir, ignore_errors=True)
                    deleted += 1
        return deleted

    def rollback_to(self, round_no: int) -> None:
        """Drop every snapshot AFTER `round_no` (Iceberg rollback): the next
        commit resumes from that round's exact table state. Delta directories
        of dropped snapshots become unreferenced orphans — same lifecycle as a
        crashed commit's dirs, cleaned by compaction, never read again. The
        manifest swap is the single atomic point, mirroring commit()."""
        manifest = self._load()
        manifest["snapshots"] = [
            s for s in manifest["snapshots"] if s["round"] <= round_no
        ]
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def bucket_paths(self, table: str, buckets: list[int] | range) -> list[str]:
        """Current paths of the given buckets of a partitioned-replace table."""
        return [p for k in buckets for p in self._paths_for(f"{table}#b{int(k)}")]

    def read_bucketed(
        self,
        spark: SparkSession,
        table: str,
        n_buckets: int,
        schema: T.StructType,
    ) -> DataFrame:
        return self.read_paths(spark, self.bucket_paths(table, range(n_buckets)), schema)

    def read_paths(self, spark: SparkSession, paths: list[str], schema: T.StructType) -> DataFrame:
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)

    def destroy(self) -> None:
        shutil.rmtree(self.base, ignore_errors=True)

    def diff(
        self,
        spark: SparkSession,
        table: str,
        schema: T.StructType,
        from_round: int,
        to_round: int,
    ) -> DataFrame:
        """Changelog between two snapshots (Iceberg's CDC `table_changes`
        analog): rows present at `to_round` but not `from_round` are
        'insert', rows gone are 'delete'. Computed as two anti-joins over
        the full row (all columns as the key), so it is exact for
        append-only, replace, and compaction histories alike.

        Scale note: anti-joins hash-partition on the full row; for the
        common append-only case prefer reading only the delta dirs
        (appends_since_replace_of) — this method is the general-history
        fallback and the audit tool."""
        cols = [f.name for f in schema.fields]
        old = self.read(spark, table, schema, as_of_round=from_round)
        new = self.read(spark, table, schema, as_of_round=to_round)
        from pyspark.sql import functions as F  # local: keep module imports lean

        inserts = new.join(old, on=cols, how="left_anti").withColumn(
            "change_type", F.lit("insert")
        )
        deletes = old.join(new, on=cols, how="left_anti").withColumn(
            "change_type", F.lit("delete")
        )
        return inserts.unionByName(deletes)
