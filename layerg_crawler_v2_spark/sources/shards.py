"""WebDataset-style tar-shard export — the training-data handoff format.

Large-scale training loaders (WebDataset/torchdata, NeMo, Megatron data
pipelines) consume corpora as directories of tar "shards": each sample is a
pair of members `<key>.txt` + `<key>.json` (payload + metadata), shards are
size-bounded so loader workers stream them independently, and a manifest
lists every member with byte offsets for ranged access. This module is the
export half of the archive story next to sources/warc.py (WARC = crawl
interchange; tar shards = trainer interchange), reusing its discipline:
executor-side writes, one task per shard on read, manifest computed DURING
the write with no second pass.

Determinism: tar bytes are byte-reproducible for a given input partition —
USTAR format, mtime=0, uid/gid=0, no user/group names — so shard content
hashes are stable across runs (the WARC writer's fixed-layout analog).
Shard files are named shard-{partition:05d}-{seq:04d}.tar: deterministic
under a fixed partitioning, unique under any."""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "shard_file string, key string, offset long, length long, "
    "meta_length long"
)


def _tar_add(tf: tarfile.TarFile, name: str, data: bytes) -> int:
    """Add one member with pinned metadata; returns the DATA offset in
    the archive (header is exactly one 512-byte block for USTAR names
    this short)."""
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    offset = tf.fileobj.tell() + 512  # type: ignore[union-attr]
    tf.addfile(info, io.BytesIO(data))
    return offset


def write_tar_shards(
    docs: DataFrame,
    out_dir: str,
    max_docs_per_shard: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_col: str | None = None,
) -> DataFrame:
    """docs rows -> tar shards of at most max_docs_per_shard samples;
    returns the manifest (shard_file, key, offset, length, meta_length)
    — `offset`/`length` locate the .txt payload for one ranged read (tar
    stores member data verbatim), the CDX-index analog. The returned
    DataFrame IS the execution (write_warc_indexed discipline). Keys are
    zero-padded ids; each sample emits <key>.txt and, when meta_col is
    given, <key>.json."""

    cols = [id_col, text_col] + ([meta_col] if meta_col else [])

    def per_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()  # type: ignore[union-attr]
        rows: list[tuple] = []
        seq = 0
        buf: io.BytesIO | None = None
        tf: tarfile.TarFile | None = None
        fname = ""
        n_in_shard = 0

        def open_shard():
            nonlocal buf, tf, fname, n_in_shard, seq
            buf = io.BytesIO()
            tf = tarfile.open(
                fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
            )
            fname = f"shard-{pid:05d}-{seq:04d}.tar"
            seq += 1
            n_in_shard = 0

        def close_shard():
            if tf is None or n_in_shard == 0:
                return
            tf.close()
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(buf.getvalue())

        open_shard()
        for pdf in it:
            for tup in zip(*(pdf[c] for c in cols)):
                did, text = tup[0], tup[1]
                meta = tup[2] if meta_col else None
                if n_in_shard >= max_docs_per_shard:
                    close_shard()
                    open_shard()
                key = f"{int(did):012d}"
                payload = (text or "").encode("utf-8")
                off = _tar_add(tf, f"{key}.txt", payload)
                mlen = 0
                if meta_col:
                    mb = (meta or "{}").encode("utf-8")
                    _tar_add(tf, f"{key}.json", mb)
                    mlen = len(mb)
                rows.append((fname, key, off, len(payload), mlen))
                n_in_shard += 1
        close_shard()
        yield pd.DataFrame(
            rows,
            columns=["shard_file", "key", "offset", "length", "meta_length"],
        )

    return docs.select(*cols).mapInPandas(
        per_partition, schema=MANIFEST_SCHEMA
    )


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Shard directory -> (shard_file, key, text, meta) — one task per
    shard file (binaryFile source, the warc.py read idiom), tarfile
    decode inside mapInPandas."""

    def per_file(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                out: dict[str, dict] = {}
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content)), mode="r"
                ) as tf:
                    for m in tf.getmembers():
                        key, _, kind = m.name.rpartition(".")
                        data = tf.extractfile(m).read()  # type: ignore
                        slot = out.setdefault(
                            key, {"text": None, "meta": None}
                        )
                        if kind == "txt":
                            slot["text"] = data.decode("utf-8")
                        elif kind == "json":
                            slot["meta"] = data.decode("utf-8")
                fname = os.path.basename(fpath)
                yield pd.DataFrame(
                    {
                        "shard_file": fname,
                        "key": sorted(out),
                        "text": [out[k]["text"] for k in sorted(out)],
                        "meta": [out[k]["meta"] for k in sorted(out)],
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(f"{path}/*.tar")
        .select("path", "content")
        .mapInPandas(
            per_file,
            schema="shard_file string, key string, text string, meta string",
        )
    )
