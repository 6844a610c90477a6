"""WARC segment source — web-archive files → the engine's `pages` table.

WARC (ISO 28500) is the interchange format real web crawls store and ship
(Common Crawl, Heritrix, wget --warc). The reference ingests from a live
upstream it cannot control (internal/chain RPC pollers, SURVEY.md §2.1 S1);
the batch analog for a WEB crawl engine is re-ingesting archived capture
segments, so this source closes the loop: a crawl written out as WARC can be
re-read into the exact `pages` input shape (SURVEY.md §1.4 input_hint).

Scale design (100 TB = ~100k 1 GB segments):
  * `spark.read.format("binaryFile")` gives ONE TASK PER SEGMENT FILE —
    exactly how WARC corpora parallelize in practice (segments are
    independent; gzip members are not splittable mid-stream). 100k files on
    1,000 executors is 100 waves of embarrassingly parallel decode with no
    shuffle at all; the only exchange in `warc_to_pages` is none (narrow).
  * All record parsing is bytes-in/Arrow-out inside `mapInPandas` — no
    per-row Python UDF, no driver involvement, memory bounded by one
    segment per task (keep segment size ≤ a few GB, the WARC convention).
  * Both plain and gzip'd segments are handled; per-record gzip members
    (the Common Crawl layout) and whole-file gzip both decode, because
    stdlib zlib consumes concatenated members identically.

Record grammar parsed here (WARC/1.0 and 1.1): a version line, CRLF header
lines until an empty line, `Content-Length` octets of block, then CRLF CRLF.
For `response` records whose block is an HTTP/1.x message, the HTTP status
line + headers are split off and the entity body becomes the page payload.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_RECORDS_SCHEMA = (
    "warc_file string, warc_type string, record_id string, target_uri string, "
    "warc_date timestamp, http_status int, content_type string, payload binary"
)


def _gunzip_all(b: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw bytes pass
    through untouched. Common Crawl writes one gzip member per record —
    zlib with wbits=47 consumes members one at a time, so we loop."""
    if len(b) < 2 or b[:2] != b"\x1f\x8b":
        return b
    out, pos = [], 0
    while pos < len(b) and b[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=47)
        out.append(d.decompress(b[pos:]))
        consumed = len(b) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailer: stop rather than spin
            break
        pos += consumed
    return b"".join(out)


def _parse_http_block(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP/1.x message block into (status, content_type, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block[:5] == b"HTTP/":
        return None, None, block
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(b"\r\n")
    status = None
    parts = lines[0].split(b" ", 2)
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def parse_warc_bytes(name: str, raw: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record in a segment (plain or gzip'd)."""
    data = _gunzip_all(bytes(raw))
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding/blank lines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for ln in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break  # malformed length: cannot find the next record safely
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        wtype = headers.get("warc-type", "")
        status, http_ctype, body = (None, None, block)
        if wtype in ("response", "revisit") and block[:5] == b"HTTP/":
            status, http_ctype, body = _parse_http_block(block)
        wdate = None
        ds = headers.get("warc-date")
        if ds:
            try:
                wdate = datetime.fromisoformat(ds.replace("Z", "+00:00"))
                if wdate.tzinfo is None:
                    wdate = wdate.replace(tzinfo=timezone.utc)
            except ValueError:
                wdate = None
        yield {
            "warc_file": name,
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": wdate,
            "http_status": status,
            "content_type": http_ctype or headers.get("content-type"),
            "payload": body,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC segment files (plain or .gz) -> one row per WARC record.

    binaryFile tasks are file-granular (segments are not splittable), which
    is the standard unit of parallelism for archived crawls; everything
    downstream is a narrow Arrow pass."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for name, raw in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(name, raw))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "warc_type", "record_id", "target_uri",
                    "warc_date", "http_status", "content_type", "payload",
                ],
            )

    return files.mapInPandas(per_batch, schema=WARC_RECORDS_SCHEMA)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Successful HTML response records -> the `pages` input shape
    (url, warc_ts, html, text, lang). text/lang stay NULL here — they are
    produced downstream by functions.extract (the same division of labor
    as a fetched page entering the crawl loop)."""
    return (
        records.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("target_uri").isNotNull()
        )
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


# --- write side + fixture twin ----------------------------------------------

def encode_warc_record(
    warc_type: str,
    record_id: str,
    target_uri: str | None,
    warc_date: datetime | None,
    payload: bytes,
    http_status: int | None = None,
    content_type: str | None = None,
) -> bytes:
    """One spec-shaped WARC/1.0 record; response records wrap the payload
    in an HTTP/1.1 message. The round-trip twin of parse_warc_bytes."""
    block = payload
    if warc_type == "response" and http_status is not None:
        http = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {content_type or 'text/html'}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("latin-1")
        block = http + payload
    lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: {record_id}",
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    if warc_date is not None:
        lines.append(
            "WARC-Date: "
            + warc_date.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        )
    if warc_type == "response":
        lines.append("Content-Type: application/http;msgtype=response")
    lines.append(f"Content-Length: {len(block)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1")
    return head + block + b"\r\n\r\n"


def gzip_member(b: bytes) -> bytes:
    """One gzip member per record (the Common Crawl segment layout)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(b) + co.flush()


def write_warc(pages: DataFrame, out_dir: str, gzip_records: bool = True) -> None:
    """pages rows -> WARC segment files, one per partition (the crawl's
    archival write path; partition count = segment count, so repartition to
    the target segment size upstream). Executor-side only, no collect."""

    def per_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import uuid

        buf, n_rows = io.BytesIO(), 0
        for pdf in it:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                rec = encode_warc_record(
                    "response",
                    f"<urn:uuid:{uuid.uuid4()}>",
                    url,
                    ts.to_pydatetime() if ts is not None and ts == ts else None,
                    bytes(html) if html is not None else b"",
                    http_status=200,
                    content_type="text/html",
                )
                buf.write(gzip_member(rec) if gzip_records else rec)
                n_rows += 1
        if n_rows:
            os.makedirs(out_dir, exist_ok=True)
            suffix = "warc.gz" if gzip_records else "warc"
            fname = os.path.join(out_dir, f"seg-{uuid.uuid4().hex}.{suffix}")
            with open(fname, "wb") as f:
                f.write(buf.getvalue())
        yield pd.DataFrame({"records": [n_rows]})

    pages.select("url", "warc_ts", "html").mapInPandas(
        per_partition, schema="records long"
    ).count()  # force execution; counts land in the Spark UI, not the driver


def write_warc_indexed(
    pages: DataFrame, out_dir: str, gzip_records: bool = True
) -> DataFrame:
    """write_warc plus the lookup half of the archive story: returns the
    CDX-style index (the Common Crawl cdx-*.gz contract) — one row per
    archived record with (surt, warc_ts, url, file, offset, length,
    sha1) — so a reader can serve any single page with one ranged read
    of `length` bytes at `offset` (each record is its own gzip member,
    the CC segment layout, so a member decompresses standalone).

    The index is computed DURING the write (buf.tell() before/after each
    record) — no second parse pass over the segments. Executor-side only;
    the returned DataFrame IS the execution (write happens when the index
    materializes — same discipline as write_warc's forced count, but the
    side output is now the operator's value). At deployment scale the
    index lands bucketed+sorted by surt (the CDX sort key) next to the
    segments; offsets are file-local so segment relocation only rewrites
    the `file` column."""
    import hashlib

    schema = (
        "surt string, warc_ts timestamp, url string, file string, "
        "offset long, length long, sha1 string"
    )

    def per_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import uuid

        from layerg_crawler_v2_spark.functions.canon import surt as surt_fn

        buf = io.BytesIO()
        rows: list[tuple] = []
        suffix = "warc.gz" if gzip_records else "warc"
        fname = f"seg-{uuid.uuid4().hex}.{suffix}"
        for pdf in it:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                payload = bytes(html) if html is not None else b""
                rec = encode_warc_record(
                    "response",
                    f"<urn:uuid:{uuid.uuid4()}>",
                    url,
                    ts.to_pydatetime() if ts is not None and ts == ts else None,
                    payload,
                    http_status=200,
                    content_type="text/html",
                )
                off = buf.tell()
                buf.write(gzip_member(rec) if gzip_records else rec)
                rows.append(
                    (
                        surt_fn(url),
                        ts,
                        url,
                        fname,
                        off,
                        buf.tell() - off,
                        hashlib.sha1(payload).hexdigest(),
                    )
                )
        if rows:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(buf.getvalue())
        yield pd.DataFrame(
            rows,
            columns=["surt", "warc_ts", "url", "file", "offset", "length", "sha1"],
        )

    return pages.select("url", "warc_ts", "html").mapInPandas(
        per_partition, schema=schema
    )


def wet_records(records: DataFrame) -> DataFrame:
    """Successful response records → WET `conversion` records — Common
    Crawl's text sidecar derivative (the .warc.wet layout): same target
    URI and capture date, `WARC-Type: conversion`, `Content-Type:
    text/plain`, payload = the tree-extracted visible text of the HTML
    payload (functions/extract.py, the engine's byte-identical extraction
    contract), record id suffixed ':wet' so a segment can hold both.

    Completes the archive loop alongside write_warc (response segments)
    and the CDX index: crawl → WARC → {CDX for ranged replay, WET for the
    text-only consumers that never want the markup}. One Arrow pass over
    the payload column, narrow plan, no exchange — per-segment
    parallelism is inherited from the binaryFile read exactly like
    warc_to_pages."""
    from layerg_crawler_v2_spark.functions.extract import extract_text_udf

    resp = records.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("target_uri").isNotNull()
    )
    return resp.select(
        "warc_file",
        F.lit("conversion").alias("warc_type"),
        F.concat(F.col("record_id"), F.lit(":wet")).alias("record_id"),
        "target_uri",
        "warc_date",
        F.lit(None).cast("int").alias("http_status"),
        F.lit("text/plain").alias("content_type"),
        F.encode(extract_text_udf(F.col("payload")), "UTF-8").alias("payload"),
    )
