"""WARC segment source: parse/encode round-trip + Spark read/write paths.

The engine's archival interchange (SURVEY.md §2.1 sources; sources/warc.py
module docstring for the 100 TB layout rationale).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from layerg_crawler_v2_spark.sources.warc import (
    encode_warc_record,
    gzip_member,
    parse_warc_bytes,
    read_warc,
    warc_to_pages,
    write_warc,
)

TS = datetime(2024, 3, 1, 12, 30, 0, tzinfo=timezone.utc)


def _segment(gz: bool) -> bytes:
    recs = [
        encode_warc_record(
            "warcinfo", "<urn:uuid:0>", None, TS, b"software: layerg\r\n"
        ),
        encode_warc_record(
            "response", "<urn:uuid:1>", "http://a.example.com/x", TS,
            b"<html><body>hello</body></html>", http_status=200,
        ),
        encode_warc_record(
            "request", "<urn:uuid:2>", "http://a.example.com/x", TS,
            b"GET /x HTTP/1.1\r\n\r\n",
        ),
        encode_warc_record(
            "response", "<urn:uuid:3>", "http://b.example.com/y", TS,
            b"gone", http_status=404, content_type="text/plain",
        ),
    ]
    if gz:
        return b"".join(gzip_member(r) for r in recs)
    return b"".join(recs)


@pytest.mark.parametrize("gz", [False, True])
def test_parse_roundtrip_plain_and_gzip(gz):
    rows = list(parse_warc_bytes("seg-0", _segment(gz)))
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "response", "request", "response",
    ]
    ok = rows[1]
    assert ok["target_uri"] == "http://a.example.com/x"
    assert ok["http_status"] == 200
    assert ok["content_type"] == "text/html"
    assert ok["payload"] == b"<html><body>hello</body></html>"
    assert ok["warc_date"] == TS
    assert rows[3]["http_status"] == 404
    # non-response blocks pass through unsplit
    assert rows[2]["payload"].startswith(b"GET /x")


def test_parse_whole_file_gzip_and_padding():
    # whole-file gzip (wget --warc layout) and stray blank lines between
    # records both decode to the same rows
    import zlib

    plain = _segment(gz=False).replace(b"\r\n\r\nWARC/", b"\r\n\r\n\r\nWARC/")
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    whole = co.compress(plain) + co.flush()
    rows = list(parse_warc_bytes("seg", whole))
    assert len(rows) == 4 and rows[1]["http_status"] == 200


def test_parse_stops_cleanly_on_malformed_length():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zz\r\n\r\nxxxx"
    )
    assert list(parse_warc_bytes("seg", _segment(False) + bad)) == list(
        parse_warc_bytes("seg", _segment(False))
    )


def test_spark_write_read_pages_roundtrip(spark, tmp_path):
    """pages -> WARC segments on disk -> records -> pages: url/ts/html
    identical; non-200 and non-response records filtered by warc_to_pages."""
    from layerg_crawler_v2_spark.datagen import build_pages_synthetic

    pages = build_pages_synthetic(spark, 40, partitions=3).cache()
    out = str(tmp_path / "segments")
    write_warc(pages, out, gzip_records=True)

    recs = read_warc(spark, out)
    got = warc_to_pages(recs)
    a = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in pages.select("url", "warc_ts", "html").collect()
    )
    b = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"])) for r in got.collect()
    )
    assert a == b
    # record rows carry provenance: every row names its segment file
    assert recs.where("warc_file IS NULL OR warc_file = ''").count() == 0
    pages.unpersist()


def test_cdx_index_ranged_read_roundtrip(spark, tmp_path):
    """Every index row must serve its page with ONE ranged read: open
    file, seek offset, read length bytes, gunzip the standalone member,
    parse, and get back exactly that url's payload (sha1 double-checks).
    This is the Common Crawl cdx contract the index exists for."""
    import gzip
    import hashlib
    import os

    from layerg_crawler_v2_spark.datagen import build_pages_synthetic
    from layerg_crawler_v2_spark.functions.canon import surt as surt_fn
    from layerg_crawler_v2_spark.sources.warc import (
        parse_warc_bytes,
        write_warc_indexed,
    )

    pages = build_pages_synthetic(spark, 30, partitions=3).cache()
    out = str(tmp_path / "segments")
    idx = write_warc_indexed(pages, out, gzip_records=True).collect()
    orig = {
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
    }
    assert len(idx) == len(orig)
    for row in idx:
        with open(os.path.join(out, row["file"]), "rb") as f:
            f.seek(row["offset"])
            member = f.read(row["length"])
        rec = next(parse_warc_bytes(row["file"], gzip.decompress(member)))
        assert rec["target_uri"] == row["url"]
        payload = bytes(rec["payload"])
        assert payload == orig[row["url"]]
        assert hashlib.sha1(payload).hexdigest() == row["sha1"]
        assert row["surt"] == surt_fn(row["url"])
    # offsets tile each file exactly: sorted offsets + lengths are contiguous
    by_file: dict[str, list] = {}
    for row in idx:
        by_file.setdefault(row["file"], []).append((row["offset"], row["length"]))
    for fname, spans in by_file.items():
        spans.sort()
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln
        assert pos == os.path.getsize(os.path.join(out, fname))
    pages.unpersist()


def test_wet_conversion_records_roundtrip(spark, tmp_path):
    """pages -> WARC on disk -> records -> WET conversion rows: payload is
    the tree-extracted text of the archived html (the engine's extraction
    contract), type/content-type/id follow the .wet layout, and an encoded
    conversion record survives parse_warc_bytes."""
    from layerg_crawler_v2_spark.datagen import build_pages_synthetic
    from layerg_crawler_v2_spark.functions.extract import extract_text
    from layerg_crawler_v2_spark.sources.warc import wet_records

    pages = build_pages_synthetic(spark, 25, partitions=2).cache()
    out = str(tmp_path / "segments")
    write_warc(pages, out, gzip_records=True)
    recs = read_warc(spark, out)
    wet = wet_records(recs)
    want = {
        r["url"]: extract_text(bytes(r["html"]))
        for r in pages.select("url", "html").collect()
    }
    got = {
        r["target_uri"]: bytes(r["payload"]).decode()
        for r in wet.collect()
    }
    assert got == want
    row = wet.limit(1).collect()[0]
    assert row["warc_type"] == "conversion"
    assert row["content_type"] == "text/plain"
    assert row["record_id"].endswith(":wet")
    # encode/parse round trip for a conversion record
    raw = encode_warc_record(
        "conversion", row["record_id"], row["target_uri"],
        row["warc_date"], bytes(row["payload"]),
        content_type="text/plain",
    )
    rec = next(parse_warc_bytes("seg", raw))
    assert rec["warc_type"] == "conversion"
    assert bytes(rec["payload"]) == bytes(row["payload"])
    pages.unpersist()
