"""Content-type sniffing from magic bytes — the WARC-pipeline gate that
routes a fetched payload to the right decoder (html -> extract, image ->
multimodal, gzip -> decompress, everything else -> skip) regardless of what
the server's Content-Type header claimed (they lie constantly; every
archive pipeline sniffs — the WHATWG MIME-sniffing standard's magic-number
core, minus the header-driven branches we have no headers for).

Pure whole-stage-codegen Column expression: ONE hex() of the first 12
bytes + a CASE chain of prefix compares — no UDF, no Python, zero cost
beyond the scan at 100 TB. HTML detection checks the document start
(optionally BOM/whitespace-led) for '<' + known tag starts, ASCII
case-insensitive, matching the sniffing standard's tag-pattern table in
spirit (a deterministic subset, documented here)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hex-prefix, mime) in match order — longest/most-specific first
_MAGIC = [
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("FFD8FF", "image/jpeg"),
    ("25504446", "application/pdf"),
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("424D", "image/bmp"),
    ("5036", "image/x-portable-pixmap"),   # 'P6'
    ("4F676753", "application/ogg"),       # 'OggS'
]


def sniff_mime(payload: Column) -> Column:
    """MIME type of a binary payload by magic bytes; text/html for
    tag-led text (optional UTF-8 BOM + ASCII whitespace, then
    '<!doctype', '<html', '<head', '<body', '<?xml' or a comment);
    'application/octet-stream' when nothing matches; NULL for NULL."""
    hx = F.upper(F.hex(F.substring(payload, 1, 12)))
    # RIFF....WEBP: bytes 1-4 and 9-12
    riff = (F.substring(hx, 1, 8) == "52494646") & (
        F.substring(hx, 17, 8) == "57454250"
    )
    # ....ftyp: bytes 5-8
    ftyp = F.substring(hx, 9, 8) == "66747970"
    # text lead: strip BOM + whitespace, lowercase, look at the tag start
    text = F.lower(
        F.regexp_replace(
            F.decode(F.substring(payload, 1, 64), "UTF-8"),
            "^[﻿\\s]+",
            "",
        )
    )
    html = (
        text.startswith("<!doctype")
        | text.startswith("<html")
        | text.startswith("<head")
        | text.startswith("<body")
        | text.startswith("<!--")
    )
    xml = text.startswith("<?xml")
    out = F.lit("application/octet-stream")
    out = F.when(xml, F.lit("application/xml")).otherwise(out)
    out = F.when(html, F.lit("text/html")).otherwise(out)
    for hex_prefix, mime in reversed(_MAGIC):
        out = F.when(
            F.substring(hx, 1, len(hex_prefix)) == hex_prefix, F.lit(mime)
        ).otherwise(out)
    out = F.when(riff, F.lit("image/webp")).otherwise(out)
    out = F.when(ftyp, F.lit("video/mp4")).otherwise(out)
    return F.when(payload.isNull(), F.lit(None).cast("string")).otherwise(
        out
    )
