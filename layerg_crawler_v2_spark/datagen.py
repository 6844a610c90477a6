"""Deterministic synthetic `pages` table (FIXTURES.md §B1).

Two builders over the same pure per-row rules, so extraction goldens and
crawl-order goldens are identical regardless of partitioning or scale:

  * build_pages(spark, sf_dir)  — derives pages from the driver's
    documents.parquet (doc_id -> url identity, text -> html payload);
  * build_pages_synthetic(spark, n) — spark.range(n)-driven generator for
    bench-scale inputs (no external data; text synthesized from a vocab).

Analog: the reference's input is a chain it cannot control; ours is a seeded
generator so `extract(html) == text` is checkable byte-identically
(input_hint) and the link graph is reproducible. Host assignment is
log-uniform (Zipf-ish) to exercise skew handling (SURVEY.md §4 salting row).

All row work is in `mapInPandas` (Arrow batches), never per-row Python UDFs.
"""

from __future__ import annotations

import html as _htmlmod
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schema import PAGES

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_PRIMES = (7, 13, 31, 53, 97)
_VOCAB = (
    "the spark table scan join merge sort window hash filter key order batch "
    "stream row column value data query part small big slow fast dup vector agg"
).split()


def _mix(x: int) -> int:
    """splitmix64 — deterministic 64-bit mixer, no RNG state."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def n_hosts_for(n_docs: int) -> int:
    return max(4, n_docs // 40)


def host_of_doc(doc_id: int, n_docs: int) -> str:
    """Log-uniform host assignment: P(host h) ~ 1/(h+1) — a Zipf-ish skew."""
    h = n_hosts_for(n_docs)
    u = _mix(doc_id) / 2**64
    hid = min(h - 1, int(h**u) - 1 if h**u >= 1 else 0)
    return f"h{hid}.example.com"


def canonical_url(doc_id: int, n_docs: int) -> str:
    return f"http://{host_of_doc(doc_id, n_docs)}/d/{doc_id}"


def url_variant(doc_id: int, n_docs: int, variant: int) -> str:
    """Presentation variants that all canonicalize to canonical_url(doc_id).

    Exercises every RFC 3986 normalization step the canonicalizer implements
    (mirrors the reference's lowercase-before-compare discipline,
    cmd/onchain.go:98)."""
    host = host_of_doc(doc_id, n_docs)
    v = variant % 6
    if v == 0:
        return f"http://{host}/d/{doc_id}"
    if v == 1:
        return f"HTTP://{host.upper()}:80/d/{doc_id}"
    if v == 2:
        return f"http://{host}/d/{doc_id}#frag{doc_id % 7}"
    if v == 3:
        return f"http://{host}/x/../d/./{doc_id}"
    if v == 4:
        return f"http://{host}/%64/{doc_id}"  # %64 == 'd' (unreserved decode)
    return f"http://{host}./d/{doc_id}"  # trailing-dot host


def adversarial_urls() -> list[str]:
    """Already-canonical URLs with hostile shapes — '://', '?', '/' and '#'
    escapes inside query payloads (all survive canonicalize() unchanged).
    Parity tests assert the native JVM host/path expressions agree with the
    Python host_of()/path parsing on every one of these; a last-'://' split
    bug (VERDICT r1 #1) mis-buckets them onto the embedded host."""
    return [
        "http://a.com/r?next=http://b.com/x",
        "http://a.com/p?u=https://c.org/y&v=1",
        "http://a.com:8080/r?next=http://b.com/x",
        "http://a.com/p?u=http://b.com",
        "http://h0.example.com/d/1?ref=http://h9.example.com/d/2",
        "http://a.com/q?path=/slash/deep/path",
        "http://a.com/q?frag=%23notfrag",
        "http://a.com/",
        "http://a.com/deep/path/x?a=://&z=9",
    ]


def outlink_doc_ids(doc_id: int, n_docs: int) -> list[int]:
    """2-5 deterministic outlinks; doc 0 is a hub target (many in-links)."""
    if n_docs <= 1:
        return []
    k = 2 + _mix(doc_id * 3 + 7) % 4
    out = []
    for i in range(k):
        t = (doc_id * _PRIMES[i] + i * i + 1) % n_docs
        if t != doc_id and t not in out:
            out.append(t)
    return out


def render_html(doc_id: int, n_docs: int, text: str) -> bytes:
    """Structural tags with zero inter-tag whitespace => exact extraction."""
    links = "".join(
        f'<a href="{_htmlmod.escape(url_variant(t, n_docs, (t * 3 + 1) % 6))}">'
        f"l{i}</a>"
        for i, t in enumerate(outlink_doc_ids(doc_id, n_docs))
    )
    body = _htmlmod.escape(text if text is not None else "", quote=False)
    page = (
        f"<html><head><title>doc {doc_id}</title></head>"
        f"<body><nav>{links}</nav><main>{body}</main></body></html>"
    )
    return page.encode("utf-8")


def _pages_batch(doc_ids: pd.Series, texts: pd.Series, langs: pd.Series, n_docs: int) -> pd.DataFrame:
    urls, tss, htmls = [], [], []
    for did, txt in zip(doc_ids, texts):
        did = int(did)
        urls.append(url_variant(did, n_docs, did % 6))
        tss.append(_EPOCH + pd.Timedelta(seconds=did))
        htmls.append(render_html(did, n_docs, txt))
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": tss,
            "html": htmls,
            "text": texts.fillna("").values,
            "lang": langs.values,
        }
    )


def build_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pages derived deterministically from the driver documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _pages_batch(b["doc_id"], b["text"], b["lang"], n_docs)

    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES)


def synth_text(doc_id: int) -> str:
    n = 5 + _mix(doc_id + 11) % 60
    words = [_VOCAB[_mix(doc_id * 131 + i) % len(_VOCAB)] for i in range(n)]
    return " ".join(words)


def build_pages_synthetic(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Bench-scale pages: same identity/render rules, text from a seeded vocab."""
    rng = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"]
            texts = pd.Series([synth_text(int(i)) for i in ids])
            langs = pd.Series(
                [("en", "de", "vi", "zh")[_mix(int(i) + 5) % 4] for i in ids]
            )
            yield _pages_batch(ids, texts, langs, n_docs)

    return rng.mapInPandas(gen, schema=PAGES)


def seed_urls(n_docs: int, n_seeds: int = 5) -> list[str]:
    """Seed list: raw-variant URLs of the first n_seeds docs (subgraph.yaml
    datasources analog — fixed start points, reference subgraph.yaml:11-51)."""
    return [url_variant(i, n_docs, (i + 2) % 6) for i in range(min(n_seeds, n_docs))]


def seed_df(spark: SparkSession, n_docs: int, n_seeds: int, partitions: int | None = None) -> DataFrame:
    """Distributed seed table (`raw_url`) — same rows as seed_urls(), built
    executor-side. At 10^10-URL scale seed lists are tables, not driver lists."""
    n = min(n_seeds, n_docs)
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {"raw_url": [url_variant(int(i), n_docs, (int(i) + 2) % 6) for i in b["id"]]}
            )

    return rng.mapInPandas(gen, schema="raw_url string")
