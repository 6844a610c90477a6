"""Byte-identical extraction (input_hint invariant; SURVEY.md §5.3)."""

from __future__ import annotations

from layerg_crawler_v2_spark.datagen import (
    canonical_url,
    outlink_doc_ids,
    render_html,
    url_variant,
)
from layerg_crawler_v2_spark.functions.canon import canonicalize
from layerg_crawler_v2_spark.functions.extract import extract_outlinks, extract_text


def test_roundtrip_simple():
    html = render_html(3, 100, "hello world  two  spaces")
    assert extract_text(html) == "hello world  two  spaces"


def test_roundtrip_entities():
    txt = 'a & b < c > d "quotes" \'single\''
    assert extract_text(render_html(1, 10, txt)) == txt


def test_roundtrip_empty():
    assert extract_text(render_html(0, 10, "")) == ""


def test_roundtrip_whitespace_preserved():
    txt = "  leading and trailing  "
    assert extract_text(render_html(2, 10, txt)) == txt


def test_non_utf8_deterministic():
    raw = b"<html><head><t>x</t></head><body><nav></nav><main>ok\xff\xfe</main></body></html>"
    out1 = extract_text(raw)
    out2 = extract_text(raw)
    assert out1 == out2
    assert out1 == "ok��"


def test_drops_script_style_comment():
    raw = (
        b"<html><body><script>var x=1;</script><style>p{}</style>"
        b"<!-- secret -->visible</body></html>"
    )
    assert extract_text(raw) == "visible"


def test_outlinks_order_and_resolution():
    n = 100
    did = 7
    targets = outlink_doc_ids(did, n)
    links = extract_outlinks(render_html(did, n, "t"))
    assert len(links) == len(targets)
    # every raw outlink variant canonicalizes to its target's canonical url
    for raw, t in zip(links, targets):
        assert canonicalize(raw) == canonical_url(t, n)


def test_variants_all_canonicalize_same():
    n = 50
    for did in (0, 1, 5, 23, 49):
        want = canonical_url(did, n)
        for v in range(6):
            assert canonicalize(url_variant(did, n, v)) == want, (did, v)


def test_pages_table_extraction_parity(spark, sf_dir):
    """extract(html) == text for every generated page, computed in Spark."""
    import pyspark.sql.functions as F

    from layerg_crawler_v2_spark.datagen import build_pages
    from layerg_crawler_v2_spark.functions.extract import extract_text_udf

    pages = build_pages(spark, sf_dir)
    bad = pages.withColumn("ex", extract_text_udf(F.col("html"))).filter(
        ~(F.col("ex").eqNullSafe(F.col("text")))
    )
    assert bad.count() == 0
