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


def test_nested_same_name_drop_blocks():
    # the r1/r2 regex stage leaked "X" here (first-close stop); the tree
    # parser drops the whole nested block
    raw = b"<html><body><nav><nav>inner</nav>X</nav>kept</body></html>"
    assert extract_text(raw) == "kept"


def test_nested_mixed_drop_blocks():
    raw = b"<body><nav>a<style>p{}</style>b</nav>visible</body>"
    assert extract_text(raw) == "visible"


def test_unclosed_p_tags_keep_text():
    assert extract_text(b"<body><p>one<p>two</body>") == "onetwo"


def test_unclosed_nav_drops_to_eof():
    # browser-tree semantics: an unclosed drop block swallows the rest
    assert extract_text(b"<body>pre<nav>menu<p>item</body>") == "pre"


def test_end_tag_recovery_closes_inner_unclosed():
    # </nav> closes the nav even though the inner <p> never closed
    raw = b"<body><nav><p>menu</nav>after</body>"
    assert extract_text(raw) == "after"


def test_attribute_containing_gt():
    # the old <[^>]*> strip ended the tag at the quoted '>' and leaked 'b">'
    raw = b'<body><a title="a>b">link</a> text</body>'
    assert extract_text(raw) == "link text"


def test_drop_tag_attribute_containing_gt():
    raw = b'<body><nav data-x="1>2">menu</nav>kept</body>'
    assert extract_text(raw) == "kept"


def test_script_cdata_stops_at_first_close():
    # CDATA mode: content runs to the first </script>, like browsers
    raw = b'<body><script>var s = "x";</script>kept</body>'
    assert extract_text(raw) == "kept"


def test_bare_lt_in_text_is_data():
    # malformed '< ' is text, not a tag opener (the old regex ate to the
    # next '>')
    assert extract_text(b"<body>5 < 6 and 7 > 2</body>") == "5 < 6 and 7 > 2"


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
