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


# ---- tree-consistent outlink extraction (VERDICT r3 missing #1) ------------

def _parser_only_outlinks(html: bytes) -> list[str]:
    from layerg_crawler_v2_spark.functions.extract import _OutlinkExtractor

    p = _OutlinkExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return p.hrefs


def test_outlinks_skip_script_and_comment_contexts():
    raw = (
        b'<body><script>var s="<a href=\'http://evil/\'>";</script>'
        b'<!-- <a href="http://hidden/"> -->'
        b'<a href="http://ok/">x</a></body>'
    )
    assert extract_outlinks(raw) == ["http://ok/"]


def test_outlinks_keep_nav_and_head_links():
    """Deliberate drop-set asymmetry vs text extraction: nav/head anchors
    are real DOM links a crawler follows (the generator corpus emits its
    link block inside <nav>); only non-DOM contexts hide links."""
    assert extract_outlinks(
        b"<body><nav><a href=\"http://nav-link/\">n</a></nav></body>"
    ) == ["http://nav-link/"]
    assert extract_outlinks(
        b"<head><a href=\"http://head-link/\">h</a></head>"
    ) == ["http://head-link/"]


def test_outlinks_unquoted_href():
    # the r1-r3 regex required quotes; the tree parser accepts the HTML
    # unquoted-attribute grammar
    assert extract_outlinks(b"<body><a href=http://unquoted/>x</a></body>") == [
        "http://unquoted/"
    ]


def test_outlinks_attr_containing_gt_before_href():
    raw = b'<body><a title="a>b" href="http://after-gt/">x</a></body>'
    assert extract_outlinks(raw) == ["http://after-gt/"]


def test_outlinks_entity_in_value_unescaped_once():
    # HTML attribute grammar: &amp; in a value means '&'
    raw = b'<body><a href="http://a/?x=1&amp;y=2">x</a></body>'
    assert extract_outlinks(raw) == ["http://a/?x=1&y=2"]


def test_outlinks_bare_href_and_truncated_tag():
    assert extract_outlinks(
        b'<body><a href>bare</a><a href="http://v/">x</a></body>'
    ) == ["http://v/"]
    # doc truncated inside an open tag: parser semantics (dropped), and the
    # fast path must not fire
    raw = b'<body><a href="http://trunc'
    assert extract_outlinks(raw) == _parser_only_outlinks(raw)


def test_outlinks_enclosing_tag_swallow():
    # an <a href> inside another tag's (malformed) attribute value is NOT a
    # DOM link; the <[^>]*< risky check routes this to the parser
    raw = (
        b'<body><div title=<a href="http://swallow/">>'
        b'<a href="http://real/">x</a></body>'
    )
    assert extract_outlinks(raw) == _parser_only_outlinks(raw)


def test_generator_corpus_is_fast_eligible_and_unchanged():
    """The generator emits quoted entity-free hrefs in '>'-terminated tags
    with no script/comment constructs, so the fast path fires on every doc
    and the crawl-order goldens are unchanged by the tree-consistency fix."""
    from layerg_crawler_v2_spark.datagen import synth_text
    from layerg_crawler_v2_spark.functions.extract import (
        _FAST_HREF_RE,
        _RISKY_RE,
    )

    for i in range(300):
        doc = render_html(i, 10000, synth_text(i))
        assert _RISKY_RE.search(doc) is None, i
        assert len(_FAST_HREF_RE.findall(doc)) == doc.lower().count(b"href"), i
        assert extract_outlinks(doc) == _parser_only_outlinks(doc), i


def test_outlinks_fast_path_fuzz_matches_parser():
    """Property: the gated extractor is byte-identical to a pure html.parser
    pass on arbitrary tag soup (the fast path only fires when provably
    equivalent). Seeded, deterministic."""
    import random

    rng = random.Random(20240817)
    alph = [
        "<a ", "href", "=", '"', "'", ">", "<", " ", "x", "/", "&amp;", "&",
        "<script>", "</script>", "<!--", "-->", "<nav>", "</nav>", "HREF",
        "<a\n", "</a>", "=y", "<![CDATA[", "]]>", "<?", "<!", "b",
    ]
    for _ in range(4000):
        s = "".join(
            rng.choice(alph) for _ in range(rng.randint(1, 25))
        ).encode()
        assert extract_outlinks(s) == _parser_only_outlinks(s), s


# --- charset sniffing --------------------------------------------------------

def test_sniff_bom_wins_over_meta():
    from layerg_crawler_v2_spark.functions.extract import sniff_charset

    body = b'<meta charset="windows-1252">x'
    assert sniff_charset(b"\xef\xbb\xbf" + body) == "utf-8-sig"
    assert sniff_charset(b"\xff\xfe" + body) == "utf-16-le"
    assert sniff_charset(b"\xfe\xff" + body) == "utf-16-be"


def test_sniff_meta_charset_variants():
    from layerg_crawler_v2_spark.functions.extract import sniff_charset

    assert sniff_charset(b'<meta charset="Windows-1252">') == "windows-1252"
    assert sniff_charset(b"<meta charset='koi8-r'>") == "koi8-r"
    assert sniff_charset(b"<META CHARSET=KOI8-R>") == "koi8-r"  # unquoted+CI
    assert (
        sniff_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=iso-8859-1">'
        )
        == "windows-1252"  # HTML-standard latin-1 -> cp1252
    )
    assert sniff_charset(b'<meta charset="utf-16le">') == "utf-8"  # WHATWG quirk
    assert sniff_charset(b'<meta charset="no-such-enc">') == "utf-8"
    assert sniff_charset(b"no declaration at all") == "utf-8"
    assert sniff_charset(b"") == "utf-8"
    # declaration outside the first 1024 bytes is ignored
    assert sniff_charset(b" " * 1024 + b'<meta charset="koi8-r">') == "utf-8"


def test_decode_html_cp1252_and_utf16():
    from layerg_crawler_v2_spark.functions.extract import decode_html

    cp = '<meta charset="windows-1252"><p>café — naïve</p>'.encode(
        "windows-1252"
    )
    assert decode_html(cp) == '<meta charset="windows-1252"><p>café — naïve</p>'
    u16 = b"\xff\xfe" + "<p>héllo</p>".encode("utf-16-le")
    assert decode_html(u16) == "<p>héllo</p>"
    assert decode_html(None) is None


def test_decode_html_udf_batch(spark):
    from layerg_crawler_v2_spark.functions.extract import (
        decode_html_udf,
        sniff_charset_udf,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, '<meta charset="windows-1252">café'.encode("windows-1252")),
        (2, "plain utf-8 é".encode("utf-8")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {
        r["id"]: (r["cs"], r["txt"])
        for r in df.select(
            "id",
            sniff_charset_udf(F.col("html")).alias("cs"),
            decode_html_udf(F.col("html")).alias("txt"),
        ).collect()
    }
    assert got[1] == ("windows-1252", '<meta charset="windows-1252">café')
    assert got[2] == ("utf-8", "plain utf-8 é")
    assert got[3] == (None, None)


# --- anchor-text extraction (r4s3) ------------------------------------------


def test_anchors_basic_pairs():
    from layerg_crawler_v2_spark.functions.extract import extract_anchors

    html = b'<p><a href="/a">First  Link</a> mid <a href="/b">b</a></p>'
    assert extract_anchors(html) == [("/a", "First Link"), ("/b", "b")]


def test_anchors_whitespace_collapsed_and_nested_tags():
    from layerg_crawler_v2_spark.functions.extract import extract_anchors

    html = b'<a href="/x"> hello <b>bold\n world </b> </a>'
    assert extract_anchors(html) == [("/x", "hello bold world")]


def test_anchors_nested_a_auto_closes():
    from layerg_crawler_v2_spark.functions.extract import extract_anchors

    # browser rule: the inner <a> implicitly closes the outer one
    html = b'<a href="/outer">out<a href="/inner">in</a>tail</a>'
    assert extract_anchors(html) == [("/outer", "out"), ("/inner", "in")]


def test_anchors_skip_script_comment_and_unclosed_trailing():
    from layerg_crawler_v2_spark.functions.extract import extract_anchors

    html = (
        b'<script>var s = \'<a href="/fake">x</a>\';</script>'
        b'<!-- <a href="/ghost">g</a> -->'
        b'<a href="/real">kept'
    )
    assert extract_anchors(html) == [("/real", "kept")]


def test_anchors_empty_and_none():
    from layerg_crawler_v2_spark.functions.extract import extract_anchors

    assert extract_anchors(None) == []
    assert extract_anchors(b"<p>no links</p>") == []
    assert extract_anchors(b'<a href="/e"></a>') == [("/e", "")]


def test_anchors_agree_with_outlinks_on_generator_corpus(spark, sf_dir):
    """The href sequence of extract_anchors must equal extract_outlinks
    on every generator page (same DOM discipline, two extractors)."""
    from layerg_crawler_v2_spark.datagen import build_pages
    from layerg_crawler_v2_spark.functions.extract import (
        extract_anchors,
        extract_outlinks,
    )

    for row in build_pages(spark, sf_dir).select("html").limit(200).collect():
        h = row["html"]
        assert [a for a, _ in extract_anchors(h)] == extract_outlinks(h)


# --- rel=canonical -----------------------------------------------------------

def test_canonical_basic_and_none():
    from layerg_crawler_v2_spark.functions.extract import extract_canonical

    assert extract_canonical(None) is None
    assert extract_canonical(b"<p>no head</p>") is None
    assert (
        extract_canonical(
            b'<head><link rel="canonical" href="https://e.x/p"/></head>'
        )
        == "https://e.x/p"
    )


def test_canonical_first_wins_and_token_matching():
    from layerg_crawler_v2_spark.functions.extract import extract_canonical

    two = (
        b'<link rel="canonical" href="/first">'
        b'<link rel="canonical" href="/second">'
    )
    assert extract_canonical(two) == "/first"
    # token-based, case-insensitive rel; unquoted href; attr order free
    assert (
        extract_canonical(b"<link href=/u rel='Alternate CANONICAL'>") == "/u"
    )
    # 'canonical' must be a whole rel token
    assert extract_canonical(b'<link rel="noncanonical" href="/x">') is None


def test_canonical_non_dom_contexts_ignored():
    from layerg_crawler_v2_spark.functions.extract import extract_canonical

    assert (
        extract_canonical(
            b'<!-- <link rel="canonical" href="/ghost"> -->'
            b'<script>var s = \'<link rel="canonical" href="/js">\';</script>'
            b'<link rel="canonical" href="/real">'
        )
        == "/real"
    )
    # comment/script only: nothing found
    assert (
        extract_canonical(
            b'<!-- <link rel="canonical" href="/ghost"> -->'
        )
        is None
    )


def test_canonical_missing_href_or_rel():
    from layerg_crawler_v2_spark.functions.extract import extract_canonical

    assert extract_canonical(b'<link rel="canonical">') is None
    assert extract_canonical(b'<link href="/h">') is None
    # duplicate attribute: first wins
    assert (
        extract_canonical(b'<link rel="canonical" href="/a" href="/b">')
        == "/a"
    )


def test_canonical_entity_encoded_rel_survives_cheap_reject():
    from layerg_crawler_v2_spark.functions.extract import extract_canonical

    # 'canonical' hidden behind a charref in the rel VALUE: values decode
    # (names don't), so the fast reject must not fire on the missing
    # literal token when an '&' could be hiding it
    assert (
        extract_canonical(b'<link rel="can&#111;nical" href="/e">') == "/e"
    )
    # and a page with no <link> tag at all rejects exactly
    assert extract_canonical(b'<a href="/x">canonical &amp; more</a>') is None


# --- hreflang alternates -----------------------------------------------------

def test_hreflang_pairs_in_order():
    from layerg_crawler_v2_spark.functions.extract import extract_hreflang

    html = (
        b'<head><link rel="alternate" hreflang="en" href="/en">'
        b'<link rel="alternate" hreflang="de-AT" href="/de?x=1"/>'
        b'<link rel="canonical" href="/c">'  # no hreflang: not an alternate
        b'<link rel="stylesheet" hreflang="fr" href="/css"></head>'
    )
    assert extract_hreflang(html) == [("en", "/en"), ("de-AT", "/de?x=1")]


def test_hreflang_rejects_and_non_dom():
    from layerg_crawler_v2_spark.functions.extract import extract_hreflang

    assert extract_hreflang(None) == []
    assert extract_hreflang(b"<p>hreflang text but no link tag</p>") == []
    assert (
        extract_hreflang(
            b'<!-- <link rel="alternate" hreflang="en" href="/ghost"> -->'
            b'<link rel="ALTERNATE stylesheet" hreflang="en" href="/ok">'
        )
        == [("en", "/ok")]
    )


# --- title / meta description / og:title -------------------------------------

def test_title_meta_basic_triple():
    from layerg_crawler_v2_spark.functions.extract import extract_title_meta

    html = (
        b"<html><head><title>Doc 7</title>"
        b'<meta name="description" content="a page">'
        b'<meta property="og:title" content="Doc 7 og">'
        b"</head><body>x</body></html>"
    )
    assert extract_title_meta(html) == ("Doc 7", "a page", "Doc 7 og")


def test_title_meta_first_wins_and_case_insensitive_values():
    from layerg_crawler_v2_spark.functions.extract import extract_title_meta

    html = (
        b"<title>first</title><title>second</title>"
        b'<meta name="Description" content="d1">'
        b'<meta name="DESCRIPTION" content="d2">'
        b'<meta property="OG:Title" content="o1">'
        b'<meta property="og:title" content="o2">'
    )
    assert extract_title_meta(html) == ("first", "d1", "o1")


def test_title_entities_nested_tags_and_unclosed():
    from layerg_crawler_v2_spark.functions.extract import extract_title_meta

    # charrefs decode once; a nested tag inside <title> emits a starttag
    # event so its markup is not part of the text (module tree discipline)
    assert extract_title_meta(b"<title>A &amp; B</title>") == (
        "A & B", None, None,
    )
    assert extract_title_meta(b"<title>A <b>bold</b> B</title>") == (
        "A bold B", None, None,
    )
    # unclosed <title>: RCDATA to EOF (WHATWG tokenizer rule)
    assert extract_title_meta(b"<head><title>to the end") == (
        "to the end", None, None,
    )


def test_title_meta_non_dom_and_rejects():
    from layerg_crawler_v2_spark.functions.extract import extract_title_meta

    assert extract_title_meta(None) == (None, None, None)
    # cheap reject path: no literal '<title'/'<meta' token
    assert extract_title_meta(b"<p>title meta words only</p>") == (
        None, None, None,
    )
    # comments and script CDATA produce no starttag/data events
    html = (
        b"<!-- <title>ghost</title> -->"
        b'<script>document.title = "<title>js</title>"</script>'
        b"<title>real</title>"
        b'<meta name="description">'  # no content attr: ignored
    )
    assert extract_title_meta(html) == ("real", None, None)


def test_title_meta_udf_batch(spark):
    import pyspark.sql.functions as F

    from layerg_crawler_v2_spark.functions.extract import (
        extract_title_meta, extract_title_meta_udf,
    )

    rows = [
        b"<title>t1</title>",
        None,
        b'<meta property="og:title" content="o3">',
        b"<body>none</body>",
    ]
    df = spark.createDataFrame([(r,) for r in rows], "html binary")
    got = [
        (r.m.title, r.m.description, r.m.og_title)
        for r in df.select(
            extract_title_meta_udf("html").alias("m")
        ).collect()
    ]
    want = [
        (None, None, None) if r is None else extract_title_meta(r)
        for r in rows
    ]
    assert got == want


def test_jsonld_basic_and_order():
    from layerg_crawler_v2_spark.functions.extract import extract_jsonld

    html = (
        b'<html><head>'
        b'<script type="application/ld+json">{"@type":"Article","name":"a"}</script>'
        b'<script type="text/javascript">var x = 1;</script>'
        b'<script type="APPLICATION/LD+JSON; charset=utf-8"> {"@type":"Person"} </script>'
        b'</head><body></body></html>'
    )
    assert extract_jsonld(html) == [
        '{"@type":"Article","name":"a"}',
        '{"@type":"Person"}',
    ]


def test_jsonld_non_dom_unclosed_and_rejects():
    from layerg_crawler_v2_spark.functions.extract import extract_jsonld

    assert extract_jsonld(None) == []
    # cheap reject: no literal '<script'
    assert extract_jsonld(b"<p>application/ld+json words</p>") == []
    # comment-wrapped block produces no starttag events
    assert extract_jsonld(
        b'<!-- <script type="application/ld+json">{"ghost":1}</script> -->'
    ) == []
    # plain script payload MENTIONING ld+json is not a block
    assert extract_jsonld(
        b'<script>fetch("x", {type: "application/ld+json"})</script>'
    ) == []
    # unclosed matching block runs to EOF (CDATA-to-EOF)
    assert extract_jsonld(
        b'<script type="application/ld+json">{"tail":true}'
    ) == ['{"tail":true}']
    # charrefs inside script CDATA stay LITERAL (no entity decode)
    assert extract_jsonld(
        b'<script type="application/ld+json">{"amp":"&amp;"}</script>'
    ) == ['{"amp":"&amp;"}']


def test_jsonld_entity_encoded_type_survives_cheap_reject():
    from layerg_crawler_v2_spark.functions.extract import extract_jsonld

    # 'ld+json' hidden behind a charref in the type VALUE: the '&' guard
    # must keep this out of the cheap-reject path, and convert_charrefs
    # decodes attribute values so the MIME match still fires
    html = b'<script type="application/ld&plus;json">{"v":1}</script>'
    assert extract_jsonld(html) == ['{"v":1}']


def test_jsonld_udf_batch(spark):
    from layerg_crawler_v2_spark.functions.extract import (
        extract_jsonld, extract_jsonld_udf,
    )

    rows = [
        b'<script type="application/ld+json">{"a":1}</script>',
        None,
        b"<body>none</body>",
        b'<script type="application/ld+json">A</script>'
        b'<script type="application/ld+json">B</script>',
    ]
    df = spark.createDataFrame([(r,) for r in rows], "html binary")
    got = [r.b for r in df.select(extract_jsonld_udf("html").alias("b")).collect()]
    # na_action='ignore' passes nulls through: NULL html -> NULL array
    # (the extract_outlinks_udf convention), not an empty array
    want = [None if r is None else extract_jsonld(r) for r in rows]
    assert got == want


def test_tables_basic_grid_and_entities():
    from layerg_crawler_v2_spark.functions.extract import extract_tables

    html = (
        b"<table><tr><th>id</th><th>name</th></tr>"
        b"<tr><td>1</td><td>a &amp; b</td></tr>"
        b"<tr><td>2</td><td>c</td></tr></table>"
    )
    assert extract_tables(html) == [
        [["id", "name"], ["1", "a & b"], ["2", "c"]],
    ]


def test_tables_omitted_end_tags():
    from layerg_crawler_v2_spark.functions.extract import extract_tables

    # spec-legal omitted </td>/</tr>: new cell closes the open cell, new
    # row closes the open row, </table> closes both
    html = b"<table><tr><td>a<td>b<tr><td>c</table>"
    assert extract_tables(html) == [[["a", "b"], ["c"]]]
    # cell without a tr implies the row
    html2 = b"<table><td>x<td>y</table>"
    assert extract_tables(html2) == [[["x", "y"]]]


def test_tables_nested_and_document_order():
    from layerg_crawler_v2_spark.functions.extract import extract_tables

    html = (
        b"<table><tr><td>outer"
        b"<table><tr><td>inner</td></tr></table>"
        b"</td><td>after</td></tr></table>"
        b"<table><tr><td>second</td></tr></table>"
    )
    got = extract_tables(html)
    # table_idx by START order: outer(0), inner(1), second(2)
    assert got == [
        [["outer", "after"]],
        [["inner"]],
        [["second"]],
    ]


def test_tables_non_dom_unclosed_and_drops():
    from layerg_crawler_v2_spark.functions.extract import extract_tables

    assert extract_tables(None) == []
    assert extract_tables(b"<p>table words</p>") == []
    # comment-wrapped table invisible
    assert extract_tables(b"<!-- <table><tr><td>x</td></tr></table> -->") == []
    # script payload inside a cell is dropped; unclosed table runs to EOF
    html = b"<table><tr><td>keep<script>drop()</script>"
    assert extract_tables(html) == [[["keep"]]]
    # data between rows (foster-parenting case) is ignored
    assert extract_tables(b"<table>stray<tr>more<td>x</td></tr></table>") == [
        [["x"]],
    ]


def test_tables_udf_batch(spark):
    from layerg_crawler_v2_spark.functions.extract import (
        extract_tables, extract_tables_udf,
    )

    rows = [
        b"<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>",
        None,
        b"<body>none</body>",
        b"<table><td>1</table><table><td>2</table>",
    ]
    df = spark.createDataFrame([(r,) for r in rows], "html binary")
    got = [r.t for r in df.select(extract_tables_udf("html").alias("t")).collect()]
    for r, g in zip(rows, got):
        if r is None:
            assert g is None
            continue
        want = [
            (ti, ri, cells)
            for ti, rws in enumerate(extract_tables(r))
            for ri, cells in enumerate(rws)
        ]
        assert [(x.table_idx, x.row_idx, list(x.cells)) for x in g] == want


# ---------------------------------------------------------------------------
# Microdata (itemscope/itemprop)
# ---------------------------------------------------------------------------

from layerg_crawler_v2_spark.functions.extract import extract_microdata


def test_microdata_value_algorithm_per_element():
    h = (b'<div itemscope itemtype="https://schema.org/Article extra">'
         b'<span itemprop="name headline">Hello &amp; World</span>'
         b'<a itemprop="url" href="https://ex.test/a">anchor text ignored</a>'
         b'<img itemprop="image" src="https://ex.test/i.png">'
         b'<time itemprop="published" datetime="2026-01-02">Jan 2</time>'
         b'<time itemprop="modified">Jan 3</time>'
         b'<meta itemprop="words" content="123">'
         b'<data itemprop="rank" value="7">seven</data>'
         b'</div>')
    assert extract_microdata(h) == [
        (0, "https://schema.org/Article", "name", "Hello & World"),
        (0, "https://schema.org/Article", "headline", "Hello & World"),
        (0, "https://schema.org/Article", "url", "https://ex.test/a"),
        (0, "https://schema.org/Article", "image", "https://ex.test/i.png"),
        (0, "https://schema.org/Article", "published", "2026-01-02"),
        (0, "https://schema.org/Article", "modified", "Jan 3"),
        (0, "https://schema.org/Article", "words", "123"),
        (0, "https://schema.org/Article", "rank", "7"),
    ]


def test_microdata_nested_item_pointer_and_start_order():
    h = (b'<div itemscope itemtype="T0">'
         b'<div itemprop="author" itemscope itemtype="T1">'
         b'<span itemprop="name">Ann</span></div>'
         b'<span itemprop="after">tail</span></div>'
         b'<div itemscope itemtype="T2"><span itemprop="x">y</span></div>')
    assert extract_microdata(h) == [
        (0, "T0", "author", "#item1"),
        (1, "T1", "name", "Ann"),
        (0, "T0", "after", "tail"),
        (2, "T2", "x", "y"),
    ]


def test_microdata_noise_invisible_and_orphans_dropped():
    h = (b'<!-- <div itemscope><span itemprop="ghost">no</span></div> -->'
         b'<script>var s = \'<span itemprop="fake">no</span>\';</script>'
         b'<span itemprop="orphan">no enclosing itemscope</span>'
         b'<div itemscope itemtype="T"><span itemprop="ok">v'
         b'<script>dropped()</script>isible</span></div>')
    assert extract_microdata(h) == [(0, "T", "ok", "visible")]


def test_microdata_unclosed_to_eof_and_empty_values():
    h = (b'<div itemscope><a itemprop="u">no href</a>'
         b'<meta itemprop="m"><b itemprop="t">to eof')
    assert extract_microdata(h) == [
        (0, "", "u", ""),
        (0, "", "m", ""),
        (0, "", "t", "to eof"),
    ]


def test_microdata_total_on_soup():
    import random

    rng = random.Random(9)
    frags = [b"<div itemscope", b" itemprop='x'>", b"</div>", b"<span",
             b"itemtype=", b"&amp;", b"<!--", b"-->", b"<script>", b"\xff\xfe",
             b"</script>", b"text", b"<time datetime='d'", b"<td>", b"='"]
    for _ in range(300):
        soup = b"".join(rng.choice(frags) for _ in range(rng.randint(0, 30)))
        out = extract_microdata(soup)
        assert isinstance(out, list)
        for item, itype, prop, val in out:
            assert isinstance(item, int) and item >= 0
            assert isinstance(prop, str) and prop


# ---------------------------------------------------------------------------
# Meta robots (page-level directives)
# ---------------------------------------------------------------------------

from layerg_crawler_v2_spark.functions.extract import extract_meta_robots


def test_meta_robots_union_and_none_alias():
    assert extract_meta_robots(
        b'<meta name="robots" content="noindex, nofollow">'
    ) == (True, True, False)
    assert extract_meta_robots(
        b'<meta name="robots" content="none">'
    ) == (True, True, False)
    # multiple tags UNION (most restrictive wins), spec rule
    assert extract_meta_robots(
        b'<meta name="robots" content="noindex">'
        b'<meta name="robots" content="NOARCHIVE">'
    ) == (True, False, True)


def test_meta_robots_case_trim_and_specific_bots_ignored():
    assert extract_meta_robots(
        b'<meta name="ROBOTS" content=" Noindex ">'
    ) == (True, False, False)
    assert extract_meta_robots(
        b'<meta name="googlebot" content="noindex">'
    ) == (False, False, False)


def test_meta_robots_noise_invisible_and_total():
    assert extract_meta_robots(
        b'<!-- <meta name="robots" content="noindex"> -->'
        b'<script>s="<meta name=robots content=nofollow>"</script>'
    ) == (False, False, False)
    assert extract_meta_robots(b"") == (False, False, False)
    assert extract_meta_robots(None) == (False, False, False)
    assert extract_meta_robots(b"\xff\xfe<meta") == (False, False, False)


def test_meta_robots_composes_with_outlinks_for_frontier(spark):
    """nofollow enforcement as a composition of public pieces: outlinks of
    pages whose meta robots says nofollow never reach the frontier; noindex
    pages still CONTRIBUTE links (the spec's separation of the two bits)."""
    from pyspark.sql import functions as F

    from layerg_crawler_v2_spark.functions.extract import (
        extract_meta_robots,
        extract_meta_robots_udf,
        extract_outlinks,
        extract_outlinks_udf,
    )

    def page(i, directives):
        meta = (
            f'<meta name="robots" content="{directives}">' if directives else ""
        )
        return (
            f"u{i}",
            (
                f"<html><head>{meta}</head><body>"
                f'<a href="https://t.test/{i}a">x</a>'
                f'<a href="https://t.test/{i}b">y</a></body></html>'
            ).encode(),
        )

    rows = [
        page(0, "nofollow"),
        page(1, "noindex"),
        page(2, "none"),
        page(3, ""),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = sorted(
        r["out"]
        for r in pages.select(
            "url",
            extract_meta_robots_udf("html").alias("f"),
            extract_outlinks_udf("html").alias("links"),
        )
        .filter(~F.col("f.nofollow"))
        .select(F.explode("links").alias("out"))
        .collect()
    )
    want = sorted(
        o
        for _, h in rows
        if not extract_meta_robots(h)[1]
        for o in extract_outlinks(h)
    )
    assert got == want
    assert got == [f"https://t.test/{i}{s}" for i in (1, 3) for s in "ab"]


# --------------------------------------------------------------------------
# publication-date extraction
# --------------------------------------------------------------------------

class TestPubDate:
    def _d(self, html, url=None):
        from layerg_crawler_v2_spark.functions.extract import extract_pub_date

        return extract_pub_date(
            html.encode() if isinstance(html, str) else html, url
        )

    def test_precedence_ladder(self):
        html = (
            '<meta name="date" content="2020-01-02">'
            '<meta property="article:published_time" content="2021-02-03">'
            '<time datetime="2022-03-04">x</time>'
        )
        assert self._d(html) == ("2021-02-03", "og")
        html2 = (
            '<meta name="dc.date" content="2020-01-02">'
            '<time datetime="2022-03-04">x</time>'
        )
        assert self._d(html2) == ("2020-01-02", "meta")
        assert self._d('<meta itemprop="datePublished" content="2019-05-06">') == (
            "2019-05-06",
            "itemprop",
        )

    def test_first_declaration_wins_within_source(self):
        html = (
            '<time datetime="2020-06-07">a</time>'
            '<time datetime="2021-08-09">b</time>'
        )
        assert self._d(html) == ("2020-06-07", "time")

    def test_invalid_dates_fall_through(self):
        # implausible year and impossible day skip to the next source
        html = (
            '<meta property="article:published_time" content="2031-01-01">'
            '<time datetime="2020-02-30"></time>'
        )
        assert self._d(html, "https://a.test/2018/11/22/x") == (
            "2018-11-22",
            "url",
        )

    def test_url_month_only_takes_day_one(self):
        assert self._d("<p>x</p>", "https://a.test/2019/03/slug") == (
            "2019-03-01",
            "url",
        )

    def test_url_pattern_needs_boundaries(self):
        # /123456/78 is not a date path; trailing digits must be segments
        assert self._d("<p>x</p>", "https://a.test/12345/67/89") == (
            None,
            None,
        )

    def test_datetime_with_time_component(self):
        assert self._d('<time datetime="2020-01-02T03:04:05+01:00"></time>') == (
            "2020-01-02",
            "time",
        )

    def test_script_noise_invisible(self):
        html = (
            "<script>var s='<meta name=\"date\" content=\"2020-01-01\">'"
            "</script><time datetime='2021-05-05'></time>"
        )
        assert self._d(html) == ("2021-05-05", "time")

    def test_nothing_found(self):
        assert self._d("<p>hello</p>", "https://a.test/about") == (None, None)

    def test_udf(self, spark):
        from pyspark.sql import functions as F

        from layerg_crawler_v2_spark.functions.extract import (
            extract_pub_date_udf,
        )

        df = spark.createDataFrame(
            [
                (1, b'<time datetime="2020-01-02">', "https://a.test/x"),
                (2, b"<p>n</p>", "https://a.test/2021/02/03/y"),
                (3, None, None),
            ],
            "id int, html binary, url string",
        )
        rows = {
            r["id"]: (r["d"]["pub_date"], r["d"]["date_source"])
            for r in df.select(
                "id",
                extract_pub_date_udf(F.col("html"), F.col("url")).alias("d"),
            ).collect()
        }
        assert rows == {
            1: ("2020-01-02", "time"),
            2: ("2021-02-03", "url"),
            3: (None, None),
        }
