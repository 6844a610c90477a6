"""HTML -> Markdown serializer: golden renderings + recovery/totality.

Golden policy mirrors tests/test_extract.py: hand-derived expected output
for each structural feature, byte-exact assertions, plus malformed-input
recovery cases and a fuzz totality sweep.
"""

from __future__ import annotations

import pytest

from layerg_crawler_v2_spark.functions.markdown import html_to_markdown


def md(s: str) -> str:
    return html_to_markdown(s.encode())


def test_headings_and_paragraphs():
    assert (
        md("<h1>Title</h1><p>one</p><h2>Sub</h2><p>two</p>")
        == "# Title\n\none\n\n## Sub\n\ntwo"
    )


def test_inline_emphasis_code_link():
    assert (
        md(
            '<p>a <b>bold</b> and <em>it</em> and <code>x=1</code> '
            'and <a href="https://t.test/p">go</a>.</p>'
        )
        == "a **bold** and *it* and `x=1` and [go](https://t.test/p)."
    )


def test_unordered_and_ordered_lists():
    assert (
        md("<ul><li>alpha</li><li>beta</li></ul>")
        == "- alpha\n\n- beta"
    )
    assert (
        md("<ol><li>one</li><li>two</li><li>three</li></ol>")
        == "1. one\n\n2. two\n\n3. three"
    )


def test_nested_list_indent_and_counters():
    out = md(
        "<ol><li>a<ol><li>a1</li><li>a2</li></ol></li><li>b</li></ol>"
    )
    # inner list restarts its own counter; outer counter resumes at 2
    assert out == "1. a\n\n  1. a1\n\n  2. a2\n\n2. b"


def test_blockquote_depth_applies_to_all_lines():
    assert (
        md("<blockquote><p>q1</p><blockquote><p>q2</p></blockquote></blockquote>")
        == "> q1\n\n> > q2"
    )


def test_pre_fenced_verbatim_no_collapse():
    assert (
        md("<pre>def f():\n    return  1</pre>")
        == "```\ndef f():\n    return  1\n```"
    )


def test_markup_inside_pre_ignored():
    assert md("<pre><code>x</code> y</pre>") == "```\nx y\n```"


def test_hr_and_br():
    assert md("<p>a<br>b</p><hr><p>c</p>") == "a\nb\n\n---\n\nc"


def test_img():
    assert (
        md('<p><img src="/i.png" alt="pic"> done</p>')
        == "![pic](/i.png) done"
    )
    assert md('<p><img alt="noscr"> x</p>') == "x"


def test_drop_blocks_invisible():
    html = (
        "<head><title>t</title></head><nav><a href='/h'>Home</a></nav>"
        "<script>var a='<p>no</p>'</script><p>kept</p>"
        "<!-- <h1>c</h1> -->"
    )
    assert md(html) == "kept"


def test_whitespace_collapses_per_block():
    assert md("<p>  a \n\n  b\t c  </p>") == "a b c"


def test_entities_decoded_once():
    assert md("<p>a &amp; b &lt;tag&gt;</p>") == "a & b <tag>"


def test_unclosed_inline_closes_at_block_boundary():
    assert md("<p>a <b>bold<p>next</p>") == "a **bold**\n\nnext"


def test_unclosed_link_closes_at_block_boundary():
    assert (
        md('<p>see <a href="/x">this<p>next</p>')
        == "see [this](/x)\n\nnext"
    )


def test_anchor_without_href_renders_plain():
    assert md("<p><a name='x'>plain</a> t</p>") == "plain t"


def test_stray_closers_ignored():
    assert md("</b></ul></blockquote><p>ok</p>") == "ok"


def test_unclosed_pre_runs_to_eof():
    assert md("<pre>a\nb") == "```\na\nb\n```"


def test_none_and_empty():
    assert html_to_markdown(None) is None
    assert html_to_markdown(b"") == ""
    assert md("<p>  </p>") == ""


def test_heading_inside_quote():
    assert md("<blockquote><h2>t</h2></blockquote>") == "> ## t"


@pytest.mark.parametrize("seed", range(20))
def test_totality_on_soup(seed):
    import random

    rng = random.Random(seed)
    frags = [
        "<p>", "</p>", "<b>", "</em>", "<a href=x>", "<a href='y z'>",
        "</a>", "<ul>", "<li>", "</ol>", "<pre>", "</pre>", "txt ",
        "&amp;", "<br>", "<hr>", "<script>", "</script>", "<!--", "-->",
        "<blockquote>", "</blockquote>", "<h3>", "\x00\xff", "<img src=i>",
    ]
    s = "".join(rng.choice(frags) for _ in range(rng.randrange(1, 60)))
    out = html_to_markdown(s.encode("utf-8", errors="ignore"))
    assert isinstance(out, str)


def test_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from layerg_crawler_v2_spark.functions.markdown import (
        html_to_markdown_udf,
    )

    df = spark.createDataFrame(
        [(1, b"<h1>T</h1><p>b</p>"), (2, None)], "id int, html binary"
    )
    rows = {
        r["id"]: r["m"]
        for r in df.select(
            "id", html_to_markdown_udf(F.col("html")).alias("m")
        ).collect()
    }
    assert rows == {1: "# T\n\nb", 2: None}
