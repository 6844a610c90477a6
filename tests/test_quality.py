"""C4 page cleaning (operators/quality.py): line rules, page rules, and the
corpus-level three-sentence-span dedup (keep-first semantics, hash-family
parity). Oracle parity for the registry entries lives in
test_oracle_parity.py; these tests pin the rule semantics on hand-built
pages where every rule fires in isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.quality import (
    MIN_KEPT_SENTENCES,
    c4_page_filter,
    c4_span_dedup_drops,
)

GOOD = [f"sentence number {i} is fine and complete." for i in range(6)]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_rules_each_fire(spark):
    page = "\n".join(
        GOOD[:5]
        + [
            "no terminal punctuation here",   # rule (a)
            "two words.",                      # rule (b)
            "please enable JavaScript now.",   # rule (c), case-insensitive
        ]
    )
    out = c4_page_filter(_docs(spark, [(1, page)])).collect()[0]
    assert out.n_lines == 8
    assert out.n_kept_lines == 5
    assert out.keep
    assert out.cleaned_text == "\n".join(GOOD[:5])


@pytest.mark.parametrize(
    "bad_line,flag",
    [("ad page with lorem ipsum inside it.", "has_lorem"),
     ("code page with a { brace in it.", "has_brace")],
)
def test_page_rules_drop_even_with_enough_sentences(spark, bad_line, flag):
    page = "\n".join(GOOD[:5] + [bad_line])
    out = c4_page_filter(_docs(spark, [(1, page)])).collect()[0]
    assert out[flag] and not out.keep
    assert out.n_kept_lines == 6  # line rules alone keep it; page rule kills


def test_min_sentences_gate(spark):
    out = c4_page_filter(
        _docs(spark, [(1, "\n".join(GOOD[: MIN_KEPT_SENTENCES - 1]))])
    ).collect()[0]
    assert not out.keep and out.n_kept_lines == MIN_KEPT_SENTENCES - 1


def test_span_dedup_keeps_first_occurrence(spark):
    # doc 1 and doc 2 share GOOD[0:3] => doc 2's copy (and only it) drops;
    # doc 1's shifted spans (1:4, 2:5) are unique and survive.
    d = _docs(
        spark,
        [(1, "\n".join(GOOD[:5])), (2, "\n".join(GOOD[:3] + ["tail line one of two."]))],
    )
    drops = {
        (r.doc_id, r.span_idx)
        for r in c4_span_dedup_drops(d).collect()
    }
    assert drops == {(2, 0)}


def test_span_dedup_hash_families_agree_on_positions(spark):
    rows = [
        (i, "\n".join(GOOD[j % 6] for j in range(i % 3, i % 3 + 5)))
        for i in range(40)
    ]
    d = _docs(spark, rows)
    xx = {(r.doc_id, r.span_idx) for r in c4_span_dedup_drops(d).collect()}
    md = {
        (r.doc_id, r.span_idx)
        for r in c4_span_dedup_drops(d, hash_fn="md5").collect()
    }
    assert xx == md and xx


def test_no_kept_lines_is_empty_not_error(spark):
    d = _docs(spark, [(1, "no punct\nstill no punct"), (2, None)])
    assert c4_page_filter(d).filter(F.col("doc_id") == 1).collect()[0].n_kept_lines == 0
    assert c4_span_dedup_drops(d).count() == 0


# ---------------------------------------------------------------------------
# jusText-style per-page main-content blocks
# ---------------------------------------------------------------------------


def test_justext_blocks_classification(spark):
    from layerg_crawler_v2_spark.operators.quality import justext_blocks

    content = (
        "This is the real article content with enough words to clear the "
        "minimum length threshold easily."
    )
    html = (
        '<html><body><nav><a href="/">Home</a> | <a href="/b">Blog</a></nav>'
        f"<p>{content}</p>"
        '<div>Short <a href="/x">link</a> mix</div>'
        "<script>var junk = 'invisible';</script>"
        '<footer><a href="/terms">Terms of service and privacy policy '
        "and cookie settings and more legal links here</a></footer>"
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("u1", html.encode())], "url string, html binary"
    )
    rows = {
        r["block_idx"]: r for r in justext_blocks(pages).collect()
    }
    assert rows[1]["text"] == content and rows[1]["is_content"]
    assert not rows[0]["is_content"]  # nav: link-dominated
    assert not rows[2]["is_content"]  # short
    # long but pure link text (footer): length passes, density kills it
    assert rows[3]["n_chars"] >= 40 and not rows[3]["is_content"]
    assert "invisible" not in " ".join(r["text"] for r in rows.values())


def test_justext_blocks_integer_density_boundary(spark):
    from layerg_crawler_v2_spark.operators.quality import justext_blocks

    # exactly 1/3 link density must be EXCLUDED (strict <): 60 chars,
    # 20 of them anchor text
    text_part = "x" * 40
    link_part = "y" * 20
    html = f'<p>{text_part}<a href="/l">{link_part}</a></p>'
    pages = spark.createDataFrame(
        [("u", html.encode())], "url string, html binary"
    )
    [r] = justext_blocks(pages).collect()
    assert (r["n_chars"], r["link_chars"]) == (60, 20)
    assert not r["is_content"]
    # one char under the boundary passes
    html2 = f'<p>{text_part}x<a href="/l">{link_part}</a></p>'
    pages2 = spark.createDataFrame(
        [("u", html2.encode())], "url string, html binary"
    )
    [r2] = justext_blocks(pages2).collect()
    assert r2["is_content"]


# --------------------------------------------------------------------------
# compression-ratio signal
# --------------------------------------------------------------------------

def test_compression_ratio_separates_repetition(spark):
    from layerg_crawler_v2_spark.operators.quality import compression_ratio

    rows = [
        (1, "spam " * 400),
        (2, "The quick brown fox jumps over the lazy dog. "
            "Pack my box with five dozen liquor jugs. "
            "Sphinx of black quartz, judge my vow. " * 5),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["raw_bytes"], r["deflate_bytes"], r["ratio_bp"])
        for r in compression_ratio(df).collect()
    }
    import zlib

    for did, text in rows:
        if text is None:
            assert got[did] == (None, None, None)
            continue
        b = text.encode()
        exp = (
            len(b),
            len(zlib.compress(b, 6)),
            len(zlib.compress(b, 6)) * 10000 // len(b) if b else None,
        )
        assert got[did] == exp, did
    # repetitive text compresses far better than prose
    assert got[1][2] < got[2][2] / 3
