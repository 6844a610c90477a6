"""Rational-arithmetic BM25 (operators/search.py): pure-python parity,
ranking sanity, idf weighting, int64 headroom."""

from __future__ import annotations

import re

import pytest

from layerg_crawler_v2_spark.operators.search import (
    IDF_SCALE,
    bm25_topk,
    build_postings,
    tokenize,
)

DOCS = [
    (1, "the quick join runs a join over the vector table"),
    (2, "scan scan scan and more scan of the big table"),
    (3, "nothing relevant here at all friends"),
    (4, "join vector scan join vector scan join"),
    (5, "a vector"),
]
TERMS = ["join", "vector", "scan"]


def py_bm25(docs, terms, k=10):
    toks = {i: [t for t in re.split(r"[^a-z]+", s.lower()) if t] for i, s in docs}
    n = len(docs)
    t_total = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, words in toks.items():
        dl = len(words)
        sc = 0
        for t in terms:
            tf = words.count(t)
            if tf == 0 or df[t] == 0:
                continue
            w = (n * IDF_SCALE) // df[t]
            sc += (w * tf * 44 * t_total) // (
                20 * tf * t_total + 6 * t_total + 18 * dl * n
            )
        if sc:
            scores[i] = sc
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_bm25(spark):
    got = [(r["doc_id"], r["score_scaled"]) for r in bm25_topk(_df(spark), TERMS).collect()]
    assert got == py_bm25(DOCS, TERMS)


def test_all_terms_doc_wins(spark):
    top = bm25_topk(_df(spark), TERMS, k=1).collect()[0]
    assert top["doc_id"] == 4


def test_rare_term_outweighs_common(spark):
    # 'quick' appears in 1 doc, 'table' in 2: equal tf, the rarer term's
    # idf weight must dominate
    one = bm25_topk(_df(spark), ["quick"], k=5).collect()
    two = bm25_topk(_df(spark), ["table"], k=5).collect()
    assert one[0]["score_scaled"] > two[0]["score_scaled"]


def test_postings_shape(spark):
    rows = {(r["tok"], r["doc_id"]): r["tf"] for r in build_postings(_df(spark)).collect()}
    assert rows[("join", 4)] == 3 and rows[("scan", 2)] == 4


def test_tokenizer_drops_empty_and_case(spark):
    df = spark.createDataFrame([(1, "  A,b!!C  ")], "doc_id long, text string")
    assert sorted(r["tok"] for r in tokenize(df).collect()) == ["a", "b", "c"]


def test_rejects_empty_terms(spark):
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), [])


def test_int64_headroom():
    """The widest BIGINT intermediate is w * tf * 44 * t_total (search.py's
    documented envelope). Assert it fits int64 across every scale the
    entries run at (sf 0.001-0.1, worst case df=1), and that the envelope
    check itself catches the scale where a production run must shrink
    IDF_SCALE (search.py docstring)."""
    for n_docs, t_total, tf_max in [(500, 10**5, 100), (5_000, 10**6, 1_000)]:
        w = (n_docs * IDF_SCALE) // 1
        assert w * tf_max * 44 * t_total < 2**63
    # the envelope DOES break at ~10^6 docs with df=1 + IDF_SCALE=1e4:
    # documented in search.py as the point to drop IDF_SCALE a decade
    w = (10**6 * IDF_SCALE) // 1
    assert w * 10**3 * 44 * 10**9 >= 2**63


def test_anchor_text_index(spark):
    from layerg_crawler_v2_spark.operators.search import anchor_text_index

    pairs = spark.createDataFrame(
        [
            ("http://t/1", "home"),
            ("http://t/1", "Home Page"),
            ("http://t/1", "home"),
            ("http://t/1", ""),
            ("http://t/2", "docs"),
        ],
        "dst string, anchor string",
    )
    got = {
        r["dst"]: (r["n_inlinks"], r["anchors"])
        for r in anchor_text_index(pairs).collect()
    }
    # counts include the empty-anchor link; the anchor SET excludes it
    assert got["http://t/1"] == (4, ["Home Page", "home"])
    assert got["http://t/2"] == (1, ["docs"])


def test_anchor_index_entry_hub_receives_most_inlinks(spark, sf_dir):
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["anchor_text_index"](spark, sf_dir).limit(10).collect()
    assert rows and rows[0]["n_inlinks"] >= rows[-1]["n_inlinks"] >= 1
    for r in rows:
        # targets are canonical urls; anchors are the generator's l{i}
        # labels, sorted, with duplicates collapsed
        assert "/d/" in r["dst"]
        assert r["anchors"] == sorted(set(r["anchors"]))
        assert all(a.startswith("l") for a in r["anchors"])


def test_collocations_pmi(spark):
    from layerg_crawler_v2_spark.operators.search import (
        PMI_SCALE,
        collocations_pmi_topk,
    )

    # "san francisco" always adjacent (PMI high); "the x" pairs spread
    # across many partners (PMI ~1x baseline)
    # 'is' follows 'francisco' but is 3x as frequent, so (francisco, is)
    # scores a third of (san, francisco) — unique top pair
    docs = [
        (i, "san francisco is the spot is the place is the area")
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = collocations_pmi_topk(df, k=5, min_count=5).collect()
    top = rows[0]
    assert (top["w1"], top["w2"]) == ("san", "francisco")
    assert top["pair_count"] == 6
    # staged-integer score equals the hand-computed staging
    t1 = 6 * 11  # tokens per doc * docs
    t2 = 6 * 10
    c_xy, c_x, c_y = 6, 6, 6
    want = ((((c_xy * t1) // c_x) * t1) // c_y) * PMI_SCALE // t2
    assert top["pmi_ratio_scaled"] == want
    # an always-adjacent exclusive pair must beat a promiscuous one
    the_pairs = [r for r in rows if r["w1"] == "the"]
    assert all(top["pmi_ratio_scaled"] > r["pmi_ratio_scaled"] for r in the_pairs)


def test_collocations_single_token_docs_no_bigrams(spark):
    from layerg_crawler_v2_spark.operators.search import collocations_pmi_topk

    df = spark.createDataFrame(
        [(1, "word"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    # min_count=1 so the lone bigram (a,b) survives; 1-token and empty
    # docs contribute nothing and crash nothing
    rows = collocations_pmi_topk(df, k=5, min_count=1).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]
