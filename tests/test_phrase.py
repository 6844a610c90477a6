"""Exact phrase search: per-row slice-match semantics vs a trivial Python
reference, edge cases, and plan shape (no exchange)."""

from __future__ import annotations

import re

import pytest

from layerg_crawler_v2_spark.operators.search import phrase_occurrences


def py_ref(text: str, phrase: list[str]):
    toks = [t for t in re.split("[^a-z]+", text.lower()) if t]
    k = len(phrase)
    hits = [
        i + 1
        for i in range(len(toks) - k + 1)
        if toks[i : i + k] == phrase
    ]
    return (len(hits), hits[0]) if hits else None


DOCS = [
    (1, "the quick brown fox the quick brown fox"),
    (2, "quick the brown"),
    (3, "THE...quick!brown"),            # tokenizer splits on non a-z
    (4, "prefix the quick end"),
    (5, ""),
    (6, "the the the"),                  # overlapping matches
    (7, "the quick"),                    # exact-length doc
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


@pytest.mark.parametrize(
    "phrase",
    [["the", "quick"], ["the", "quick", "brown"], ["the", "the"], ["zzz"]],
)
def test_matches_python_reference(spark, docs_df, phrase):
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_occurrences(docs_df, phrase).collect()
    }
    exp = {
        i: py_ref(t, phrase) for i, t in DOCS if py_ref(t, phrase)
    }
    assert got == exp


def test_overlap_counted(spark, docs_df):
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_occurrences(docs_df, ["the", "the"]).collect()
    }
    assert got == {6: 2}  # "the the the" has two overlapping bigrams


def test_single_word_phrase(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_occurrences(docs_df, ["brown"]).collect()
    }
    assert got == {1: (2, 3), 2: (1, 3), 3: (1, 3)}


def test_rejects_bad_phrase(spark, docs_df):
    for bad in ([], ["Upper"], ["has space"], ["digit1"]):
        with pytest.raises(ValueError):
            phrase_occurrences(docs_df, bad)


def test_plan_has_no_exchange(spark, docs_df):
    plan = phrase_occurrences(docs_df, ["the", "quick"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
