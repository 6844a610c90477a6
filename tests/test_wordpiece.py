"""WordPiece tokenization (operators/wordpiece.py).

Evidence model: golden parity vs the sequential reference encoder
(independent formulation), property fuzz over random vocab/word draws,
the BERT [UNK]-whole-word contract, corpus reassembly, and plan shape
(zero exchanges below the distinct-word aggregate, no Python)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from layerg_crawler_v2_spark.operators.wordpiece import (
    UNK,
    encode_reference,
    encode_words,
    wordpiece_encode,
)

VOCAB = [
    "un", "##aff", "##able", "##ord", "a", "##b", "aff", "##f", "x",
    "h", "##i", "ab", "##cd", "q", "##u",
]


def _encode(spark, words, vocab):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {
        r["word"]: list(r["tokens"])
        for r in encode_words(df, vocab).collect()
    }


def test_golden_vs_reference(spark):
    words = [
        "unaffable", "unafford", "hi", "zap", "a", "ab", "abcd",
        "abcdx", "aaa", "qu", "xx", "affx", "unab",
    ]
    assert _encode(spark, words, VOCAB) == encode_reference(words, VOCAB)


def test_longest_match_first(spark):
    # 'ab' must win over 'a' at word start; '##cd' over '##c'
    got = _encode(spark, ["abcd"], VOCAB + ["##c", "##d"])
    assert got["abcd"] == ["ab", "##cd"]


def test_unk_is_whole_word(spark):
    # a word with a matchable PREFIX but an unmatchable tail is [UNK]
    # whole — partial pieces are discarded (the BERT contract)
    got = _encode(spark, ["affz", "zaff"], VOCAB)
    assert got["affz"] == [UNK]
    assert got["zaff"] == [UNK]


def test_initial_vs_continuation_tables(spark):
    # 'x' exists only as an initial piece: fine at pos 0, [UNK] later
    got = _encode(spark, ["x", "ax"], VOCAB)
    assert got["x"] == ["x"]
    assert got["ax"] == [UNK]


def test_fuzz_vs_reference(spark):
    rng = random.Random(42)
    alphabet = "abc"
    cores = {"a", "b", "c", "ab", "bc", "ca", "abc", "cb"}
    vocab = [c for c in cores if rng.random() < 0.8] + [
        "##" + c for c in cores if rng.random() < 0.8
    ]
    if not any(not p.startswith("##") for p in vocab):
        vocab.append("a")
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        for _ in range(120)
    ]
    assert _encode(spark, words, vocab) == encode_reference(words, vocab)


def test_corpus_encode_reassembly(spark):
    docs = spark.createDataFrame(
        [(1, "ab hi unaffable"), (2, "zap  a"), (3, "qu qu")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], list(r["tokens"]))
        for r in wordpiece_encode(docs, VOCAB).collect()
    }
    ref = encode_reference(
        ["ab", "hi", "unaffable", "zap", "a", "qu"], VOCAB
    )
    assert out[1] == (6, ref["ab"] + ref["hi"] + ref["unaffable"])
    assert out[2] == (2, ref["zap"] + ref["a"])
    assert out[3] == (4, ref["qu"] * 2)


def test_vocab_validation():
    with pytest.raises(ValueError):
        encode_reference(["a"], ["##a"])  # no initial pieces
    with pytest.raises(ValueError):
        encode_reference(["a"], ["a", "##"])  # empty continuation
    with pytest.raises(ValueError):
        encode_reference(["a"], ["a", ""])  # empty piece


def test_plan_zero_shuffle_no_python(spark):
    df = spark.createDataFrame([("abc",)], "word string")
    plan = (
        encode_words(df, VOCAB)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
