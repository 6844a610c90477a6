"""Unigram-LM tokenizer (operators/unigram.py): distributed-vs-sequential
golden parity, Viterbi exactness, encoding totality."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.unigram import (
    seed_substring_vocab,
    unigram_encode,
    unigram_train,
    unigram_train_reference,
    viterbi_segment,
)

WORDS = {
    "lowlands": 6, "lowland": 9, "low": 30, "land": 22, "lands": 8,
    "high": 25, "highland": 11, "highlands": 5, "hand": 14, "handle": 7,
    "sand": 9, "stand": 12, "standing": 6, "landing": 8, "ding": 3,
}


def _wf(spark, words=None):
    return spark.createDataFrame(
        list((words or WORDS).items()), "word string, freq bigint"
    )


def test_viterbi_exact_products_and_ties():
    counts = {"a": 10, "b": 10, "ab": 5, "abc": 0, "c": 1}
    total = 26
    # ab as one piece: 5/26 beats a·b = 100/676 = ... 5*26 = 130 vs 100:
    # one-piece wins
    assert viterbi_segment("ab", counts, total, 3) == ["ab"]
    # zero-count piece never beats a nonzero segmentation
    assert viterbi_segment("abc", counts, total, 3) == ["ab", "c"]
    # unknown single chars score 0 but keep encoding total
    assert viterbi_segment("zq", counts, total, 3) == ["z", "q"]
    # tie on product+k breaks to the lexicographically smaller sequence:
    # 'xy' with x==y counts and no multi piece has only one split — build a
    # real tie: pieces 'aa' (c=4) vs 'a','a' (2*2=4): product tie 4/26 vs
    # 4/676 -> cross-multiplied NOT a tie; fewer-pieces applies only on
    # true value ties. Construct one: total^1*P2 == total^2*P1 means
    # P2 = 26*P1: counts 'bb'=26? then bb(26) vs b·b(1): 26*26 == 1*676 —
    # a genuine tie; fewer pieces wins.
    c2 = {"b": 1, "bb": 26}
    assert viterbi_segment("bb", c2, 26, 3) == ["bb"]


def test_seed_vocab_counts(spark):
    out = {
        r["piece"]: r["count"]
        for r in seed_substring_vocab(
            _wf(spark, {"aba": 2, "ab": 3}), max_piece_len=2, seed_size=100
        ).collect()
    }
    # 'a': 2 per 'aba' (positions 0,2) x2 + 1 per 'ab' x3 = 7
    assert out["a"] == 7 and out["b"] == 5
    # 'ab': once in 'aba' (2) + once in 'ab' (3) = 5; 'ba': 2
    assert out["ab"] == 5 and out["ba"] == 2
    assert "aba" not in out  # longer than max_piece_len


def test_train_matches_sequential_reference(spark):
    got = {
        r["piece"]: r["count"]
        for r in unigram_train(
            _wf(spark), vocab_size=30, n_iters=3, max_piece_len=5, seed_size=200
        ).collect()
    }
    want = unigram_train_reference(
        WORDS, vocab_size=30, n_iters=3, max_piece_len=5, seed_size=200
    )
    assert got == want


def test_train_partitioning_invariant(spark):
    a = {
        r["piece"]: r["count"]
        for r in unigram_train(
            _wf(spark).repartition(1), vocab_size=25, n_iters=2
        ).collect()
    }
    b = {
        r["piece"]: r["count"]
        for r in unigram_train(
            _wf(spark).repartition(7), vocab_size=25, n_iters=2
        ).collect()
    }
    assert a == b


def test_encode_total_and_reconstructs(spark):
    vocab = unigram_train(_wf(spark), vocab_size=30, n_iters=2)
    docs = spark.createDataFrame(
        [(1, "low lands standing"), (2, "zzz unseen"), (3, None), (4, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in unigram_encode(docs, vocab).collect()}
    assert out[1].n_words == 3
    # concatenating tokens reconstructs the words exactly
    assert "".join(out[1].tokens) == "lowlandsstanding"
    assert out[1].n_tokens >= out[1].n_words
    # unseen chars still encode (totality)
    assert "".join(out[2].tokens) == "zzzunseen"
    assert out[3].n_words == 0 and out[3].n_tokens == 0
    assert out[4].n_words == 0
