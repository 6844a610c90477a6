"""Unigram-LM tokenizer training (Kudo 2018, the SentencePiece 'unigram'
model) — the second tokenizer-training pass of an LLM data pipeline, next
to operators/bpe.py. BPE builds a vocabulary bottom-up by merging; the
unigram model starts from a LARGE seed vocabulary and prunes it down,
segmenting each word by the highest-likelihood piece sequence.

This is the hard-EM (Viterbi) variant: the E-step assigns each word its
single best segmentation under current piece counts, the M-step re-counts
pieces from those segmentations, and pruning keeps the top `vocab_size`
pieces (single characters are never pruned, keeping encoding total). The
full model also uses forward-backward expectations and a 0.75 shrink
schedule — the hard-EM/top-K simplification is documented, standard, and
keeps every quantity an INTEGER.

Integer-exact likelihood (the repo's cross-engine determinism discipline):
a segmentation's likelihood is prod(c_i) / C^k for piece counts c_i, total
count C, k pieces. Comparing two candidates never touches floats —
P1 * C^k2 vs P2 * C^k1 with Python arbitrary-precision integers — so the
Viterbi argmax has NO float ties, NO libm variance, and the distributed
run bit-matches the sequential reference on any engine, partitioning, or
run. Ties break to fewer pieces, then the lexicographically smaller piece
sequence (a total order).

Scale shape:
  * the corpus is touched once (word_freq_table, operators/bpe.py); all
    iterations run on the vocabulary-sized (word, freq) table;
  * seed-substring generation is an in-row nested transform (bounded by
    max_piece_len², inside codegen) + one partial-aggregated groupBy;
  * each EM iteration broadcasts the MODEL (piece→count dict, 10^4-10^5
    entries — kilobytes to a few MB, the kmeans-centroid pattern) into one
    Arrow pass over words, then one piece-count groupBy; driver traffic
    per iteration is the model, never the data;
  * the per-word Viterbi DP is O(len · max_piece_len) with big-int
    arithmetic bounded by len · log(C) bits — microseconds per word.

Reference analog: none in the Go reference (tokenizer training is part of
the brief's LLM-pipeline extension, like operators/bpe.py — see
SURVEY.md §2's text-analysis family).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seed_substring_vocab(
    word_freq: DataFrame,
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> DataFrame:
    """Frequency-weighted counts of ALL substrings up to max_piece_len,
    pruned to: every single character + the top `seed_size` multi-char
    pieces by (count desc, piece asc). One bounded in-row explode + one
    partial-aggregated groupBy; the top-K is a TakeOrderedAndProject,
    never a full sort."""
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - i + 1)
                ),
                lambda ln: w.substr(i, ln),
            ),
        )
    )
    counts = (
        word_freq.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("count"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("count").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def viterbi_segment(
    word: str, counts: dict[str, int], total: int, max_piece_len: int
) -> list[str]:
    """Single best segmentation under the unigram model, integer-exact.

    Maximizes prod(counts[piece]) / total^k; candidate comparison is
    cross-multiplied big-int (never float). Ties: fewer pieces, then the
    lexicographically smaller piece tuple. Single characters absent from
    `counts` score 0 — still segmentable (encoding is total), and any
    segmentation avoiding a zero-count piece beats any containing one."""
    n = len(word)
    powc = [1] * (n + 1)
    for k in range(1, n + 1):
        powc[k] = powc[k - 1] * total
    # best[i] = (P, k, seq) for word[:i]
    best: list[tuple[int, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (1, 0, ())
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            c = counts.get(piece)
            if c is None and len(piece) > 1:
                continue
            pj, kj, sj = best[j]
            cand = (pj * (c or 0), kj + 1, sj + (piece,))
            cur = best[i]
            if cur is None:
                best[i] = cand
                continue
            l = cand[0] * powc[cur[1]]
            r = cur[0] * powc[cand[1]]
            if l > r or (
                l == r
                and (cand[1], cand[2]) < (cur[1], cur[2])
            ):
                best[i] = cand
    assert best[n] is not None  # single chars always available
    return list(best[n][2])


def _segment_counts(
    word_freq: DataFrame, counts: dict[str, int], total: int, max_piece_len: int
) -> DataFrame:
    """One Arrow pass: Viterbi-segment every word, emit (piece, freq)."""

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pieces, freqs = [], []
            for word, freq in zip(b["word"], b["freq"]):
                for p in viterbi_segment(str(word), counts, total, max_piece_len):
                    pieces.append(p)
                    freqs.append(int(freq))
            yield pd.DataFrame({"piece": pieces, "freq": freqs})

    return word_freq.select("word", "freq").mapInPandas(
        seg, schema="piece string, freq bigint"
    )


def unigram_train(
    word_freq: DataFrame,
    vocab_size: int = 500,
    n_iters: int = 3,
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> DataFrame:
    """Hard-EM unigram-LM training over a (word, freq) table.

    Returns the final (piece, count) vocabulary: all single characters
    plus the top multi-char pieces by re-estimated count, at most
    `vocab_size` rows (fewer when the corpus supports fewer pieces).
    Deterministic end-to-end (see module docstring)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    vocab = seed_substring_vocab(word_freq, max_piece_len, seed_size)
    for _ in range(n_iters):
        model = {r["piece"]: int(r["count"]) for r in vocab.collect()}
        total = sum(model.values()) or 1
        est = _segment_counts(word_freq, model, total, max_piece_len).groupBy(
            "piece"
        ).agg(F.sum("freq").cast("bigint").alias("count"))
        # chars are never pruned (totality); absent chars keep count 0
        chars = (
            vocab.filter(F.length("piece") == 1)
            .select("piece")
            .join(est, "piece", "left")
            .select("piece", F.coalesce("count", F.lit(0)).cast("bigint").alias("count"))
        )
        n_chars = chars.count()
        multi = (
            est.filter(F.length("piece") > 1)
            .orderBy(F.col("count").desc(), F.col("piece").asc())
            .limit(max(0, vocab_size - n_chars))
        )
        vocab = chars.unionByName(multi).localCheckpoint(eager=True)
    return vocab


def unigram_encode(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 6,
) -> DataFrame:
    """Viterbi-encode each document's whitespace words under a trained
    vocabulary: (id, n_words, n_tokens, tokens array<string>). The model
    is closure-broadcast (kilobytes); one Arrow pass, no shuffle."""
    model = {r["piece"]: int(r["count"]) for r in vocab.collect()}
    total = sum(model.values()) or 1

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_id, out_nw, out_nt, out_toks = [], [], [], []
            for i, t in zip(b["__id"], b["__text"]):
                words = [w for w in str(t or "").split(" ") if w]
                toks: list[str] = []
                for w in words:
                    toks.extend(viterbi_segment(w, model, total, max_piece_len))
                out_id.append(i)
                out_nw.append(len(words))
                out_nt.append(len(toks))
                out_toks.append(toks)
            yield pd.DataFrame(
                {
                    "__id": out_id,
                    "n_words": out_nw,
                    "n_tokens": out_nt,
                    "tokens": out_toks,
                }
            )

    return (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
        .mapInPandas(
            enc,
            schema=f"__id bigint, n_words bigint, n_tokens bigint, tokens array<string>",
        )
        .withColumnRenamed("__id", id_col)
    )


def unigram_train_reference(
    words: dict[str, int],
    vocab_size: int = 500,
    n_iters: int = 3,
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> dict[str, int]:
    """Sequential twin of unigram_train for golden parity (the
    tests/reference_sim.py discipline: an independent formulation, not a
    port of the distributed code path)."""
    from collections import Counter

    sub = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                sub[w[i : i + ln]] += f
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    vocab = dict(chars)
    vocab.update(dict(multi))
    for _ in range(n_iters):
        total = sum(vocab.values()) or 1
        est = Counter()
        for w, f in words.items():
            for p in viterbi_segment(w, vocab, total, max_piece_len):
                est[p] += f
        new_chars = {p: est.get(p, 0) for p in vocab if len(p) == 1}
        new_multi = sorted(
            ((p, c) for p, c in est.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[: max(0, vocab_size - len(new_chars))]
        vocab = dict(new_chars)
        vocab.update(dict(new_multi))
    return vocab
