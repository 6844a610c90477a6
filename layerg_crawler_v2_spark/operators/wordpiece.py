"""WordPiece greedy longest-match tokenization (Devlin et al. 2019; Song
et al. 2021 "Fast WordPiece Tokenization") — the third tokenizer family
next to BPE (operators/bpe.py, merge-rule fold) and unigram-LM
(operators/unigram.py, Viterbi): BERT-style encoding against a FIXED
vocabulary of initial pieces and '##'-prefixed continuation pieces, the
longest vocabulary piece matching at the cursor winning at every step and
any word with an unmatchable position collapsing to [UNK] whole.

Scale shape (the bpe_encode discipline): the greedy loop runs once per
DISTINCT word — vocabulary-sized by Heaps' law, never corpus-sized — as a
pure whole-stage-codegen fold: `F.aggregate` over a length(word)-step
sequence, each step resolving the longest match through literal-map
lookups (the vocabulary rides the plan as two map literals, initial and
continuation — no UDF, no broadcast join, no Python). Corpus encoding is
the same explode -> distinct-encode -> join-back -> one groupBy(id)
reassembly as BPE. The cross-engine oracle replays the identical greedy
loop as a DuckDB recursive CTE with a LATERAL longest-match probe
(__spark_entry__.py wordpiece_encode_words).

Reference analog: tokenization sits in the same per-row decode family as
the generated typed decoders (generated/eventhandlers/event_handlers.go:
48-82) — pure function of the row, model in the plan, no state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"
CONT = "##"


def _validate_vocab(vocab: list[str]) -> tuple[list[str], list[str]]:
    """Split into (initial cores, continuation cores); reject empties."""
    init, cont = [], []
    for piece in vocab:
        if piece.startswith(CONT):
            core = piece[len(CONT):]
            if not core:
                raise ValueError(f"empty continuation piece: {piece!r}")
            cont.append(core)
        else:
            if not piece:
                raise ValueError("empty vocabulary piece")
            init.append(piece)
    if not init:
        raise ValueError("vocabulary has no word-initial pieces")
    return init, cont


def _lit_map(cores: list[str]) -> Column:
    """{core: 1} literal map (empty map when no cores)."""
    if not cores:
        return F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<int>")
        )
    pairs: list[Column] = []
    for c in sorted(set(cores)):
        pairs += [F.lit(c), F.lit(1)]
    return F.create_map(*pairs)


def encode_words(
    words: DataFrame,
    vocab: list[str],
    word_col: str = "word",
    unk: str = UNK,
) -> DataFrame:
    """(word, tokens ARRAY<STRING>) — greedy longest-match-first WordPiece.

    At cursor pos the candidate piece lengths are probed longest-first
    (bounded by the longest vocabulary core); a word-initial cursor
    consults the initial map, any later cursor the continuation map, and
    a position with no match makes the WHOLE word [UNK] (the BERT
    contract — partial prefixes are discarded, not emitted). The fold is
    one column expression: length(word) aggregate steps, each step a
    <=max_core_len-branch coalesce of literal-map lookups, all inside
    whole-stage codegen."""
    init, cont = _validate_vocab(vocab)
    max_len = max(len(c) for c in init + cont)
    init_map, cont_map = _lit_map(init), _lit_map(cont)
    word = F.col(word_col)
    wlen = F.length(word)

    def match_len(pos: Column) -> Column:
        """Longest core length matching at pos, else NULL."""
        branches = []
        for length in range(max_len, 0, -1):
            cand = word.substr(pos, F.lit(length))
            hit = F.when(
                pos == 1, F.element_at(init_map, cand)
            ).otherwise(F.element_at(cont_map, cand))
            branches.append(
                F.when(
                    (pos + length <= wlen + 1) & hit.isNotNull(),
                    F.lit(length),
                )
            )
        return F.coalesce(*branches)

    def step(acc: Column, _: Column) -> Column:
        pos, toks, dead = acc["pos"], acc["toks"], acc["dead"]
        m = match_len(pos)
        piece = F.when(pos == 1, word.substr(pos, m)).otherwise(
            F.concat(F.lit(CONT), word.substr(pos, m))
        )
        advanced = F.struct(
            (pos + m).alias("pos"),
            F.concat(toks, F.array(piece)).alias("toks"),
            F.lit(False).alias("dead"),
        )
        failed = F.struct(
            pos.alias("pos"), toks.alias("toks"), F.lit(True).alias("dead")
        )
        return (
            F.when(dead | (pos > wlen), acc)
            .when(m.isNull(), failed)
            .otherwise(advanced)
        )

    init_state = F.struct(
        F.lit(1).alias("pos"),
        F.array().cast("array<string>").alias("toks"),
        F.lit(False).alias("dead"),
    )
    state = F.aggregate(
        F.sequence(F.lit(1), F.greatest(wlen, F.lit(1))), init_state, step
    )
    tokens = F.when(
        state["dead"] | (wlen == 0), F.array(F.lit(unk))
    ).otherwise(state["toks"])
    return words.select(word_col, tokens.alias("tokens"))


def wordpiece_encode(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    unk: str = UNK,
) -> DataFrame:
    """Tokenize the corpus: (id, n_tokens, tokens) — encode the DISTINCT
    word table once, join back to the positional explode, reassemble with
    ONE groupBy(id) shuffle carrying token arrays (the bpe_encode shape,
    operators/bpe.py:172-209)."""
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    vocab_map = encode_words(words.select("word").distinct(), vocab, unk=unk)
    return (
        words.join(vocab_map, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tokens"))),
                    lambda s: s["tokens"],
                )
            ).alias("tokens")
        )
        .select(id_col, F.size("tokens").alias("n_tokens"), "tokens")
    )


def encode_reference(
    words: list[str], vocab: list[str], unk: str = UNK
) -> dict[str, list[str]]:
    """Sequential greedy reference (<20 lines) for golden/property tests —
    the same independent-formulation discipline as bpe.encode_reference."""
    init, cont = _validate_vocab(vocab)
    init_set, cont_set = set(init), set(cont)
    out: dict[str, list[str]] = {}
    for w in words:
        toks: list[str] = []
        pos = 0
        while pos < len(w):
            table = init_set if pos == 0 else cont_set
            for length in range(len(w) - pos, 0, -1):
                if w[pos:pos + length] in table:
                    core = w[pos:pos + length]
                    toks.append(core if pos == 0 else CONT + core)
                    pos += length
                    break
            else:
                toks = [unk]
                break
        out[w] = toks if w else [unk]
    return out
