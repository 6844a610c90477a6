"""Distributed BPE merge-rule training (Sennrich et al. 2016) — the
tokenizer-training pass of an LLM data pipeline, run where the corpus
lives instead of sampling it down to one machine.

Architecture (why it scales where the textbook loop doesn't):
  * ONE pass over the corpus builds the word-frequency table (groupBy word,
    map-side combined — the exchange carries one row per DISTINCT word).
    Everything after runs on that table, which is vocabulary-sized
    (~10^8 rows at 100 TB), never corpus-sized.
  * Each of the k merge iterations is two vocabulary-sized steps:
    (1) adjacent-pair counts — an in-row zip_with over the symbol array,
        exploded, then a freq-weighted groupBy(pair) with partial
        aggregation; (2) the argmax pair (count desc, pair asc — fully
        deterministic) crossJoin-broadcast back, and the merge applied as
        an in-row LEFT-TO-RIGHT fold (F.aggregate) over each word's
        symbols. No corpus re-tokenization, no driver-resident vocab;
        the only driver traffic is the 1-row argmax per iteration.
  * The symbol table is persisted per iteration (the pagerank reuse
    pattern, operators/graph.py): plans stay shallow on top of the cached
    relation instead of growing k deep.

The greedy fold reproduces classic BPE merge semantics including
overlapping runs: merging (a,a) over 'aaaa' yields [aa, aa]; over 'aaa'
yields [aa, a] — because a just-merged token can't be the left side of the
same merge again within that scan.

min_freq prunes the long tail of the word table before iterating (the
standard practical cut; at 100-TB scale the tail is hapax noise that can
never win an argmax anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freq_table(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over the whole corpus — the single corpus-sized pass."""
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    wf = words.groupBy("word").agg(F.count("*").alias("freq"))
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    return wf


def _initial_symbols(word):
    """Character symbols + the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _pair_counts(symtab: DataFrame) -> DataFrame:
    s = F.col("syms")
    n = F.size(s)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(s, 1, n - 1),
            F.slice(s, 2, n - 1),
            lambda a, b: F.struct(a.alias("left"), b.alias("right")),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        symtab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(symtab: DataFrame, left_col, right_col) -> DataFrame:
    """Greedy left-to-right merge of adjacent (left,right) via an in-row
    fold: if the accumulator's last symbol is `left` (and was not itself
    produced by this scan's merge) and the incoming symbol is `right`,
    replace the last with left||right, else append."""
    a, b = left_col, right_col
    merged = F.concat(a, b)

    def step(acc, x):
        can = (
            (F.size(acc["out"]) > 0)
            & ~acc["last_merged"]
            & (F.element_at(acc["out"], -1) == a)
            & (x == b)
        )
        return F.struct(
            F.when(
                can,
                F.concat(
                    F.slice(acc["out"], 1, F.size(acc["out"]) - 1),
                    F.array(merged),
                ),
            )
            .otherwise(F.concat(acc["out"], F.array(x)))
            .alias("out"),
            can.alias("last_merged"),
        )

    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("last_merged"),
    )
    folded = F.aggregate(F.col("syms"), zero, step)
    return symtab.withColumn("syms", folded["out"])


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    min_freq: int = 1,
) -> DataFrame:
    """Train `n_merges` BPE merge rules on the corpus; returns a DataFrame
    (rank, left, right, merged, cnt) in merge order — the merges.txt of a
    standard BPE tokenizer. Deterministic: argmax ties break on
    (left, right) ascending."""
    spark = df.sparkSession
    symtab = (
        word_freq_table(df, text_col, min_freq)
        .select(_initial_symbols(F.col("word")).alias("syms"), "freq")
        .persist()
    )
    symtab.count()
    out_rows = []
    for rank in range(n_merges):
        best = (
            _pair_counts(symtab)
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["left"], best[0]["right"], best[0]["cnt"]
        out_rows.append((rank, l, r, l + r, c))
        nxt = _apply_merge(symtab, F.lit(l), F.lit(r)).persist()
        nxt.count()
        symtab.unpersist()
        symtab = nxt
    symtab.unpersist()
    return spark.createDataFrame(
        out_rows, "rank long, left string, right string, merged string, cnt long"
    )


def encode_words(words: DataFrame, merges: list[tuple[str, str]],
                 word_col: str = "word") -> DataFrame:
    """(word, tokens) — apply the trained merges to each word, IN RANK
    ORDER, each as the same greedy left-to-right in-row fold training used.

    One pass in rank order is exact BPE encoding: a merge's operands are
    symbols produced only by LOWER-rank merges, and merging never makes two
    pre-existing symbols newly adjacent, so an earlier merge can never
    become applicable again after a later one runs.  The k folds chain as
    nested column expressions — zero shuffles, zero joins, JVM-side
    higher-order functions, no Python in the loop."""
    out = words.withColumn("syms", _initial_symbols(F.col(word_col)))
    for left, right in merges:
        out = _apply_merge(out, F.lit(left), F.lit(right))
    return out.select(word_col, F.col("syms").alias("tokens"))


def bpe_encode(df: DataFrame, merges_df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Tokenize the corpus with trained merges: (id, n_tokens, tokens).

    Scale design — encode the VOCABULARY, not the corpus: the merge folds
    run once per DISTINCT word (vocabulary-sized, Heaps' law: ~10^8 rows at
    100 TB, not 10^13 word occurrences), then the (word -> tokens) map
    joins back to the corpus' (doc, pos, word) explode and documents
    reassemble by position.  The map join broadcasts when the vocab fits
    (Spark's auto threshold / AQE decides from its actual size); the
    reassembly is ONE groupBy(id) shuffle carrying token arrays, never raw
    text.  merges_df is the model-sized training output (rank, left,
    right) — collected driver-side like every other model here."""
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").select("left", "right").collect()
    ]
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    vocab_map = encode_words(words.select("word").distinct(), merges)
    return (
        words.join(vocab_map, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tokens"))
                    ),
                    lambda s: s["tokens"],
                )
            ).alias("tokens")
        )
        .select(id_col, F.size("tokens").alias("n_tokens"), "tokens")
    )


def encode_reference(texts: list[str],
                     merges: list[tuple[str, str]]) -> list[list[str]]:
    """Independent sequential BPE encoder (textbook while-loop per merge)
    for golden tests — shares NO code with the distributed path."""
    out = []
    for t in texts:
        toks: list[str] = []
        for w in t.split(" "):
            if not w:
                continue
            syms = list(w) + [END_OF_WORD]
            for l, r in merges:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            toks.extend(syms)
        out.append(toks)
    return out


def train_bpe_reference(
    texts: list[str], n_merges: int = 16, min_freq: int = 1
) -> list[tuple[int, str, str, str, int]]:
    """Independent sequential BPE (the textbook dict loop) for golden
    tests — shares NO code with the distributed path."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {
        tuple(list(w) + [END_OF_WORD]): f
        for w, f in wf.items()
        if f >= min_freq
    }
    out = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, l + r, c))
        nv = {}
        for syms, f in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nv[tuple(res)] = nv.get(tuple(res), 0) + f
        vocab = nv
    return out
