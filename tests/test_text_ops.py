"""Unit tests for the round-4 LLM-pipeline text operators: PII scrubbing,
repetition/diversity signals, cross-doc shingle coverage, and the WARC
round-trip registry entry. The DuckDB value-parity for the oracled entries
lives in test_oracle_parity.py; these tests pin edge-case semantics the
parity sweep can't distinguish (no-PII docs, overlap precedence, empty/short
inputs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from layerg_crawler_v2_spark.functions.text import (
    dup_word_fraction,
    email_count,
    mean_word_length,
    phone_count,
    scrub_pii,
)


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        email_count(F.col("t")).alias("e"),
        phone_count(F.col("t")).alias("p"),
        scrub_pii(F.col("t")).alias("s"),
    ).first()


def test_pii_scrub_basic(spark):
    r = _one(spark, "mail a.b+c@sub.example.org or call 555-0042 today")
    assert (r.e, r.p) == (1, 1)
    assert r.s == "mail <EMAIL> or call <PHONE> today"


def test_pii_scrub_no_pii_is_identity(spark):
    text = "plain words with digits 1234 and dash-word but no contacts"
    r = _one(spark, text)
    assert (r.e, r.p) == (0, 0)
    assert r.s == text


def test_pii_scrub_multiple_and_boundaries(spark):
    # Two emails, one phone; 12345-6789 must NOT match (word boundary:
    # [0-9]{3}-[0-9]{4} inside a longer digit run fails \b on both ends).
    r = _one(spark, "a@x.io b@y.co 555-1234 zip 12345-67890")
    assert (r.e, r.p) == (2, 1)
    assert r.s.count("<EMAIL>") == 2 and r.s.count("<PHONE>") == 1
    assert "12345-67890" in r.s


def test_pii_scrub_email_first_precedence(spark):
    # The local part may contain a phone-shaped run; scrubbing emails first
    # removes it before the phone pass can see it.
    r = _one(spark, "reach 555-1234@example.com please")
    assert (r.e, r.p) == (1, 1)  # counts run on the RAW text independently
    assert r.s == "reach <EMAIL> please"


def test_repetition_signals_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a bb a ccc"), (2, "x x x x")], "i int, t string"
    )
    rows = {
        r.i: r
        for r in df.select(
            "i",
            F.round(dup_word_fraction(F.col("t")), 6).alias("d"),
            F.round(mean_word_length(F.col("t")), 6).alias("m"),
        ).collect()
    }
    # doc 1: 4 words, 3 distinct -> dup 0.25; mean len (1+2+1+3)/4 = 1.75
    assert rows[1].d == pytest.approx(0.25)
    assert rows[1].m == pytest.approx(1.75)
    # doc 2: 4 words, 1 distinct -> dup 0.75; mean len 1.0
    assert rows[2].d == pytest.approx(0.75)
    assert rows[2].m == pytest.approx(1.0)


def test_repetition_single_word_doc(spark):
    df = spark.createDataFrame([("word",)], "t string")
    r = df.select(
        dup_word_fraction(F.col("t")).alias("d"),
        mean_word_length(F.col("t")).alias("m"),
    ).first()
    assert r.d == 0.0 and r.m == 4.0


def test_ngram_coverage_disjoint_and_duplicated(spark, sf_dir):
    # Identical twin docs -> coverage 1.0; a doc sharing no shingle -> 0.0.
    import __spark_entry__ as em

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    from layerg_crawler_v2_spark.functions.text import word_shingles

    sh = df.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias("s"),
    )
    counts = sh.groupBy("s").agg(F.count_distinct("doc_id").alias("nd"))
    cov = {
        r.doc_id: r.f
        for r in sh.join(counts, "s")
        .groupBy("doc_id")
        .agg(F.avg(F.when(F.col("nd") > 1, 1.0).otherwise(0.0)).alias("f"))
        .collect()
    }
    assert cov[1] == 1.0 and cov[2] == 1.0 and cov[3] == 0.0
    assert em is not None


def test_warc_roundtrip_entry_lossless(spark, sf_dir):
    import __spark_entry__ as em

    from layerg_crawler_v2_spark.datagen import build_pages

    out = em.queries()["warc_segment_roundtrip"](spark, sf_dir)
    pages = build_pages(spark, sf_dir)
    want = pages.select(
        "url",
        F.col("warc_ts").cast("string").alias("warc_ts_s"),
        F.length("html").alias("html_len"),
        F.xxhash64("html").alias("html_hash"),
    )
    assert out.exceptAll(want).count() == 0
    assert want.exceptAll(out).count() == 0


def test_nfc_normalize_udf(spark):
    from layerg_crawler_v2_spark.functions.text import nfc_normalize_udf

    nfc = nfc_normalize_udf()
    df = spark.createDataFrame(
        [(1, "Café"), (2, "Café"), (3, "plain"), (4, None)],
        "i long, t string",
    )
    got = {r["i"]: r["n"] for r in df.select("i", nfc("t").alias("n")).collect()}
    assert got[1] == got[2] == "Café"  # decomposed composes to NFC
    assert got[3] == "plain" and got[4] is None


def test_doc_chunk_overlap_coverage(spark, sf_dir):
    """Every word is covered exactly once outside the 16-word overlaps:
    sum(n_words) - 16*(n_chunks-1) == len(words) per doc; interior chunks
    are exactly 64 words; the tail chunk always exceeds the overlap."""
    import duckdb

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["doc_chunk_overlap"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_words"]))
    lens = dict(
        duckdb.sql(
            "SELECT doc_id, len(list_filter(string_split(text,' '), x -> x <> ''))"
            f" FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    assert set(by_doc) == set(lens)
    for doc, chunks in by_doc.items():
        chunks.sort()
        assert [i for i, _ in chunks] == list(range(len(chunks)))
        n_words = [n for _, n in chunks]
        assert all(n == 64 for n in n_words[:-1])
        if lens[doc] > 16:
            assert n_words[-1] > 16  # tail never shrinks below the overlap
        assert sum(n_words) - 16 * (len(chunks) - 1) == lens[doc]


# --------------------------------------------------------------------------
# token-window chunking
# --------------------------------------------------------------------------

def test_chunks_match_python_reference(spark):
    from layerg_crawler_v2_spark.functions.text import token_window_chunks

    def ref(text, w, s):
        toks = text.split()
        out = []
        k = 0
        while k * s < len(toks):
            seg = toks[k * s : k * s + w]
            out.append((k, len(seg), " ".join(seg)))
            k += 1
        return out

    rows = [
        (1, " ".join(f"w{i}" for i in range(17))),
        (2, "single"),
        (3, ""),
        (4, None),
        (5, "  spaced   out\ttokens \n here  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in token_window_chunks(df, window=6, stride=4).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        )
    for did, text in rows:
        exp = ref(text, 6, 4) if text else []
        assert sorted(got.get(did, [])) == exp, did


def test_chunk_overlap_reconstructs_document(spark):
    from layerg_crawler_v2_spark.functions.text import token_window_chunks

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in token_window_chunks(df, window=40, stride=30).collect()
    )
    # stride-prefix of each chunk, plus the full final chunk, tiles the doc
    parts = [c.split()[:30] for _, c in rows[:-1]] + [rows[-1][1].split()]
    flat = [t for p in parts for t in p]
    assert flat == text.split()


def test_chunks_rejects_bad_params(spark):
    import pytest as _pt

    from layerg_crawler_v2_spark.functions.text import token_window_chunks

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for w, s in ((0, 1), (4, 0), (4, 5)):
        with _pt.raises(ValueError):
            token_window_chunks(df, window=w, stride=s)


def test_chunks_plan_no_exchange(spark):
    from layerg_crawler_v2_spark.functions.text import token_window_chunks

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        token_window_chunks(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan
