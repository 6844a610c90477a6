"""Bitext candidate mining: ratio gate exactness, cross-language-only,
single emission, python-reference parity."""

from __future__ import annotations

import pytest

from layerg_crawler_v2_spark.operators.bitext import bitext_candidates


ROWS = [
    # cluster 1: en/de/fr translations with correlated lengths
    ("https://a.test/en", "en", 100, 1),
    ("https://a.test/de", "de", 110, 1),
    ("https://a.test/fr", "fr", 95, 1),
    # cluster 2: en page and a 5x-longer "translation" (fails the gate)
    ("https://b.test/en", "en", 40, 2),
    ("https://b.test/ja", "ja", 210, 2),
    # cluster 3: two same-language variants (never bitext)
    ("https://c.test/en", "en", 50, 3),
    ("https://c.test/en2", "en", 52, 3),
    # cluster 4: zero-length doc never pairs
    ("https://d.test/en", "en", 0, 4),
    ("https://d.test/es", "es", 30, 4),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "url string, lang string, n_tokens long, cluster_id long"
    )


def test_pairs_match_reference(spark, docs):
    def ref(ratio_p, ratio_q):
        out = set()
        for u1, l1, n1, c1 in ROWS:
            for u2, l2, n2, c2 in ROWS:
                if c1 != c2 or l1 >= l2 or not n1 or not n2:
                    continue
                if n1 * ratio_q <= n2 * ratio_p and n2 * ratio_q <= n1 * ratio_p:
                    out.add((c1, u1, l1, u2, l2))
        return out

    got = {
        (r["cluster_id"], r["url_a"], r["lang_a"], r["url_b"], r["lang_b"])
        for r in bitext_candidates(docs, 2, 1).collect()
    }
    assert got == ref(2, 1)
    assert got == {
        (1, "https://a.test/de", "de", "https://a.test/en", "en"),
        (1, "https://a.test/de", "de", "https://a.test/fr", "fr"),
        (1, "https://a.test/en", "en", "https://a.test/fr", "fr"),
    }


def test_wider_ratio_admits_cluster2(spark, docs):
    got = {
        r["cluster_id"]
        for r in bitext_candidates(docs, 6, 1).collect()
    }
    assert 2 in got and 3 not in got and 4 not in got


def test_rejects_bad_ratio(spark, docs):
    with pytest.raises(ValueError):
        bitext_candidates(docs, 1, 2)
