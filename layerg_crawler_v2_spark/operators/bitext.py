"""Bitext candidate mining — parallel-corpus pairs from i18n clusters.

Multilingual pretraining and MT data pipelines mine PARALLEL text from the
web (CCMatrix/CCAligned lineage): pages that are translations of each
other. The high-precision seed is the site's own declaration — hreflang
alternates (functions/extract.py extract_hreflang -> connected-component
i18n clusters) — refined by the classic length-ratio gate (the sentence-
length correlation underlying Gale & Church '93: translations have
strongly correlated lengths; a 5:1 doc pair is NOT a translation). This
operator does CANDIDATE MINING, not alignment: output pairs feed a
downstream aligner/encoder, exactly as CCAligned's document-pair stage
feeds its sentence stage.

The ratio gate is exact integer arithmetic (the repo's threshold
discipline):  q * len_a <= p * len_b  AND  q * len_b <= p * len_a
(p/q >= 1, e.g. 2/1 keeps pairs within 2x of each other; zero-length
docs never pair). Shape: one self-join on cluster_id — cluster-size
bounded (site language sets, typically < 50), never corpus-wide — and a
codegen filter; one exchange total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bitext_candidates(
    docs: DataFrame,
    ratio_num: int = 2,
    ratio_den: int = 1,
    id_col: str = "url",
    lang_col: str = "lang",
    len_col: str = "n_tokens",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """(cluster_id, url_a, lang_a, url_b, lang_b, len_a, len_b) for
    cross-language pairs within a cluster passing the length-ratio gate.
    Pairs are emitted once (lang_a < lang_b) and same-language pairs
    are excluded — a page and its mobile twin are dedup's business,
    not bitext.  lang_a < lang_b alone canonicalizes each pair: the
    langs always differ, so no id tie-break is needed."""
    if ratio_num < ratio_den or ratio_den < 1:
        raise ValueError("ratio must be >= 1 (p/q with p >= q >= 1)")
    a = docs.select(
        F.col(cluster_col).alias("cluster_id"),
        F.col(id_col).alias("url_a"),
        F.col(lang_col).alias("lang_a"),
        F.col(len_col).alias("len_a"),
    )
    b = docs.select(
        F.col(cluster_col).alias("cluster_id"),
        F.col(id_col).alias("url_b"),
        F.col(lang_col).alias("lang_b"),
        F.col(len_col).alias("len_b"),
    )
    p, q = ratio_num, ratio_den
    return (
        a.join(b, "cluster_id")
        .filter(
            (F.col("lang_a") < F.col("lang_b"))
            & (F.col("len_a") > 0)
            & (F.col("len_b") > 0)
            & (F.col("len_a") * q <= F.col("len_b") * p)
            & (F.col("len_b") * q <= F.col("len_a") * p)
        )
        .select(
            "cluster_id",
            "url_a",
            "lang_a",
            "len_a",
            "url_b",
            "lang_b",
            "len_b",
        )
    )
