"""DOM tag-path signatures + template clustering: structure/text
separation, recovery, and cluster grouping."""

from __future__ import annotations

import pytest

from layerg_crawler_v2_spark.functions.extract import structure_signature


def sig(s: str) -> str | None:
    return structure_signature(s.encode())


def test_same_template_different_text_same_sig():
    a = "<html><body><nav>m</nav><div><p>one two</p><p>x</p></div></body></html>"
    b = "<html><body><nav>other</nav><div><p>entirely</p><p>new words</p></div></body></html>"
    assert sig(a) == sig(b) == "html/body/div/p*2\nhtml/body/nav*1"


def test_structure_change_changes_sig():
    a = "<html><body><p>x</p></body></html>"
    b = "<html><body><div><p>x</p></div></body></html>"
    assert sig(a) != sig(b)


def test_script_and_whitespace_invisible():
    a = "<body><script>var x='<p>t</p>'</script>  \n <p>x</p></body>"
    assert sig(a) == "body/p*1"


def test_void_tags_dont_push():
    assert sig("<body><p>a<br>b<img src=i>c</p></body>") == "body/p*3"


def test_unclosed_recovery():
    # an unmatched </div> must not pop <body>
    assert sig("<body></div><p>x</p></body>") == "body/p*1"


def test_none_total():
    assert structure_signature(None) is None
    assert structure_signature(b"") == ""


def _pages(spark):
    rows = []
    for h in ("a.test", "b.test"):
        for i in range(4):
            t = i % 2
            body = (
                f"<html><body><nav>m</nav><div><p>doc {h}{i}</p>"
                f"<p>more</p></div></body></html>"
                if t == 0
                else f"<html><body><article><h1>t {h}{i}</h1>"
                f"<p>body</p></article></body></html>"
            )
            rows.append((f"https://{h}/p/{i}", body.encode()))
    return spark.createDataFrame(rows, "url string, html binary")


def test_template_clusters(spark):
    from layerg_crawler_v2_spark.operators.templates import template_clusters

    got = {
        (r["host"], r["n_pages"], r["example_url"])
        for r in template_clusters(_pages(spark), min_pages=2).collect()
    }
    assert got == {
        ("a.test", 2, "https://a.test/p/0"),
        ("a.test", 2, "https://a.test/p/1"),
        ("b.test", 2, "https://b.test/p/0"),
        ("b.test", 2, "https://b.test/p/1"),
    }


def test_hash_families_agree_on_grouping(spark):
    from layerg_crawler_v2_spark.operators.templates import (
        page_structure_sigs,
    )

    xx = page_structure_sigs(_pages(spark), hash_fn="xxhash64").collect()
    md = page_structure_sigs(_pages(spark), hash_fn="md5").collect()
    fx = {}
    fm = {}
    for r in xx:
        fx.setdefault(r["struct_fp"], set()).add(r["url"])
    for r in md:
        fm.setdefault(r["struct_fp"], set()).add(r["url"])
    assert sorted(map(sorted, fx.values())) == sorted(map(sorted, fm.values()))
