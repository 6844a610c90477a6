"""URL tracking-parameter mining (operators/urlparams.py) on hand-built
evidence sets; the registry entry's oracle parity lives in
test_oracle_parity.py."""

from __future__ import annotations

from layerg_crawler_v2_spark.operators.urlparams import url_param_noise


def _mine(spark, rows):
    df = spark.createDataFrame(rows, "url string, content_hash string")
    return {
        (r.host, r.param): (
            r.n_urls,
            r.n_multi_groups,
            r.n_collapsible,
            r.noise_score,
        )
        for r in url_param_noise(df).collect()
    }


def test_tracker_vs_meaningful_param(spark):
    rows = [
        ("https://a.com/x?id=1&utm=p", "c1"),
        ("https://a.com/x?id=1&utm=q", "c1"),  # utm varies, content same
        ("https://a.com/x?id=2&utm=p", "c2"),  # id varies, content differs
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "utm")] == (3, 1, 1, 1.0)
    assert got[("a.com", "id")] == (3, 1, 0, 0.0)


def test_param_order_insensitive_grouping(spark):
    # same residual after stripping utm, despite different param order
    rows = [
        ("https://a.com/x?utm=1&id=7", "c"),
        ("https://a.com/x?id=7&utm=2", "c"),
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "utm")] == (2, 1, 1, 1.0)


def test_untestable_param_scores_null(spark):
    # 'id' only ever appears with one url per residual: never testable
    rows = [
        ("https://a.com/x?id=1", "c1"),
        ("https://a.com/y?id=1", "c2"),
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "id")] == (2, 0, 0, None)


def test_no_query_urls_contribute_nothing(spark):
    rows = [
        ("https://a.com/plain", "c0"),
        ("https://a.com/x?s=1", "c1"),
    ]
    got = _mine(spark, rows)
    assert set(got) == {("a.com", "s")}


def test_hosts_isolated(spark):
    rows = [
        ("https://a.com/x?t=1", "c"),
        ("https://a.com/x?t=2", "c"),
        ("https://b.com/x?t=1", "d1"),
        ("https://b.com/x?t=2", "d2"),
    ]
    got = _mine(spark, rows)
    assert got[("a.com", "t")][3] == 1.0
    assert got[("b.com", "t")][3] == 0.0


# --------------------------------------------------------------------------
# DUST rule mining
# --------------------------------------------------------------------------

def _dust_df(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_dust_index_html_rule(spark):
    from layerg_crawler_v2_spark.operators.urlparams import dust_rules

    rows = [
        (f"https://a.test/p/{i}/", f"c{i}") for i in range(5)
    ] + [
        (f"https://a.test/p/{i}/index.html", f"c{i}") for i in range(5)
    ]
    got = {
        (r["rule_from"], r["rule_to"], r["support"])
        for r in dust_rules(_dust_df(spark, rows), min_support=2).collect()
    }
    assert got == {("index.html", "", 5)}


def test_dust_prefix_rule_and_host_spread(spark):
    from layerg_crawler_v2_spark.operators.urlparams import dust_rules

    rows = []
    for h in ("a.test", "b.test"):
        for i in range(3):
            rows.append((f"https://{h}/s/{i}", f"{h}{i}"))
            rows.append((f"https://{h}/print/s/{i}", f"{h}{i}"))
    out = dust_rules(_dust_df(spark, rows), min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["rule_from"], r["rule_to"]) == ("print/", "")
    assert r["support"] == 6 and r["n_hosts"] == 2


def test_dust_same_host_only(spark):
    from layerg_crawler_v2_spark.operators.urlparams import dust_rules

    rows = [
        ("https://a.test/x", "same"),
        ("https://b.test/x/index.html", "same"),
    ]
    assert dust_rules(_dust_df(spark, rows), min_support=1).count() == 0


def test_dust_shorter_side_is_target(spark):
    from layerg_crawler_v2_spark.operators.urlparams import dust_rules

    rows = [
        ("https://a.test/story_1.html", "c"),
        ("https://a.test/story/1", "c"),
    ]
    out = dust_rules(_dust_df(spark, rows), min_support=1).collect()
    assert len(out) == 1
    assert len(out[0]["rule_from"]) >= len(out[0]["rule_to"])


def test_dust_matches_python_reference(spark):
    from layerg_crawler_v2_spark.operators.urlparams import dust_rules

    def py_rules(rows, min_support):
        from collections import defaultdict
        from urllib.parse import urlsplit

        groups = defaultdict(set)
        for url, fp in rows:
            groups[(urlsplit(url).netloc, fp)].add(url)
        counts = defaultdict(lambda: [0, set()])
        for (host, _), urls in groups.items():
            us = sorted(urls)
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    u1, u2 = us[i], us[j]
                    n = min(len(u1), len(u2))
                    lcp = 0
                    while lcp < n and u1[lcp] == u2[lcp]:
                        lcp += 1
                    lcs = 0
                    while lcs < n and u1[len(u1) - lcs - 1] == u2[len(u2) - lcs - 1]:
                        lcs += 1
                    ov = min(lcs, len(u1) - lcp, len(u2) - lcp)
                    m1 = u1[lcp : len(u1) - ov]
                    m2 = u2[lcp : len(u2) - ov]
                    if (len(m1), m1) < (len(m2), m2):
                        key = (m2, m1)
                    else:
                        key = (m1, m2)
                    counts[key][0] += 1
                    counts[key][1].add(host)
        return {
            (k[0], k[1], v[0], len(v[1]))
            for k, v in counts.items()
            if v[0] >= min_support
        }

    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        h = f"h{rng.randrange(3)}.test"
        fp = f"fp{rng.randrange(12)}"
        path = "/".join(
            rng.choice(["a", "bb", "ccc", "dd"])
            for _ in range(rng.randrange(1, 4))
        )
        rows.append((f"https://{h}/{path}", fp))
    got = {
        (r["rule_from"], r["rule_to"], r["support"], r["n_hosts"])
        for r in dust_rules(_dust_df(spark, rows), min_support=1).collect()
    }
    assert got == py_rules(set(rows), 1)
