"""Hypothesis property fuzz over the pure total functions at the engine's
trust boundaries (SURVEY.md §5): the canonicalizer, the HTML extractors,
and the integer PageRank recurrence. These are the functions arbitrary web
bytes reach FIRST — each must be total (never raise), deterministic, and
self-consistent; the seeded fuzz in test_extract.py covers the generator's
adversarial corpus, hypothesis covers the inputs nobody thought to seed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from layerg_crawler_v2_spark.functions.canon import canonicalize, resolve
from layerg_crawler_v2_spark.functions.extract import (
    _OutlinkExtractor,
    extract_anchors,
    extract_outlinks,
    extract_text,
)

# HTML-ish soup: heavy on the bytes that drive parser/fast-path divergence
_MARKUP = st.text(
    alphabet='<>ab href="\'=/ &;!-x\n\t' + "c0.:#?%",
    max_size=300,
)
_URLISH = st.text(
    alphabet="htps:/.abc01%~?#[]@!$&'()*+,;=-_ABC😀 ",
    max_size=120,
)


@given(_URLISH)
@settings(max_examples=400, deadline=None)
def test_canonicalize_total_and_idempotent(u):
    c = canonicalize(u)
    if c is not None:
        assert isinstance(c, str)
        # canonical form is a fixed point
        assert canonicalize(c) == c


@given(_URLISH, _URLISH)
@settings(max_examples=300, deadline=None)
def test_resolve_total_and_canonical(base, href):
    r = resolve(base, href)
    if r is not None:
        # resolve() promises canonicalized output
        assert canonicalize(r) == r


def _parser_outlinks(html: bytes) -> list[str]:
    p = _OutlinkExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return p.hrefs


@given(_MARKUP)
@settings(max_examples=400, deadline=None)
def test_outlinks_fast_path_always_agrees_with_parser(s):
    html = s.encode("utf-8")
    assert extract_outlinks(html) == _parser_outlinks(html)


@given(_MARKUP)
@settings(max_examples=300, deadline=None)
def test_anchor_hrefs_project_to_outlinks(s):
    html = s.encode("utf-8")
    assert [h for h, _ in extract_anchors(html)] == extract_outlinks(html)


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_extract_text_total_on_arbitrary_bytes(b):
    t = extract_text(b)
    assert t is None or isinstance(t, str)
    # determinism: same bytes, same text
    assert extract_text(b) == t


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 4),
)
@settings(max_examples=200, deadline=None)
def test_pagerank_recurrence_mass_bounded(edges, iters):
    from tests.test_graph import py_pagerank

    rank = py_pagerank(sorted(set(edges)), iterations=iters)
    total = sum(rank.values())
    assert 0 < total <= 1_000_000_000_000
    assert all(r > 0 for r in rank.values())


# --- r4s9 additions: canonical/hreflang extractors, winnow, apportionment ---

@given(_MARKUP)
@settings(max_examples=300, deadline=None)
def test_canonical_and_hreflang_total_on_soup(s):
    from layerg_crawler_v2_spark.functions.extract import (
        extract_canonical,
        extract_hreflang,
    )

    b = s.encode("utf-8", errors="replace")
    c = extract_canonical(b)
    assert c is None or isinstance(c, str)
    for lang, href in extract_hreflang(b):
        assert isinstance(lang, str) and isinstance(href, str)


@given(st.text(alphabet="abc ", max_size=80))
@settings(max_examples=200, deadline=None)
def test_winnow_reference_properties(t):
    """The sequential winnow reference (mirrored by the Spark fold in
    tests/test_winnow.py) is total, selects >= 1 fingerprint whenever a
    k-gram exists, never selects more than one per window start, and every
    selected position is a valid gram start."""
    from tests.test_winnow import _ref_winnow, K, W

    sel = _ref_winnow(t)
    n_g = max(len(t) - K + 1, 0)
    if n_g == 0:
        assert sel == set()
        return
    n_win = max(n_g - W + 1, 1)
    assert 1 <= len(sel) <= n_win
    for pos, _ in sel:
        assert 1 <= pos <= n_g


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
        unique_by=lambda kv: kv[0],
    ),
    st.integers(0, 5_000),
)
@settings(max_examples=200, deadline=None)
def test_apportionment_invariants_pure(weights, total):
    """Pure replica of allocate_budget's integer recurrence (same BIGINT
    div/mod; the Spark twin is pinned by tests/test_budget.py): quotas sum
    EXACTLY to the budget when any weight is positive, each quota is within
    1 of its exact proportional share, and zero-weight keys get zero."""
    W = sum(w for _, w in weights if w > 0)
    qf = {k: (total * w) // W if W and w > 0 else 0 for k, w in weights}
    rem = {k: (total * w) % W if W and w > 0 else 0 for k, w in weights}
    leftover = total - sum(qf.values()) if W else 0
    order = sorted(weights, key=lambda kv: (-rem[kv[0]], kv[0]))
    quota = dict(qf)
    for k, _ in order[:leftover]:
        if rem[k] > 0:
            quota[k] += 1
    if W:
        assert sum(quota.values()) == total
        for k, w in weights:
            if w > 0:
                exact = total * w / W
                assert exact - 1 < quota[k] < exact + 1
            else:
                assert quota[k] == 0
    else:
        assert all(v == 0 for v in quota.values())
