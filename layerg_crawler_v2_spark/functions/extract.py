"""HTML -> text extraction and outlink discovery, byte-identical per url.

Graft analog of the reference's generated typed decoders — pure functions from
raw log bytes to typed structs (generated/eventhandlers/event_handlers.go:
48-82, 99-104: fixed-offset byte slicing of `log.Data`). Here the raw bytes
are HTML and the decode is deterministic tag-stripping; the input_hint
requires `extract(html) == pages.text` byte-identically per url.

Determinism rules (SURVEY.md §7 hard-item (c)):
  * operate on `bytes`, decode UTF-8 with errors="replace" (fixed replacement
    char, never platform-dependent);
  * no whitespace collapsing — the generator emits structural tags with zero
    inter-tag whitespace so stripping is exact;
  * html.unescape from the stdlib (pinned behavior, pure).

All per-row work is inside vectorized pandas UDFs (no per-row Python UDFs).
"""

from __future__ import annotations

import html as _htmlmod
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# blocks dropped wholesale (content-free for a crawler): head, script, style, nav
# KNOWN LIMIT: the non-greedy regex stops at the FIRST closing tag, so nested
# same-name blocks (<nav><nav></nav>X</nav>) leak the tail — fine for the
# controlled generator whose pages never nest these (datagen.render_html),
# and deterministic either way; a real-HTML deployment swaps this stage for a
# proper tree parser behind the same pandas-UDF signature.
_DROP_RE = re.compile(
    rb"<(head|script|style|nav)\b[^>]*>.*?</\1\s*>",
    re.S | re.I,
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_TAG_RE = re.compile(rb"<[^>]*>")
_HREF_RE = re.compile(
    rb"""<a\b[^>]*\bhref\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.I
)


def extract_text(html: bytes | None) -> str | None:
    """Strip head/script/style/nav + comments + tags, decode entities."""
    if html is None:
        return None
    stripped = _COMMENT_RE.sub(b"", html)
    stripped = _DROP_RE.sub(b"", stripped)
    stripped = _TAG_RE.sub(b"", stripped)
    return _htmlmod.unescape(stripped.decode("utf-8", errors="replace"))


def extract_outlinks(html: bytes | None) -> list[str]:
    """All <a href> values, in document order, as raw (un-resolved) strings."""
    if html is None:
        return []
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        raw = m.group(1) if m.group(1) is not None else m.group(2)
        out.append(raw.decode("utf-8", errors="replace"))
    return out


@pandas_udf(StringType())
def extract_text_udf(htmls: pd.Series) -> pd.Series:
    return htmls.map(extract_text, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def extract_outlinks_udf(htmls: pd.Series) -> pd.Series:
    return htmls.map(extract_outlinks, na_action="ignore")
