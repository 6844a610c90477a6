"""HTML -> Markdown rendering: the structured-text view of a page.

LLM-pipeline operator beyond the reference (the Go reference stores raw
html + flat text; `generated/eventhandlers/event_handlers.go:48-245` is its
typed-decode analog): modern pretraining corpora keep document STRUCTURE —
headings, lists, links, emphasis, code blocks — because markup teaches the
model formatting (e.g. every "HTML to markdown" pass in trafilatura /
resiliparse pipelines). This is the tree-serializer complement of
functions/extract.py's flat `extract_text`: the same html.parser tree
discipline (drop head/script/style/nav, decode charrefs once, recover from
malformed nesting), emitting GitHub-flavored-Markdown-shaped text.

Rendering policy (deterministic, documented — a readable text rendering,
NOT guaranteed re-parseable CommonMark):
  * h1..h6 -> `#`*n; p/div/section/... -> paragraph; blocks joined by one
    blank line;
  * ul/ol -> `- ` / `1. ` items, 2-space indent per nesting level, ol
    counters per level;
  * blockquote -> `> ` per depth, applied to every line of inner blocks;
  * pre -> fenced ``` block, content verbatim (no whitespace collapse),
    markup inside pre ignored;
  * a[href] -> `[text](href)`; img[src] -> `![alt](src)`;
  * b/strong -> `**`, i/em -> `*`, code -> backtick; unclosed inline
    markers close at the enclosing block boundary (the browser-recovery
    analog); stray closers are ignored;
  * <br> -> hard line break inside the block; <hr> -> `---`;
  * whitespace in flow content collapses to single spaces per block (the
    HTML rendering rule); text is NOT markdown-escaped (policy above).

Scale shape: one vectorized Arrow pass per document (the extract.py UDF
family), zero shuffle, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DROP_TAGS = frozenset({"head", "script", "style", "nav"})
# generic paragraph-boundary tags (no special prefix)
_PARA_TAGS = frozenset(
    {
        "p",
        "div",
        "section",
        "article",
        "main",
        "aside",
        "header",
        "footer",
        "figure",
        "table",
        "tr",
        "form",
        "body",
        "html",
    }
)
_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_INLINE = {"b": "**", "strong": "**", "i": "*", "em": "*", "code": "`"}
_BR = "\x00"  # sentinel surviving whitespace collapse


class _MarkdownExtractor(HTMLParser):
    """Event-driven Markdown serializer over possibly-malformed HTML.

    Same recovery discipline as _TextExtractor/_BlockExtractor
    (functions/extract.py): drop-stack with innermost-match close for the
    drop set, depth counters for pre, tolerant pops everywhere else."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._blocks: list[str] = []
        self._cur: list[str] = []
        self._drop: list[str] = []
        self._lists: list[list] = []  # [tag, counter]
        self._quote = 0
        self._pre = 0
        self._pre_buf: list[str] = []
        self._prefix = ""
        self._inline: list[tuple[str, str]] = []
        self._links: list[str | None] = []

    # ---- block machinery -------------------------------------------------
    def _flush(self) -> None:
        # block boundary closes dangling inline context (browser recovery)
        while self._inline:
            self._cur.append(self._inline.pop()[1])
        while self._links:
            href = self._links.pop()
            if href is not None:
                self._cur.append(f"]({href})")
        raw = "".join(self._cur)
        self._cur = []
        head = self._prefix
        self._prefix = ""
        text = re.sub(f" ?{_BR} ?", "\n", " ".join(raw.split())).strip("\n")
        if not text:
            return
        qp = "> " * self._quote
        lines = text.split("\n")
        self._blocks.append(
            "\n".join(
                qp + (head if i == 0 else "") + ln
                for i, ln in enumerate(lines)
                if ln or i == 0
            )
        )

    def _emit_pre(self) -> None:
        body = "".join(self._pre_buf).strip("\n")
        self._pre_buf = []
        qp = "> " * self._quote
        lines = ["```", *body.split("\n"), "```"]
        self._blocks.append("\n".join(qp + ln for ln in lines))

    # ---- parser events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop.append(tag)
            return
        if self._drop:
            return
        if self._pre:
            if tag == "pre":
                self._pre += 1
            return
        if tag == "pre":
            self._flush()
            self._pre = 1
        elif tag in _HEADINGS:
            self._flush()
            self._prefix = "#" * _HEADINGS[tag] + " "
        elif tag in ("ul", "ol"):
            self._flush()
            self._lists.append([tag, 0])
        elif tag == "li":
            self._flush()
            indent = "  " * max(len(self._lists) - 1, 0)
            if self._lists and self._lists[-1][0] == "ol":
                self._lists[-1][1] += 1
                self._prefix = f"{indent}{self._lists[-1][1]}. "
            else:
                self._prefix = f"{indent}- "
        elif tag == "blockquote":
            self._flush()
            self._quote += 1
        elif tag == "hr":
            self._flush()
            self._blocks.append("> " * self._quote + "---")
        elif tag == "br":
            self._cur.append(_BR)
        elif tag == "a":
            href = dict(attrs).get("href")
            self._links.append(href)
            if href is not None:
                self._cur.append("[")
        elif tag == "img":
            a = dict(attrs)
            if a.get("src"):
                self._cur.append(f"![{a.get('alt') or ''}]({a['src']})")
        elif tag in _INLINE:
            self._cur.append(_INLINE[tag])
            self._inline.append((tag, _INLINE[tag]))
        elif tag in _PARA_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            stack = self._drop
            if tag in stack:
                idx = len(stack) - 1 - stack[::-1].index(tag)
                del stack[idx:]
            return
        if self._drop:
            return
        if self._pre:
            if tag == "pre":
                self._pre -= 1
                if not self._pre:
                    self._emit_pre()
            return
        if tag in _HEADINGS or tag == "li" or tag in _PARA_TAGS:
            self._flush()
        elif tag in ("ul", "ol"):
            self._flush()
            if self._lists:
                self._lists.pop()
        elif tag == "blockquote":
            self._flush()
            if self._quote:
                self._quote -= 1
        elif tag == "a":
            if self._links:
                href = self._links.pop()
                if href is not None:
                    self._cur.append(f"]({href})")
        elif tag in _INLINE:
            if any(t == tag for t, _ in self._inline):
                while self._inline:
                    t, marker = self._inline.pop()
                    self._cur.append(marker)
                    if t == tag:
                        break

    def handle_data(self, data):
        if self._drop:
            return
        if self._pre:
            self._pre_buf.append(data)
        else:
            self._cur.append(data)

    def close(self) -> None:
        super().close()
        if self._pre:
            self._pre = 0
            self._emit_pre()
        self._flush()

    def markdown(self) -> str:
        return "\n\n".join(self._blocks)


def html_to_markdown(html: bytes | None) -> str | None:
    """Markdown-shaped text rendering of the page tree. Total on arbitrary
    bytes (utf-8 errors="replace", the extract.py determinism rules)."""
    if html is None:
        return None
    p = _MarkdownExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return p.markdown()


@pandas_udf(StringType())
def html_to_markdown_udf(htmls: pd.Series) -> pd.Series:
    return htmls.map(html_to_markdown, na_action="ignore")
