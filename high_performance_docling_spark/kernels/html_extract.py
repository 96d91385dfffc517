"""HTML main-content extraction — boilerplate strip + DOM heuristics.

The north rule names "HTML boilerplate strip, PDF/layout parse, DOM
heuristics" as the extraction pipeline's input modes; this module is the
HTML mode, built on stdlib html.parser (no bs4/lxml in this sandbox) with
the public block-level heuristics of the Readability/Boilerpipe family
(Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010):

  1. SUBTREE STRIP — script/style/nav/header/footer/aside/form/... tags
     and any element whose id/class matches the boilerplate vocabulary
     (nav, menu, sidebar, footer, comment, banner, ad, social, share,
     cookie, breadcrumb, promo, related, widget) are removed wholesale;
  2. BLOCK SEGMENTATION — remaining text accumulates into block-level
     units (p, h1-h6, li, pre, td/figcaption, …) in document order,
     tracking per-block anchor-text mass;
  3. LINK-DENSITY FILTER — blocks whose text is mostly link text
     (>50%) or that are tiny AND link-heavy are navigation debris, not
     content (the Boilerpipe densitometric rule, simplified and
     deterministic).

Output is the engine's span contract: ordered (kind, text, media_ref)
with h1-h6 → section_header, li → list_item, pre → code, img → picture
(media_ref = src), figcaption/caption → caption, table rows → table
(cells tab-joined, rows newline-joined), else text. The whole document
rides one HTMLParser pass — O(bytes), no DOM materialization — so the
Spark stage is a narrow mapInPandas over payload bytes, exactly like the
PDF seam.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any

STRIP_TAGS = {
    "script", "style", "nav", "header", "footer", "aside", "form",
    "noscript", "iframe", "svg", "button", "select", "template",
}
BOILERPLATE_RX = re.compile(
    r"\b(nav|menu|sidebar|footer|comment|banner|advert|ads?|social|share|"
    r"cookie|breadcrumb|promo|related|widget|popup|subscribe)\b",
    re.I,
)
BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
    "figcaption", "caption", "div", "article", "section", "td",
    "th",
}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_VOID_TAGS = {  # never get end tags — must not touch the block stack
    "br", "hr", "meta", "link", "input", "area", "base", "col", "embed",
    "source", "track", "wbr", "param",
}
_MAX_LINK_DENSITY = 0.5
_MIN_SHORT_BLOCK_CHARS = 10  # tiny + any-link = menu debris


def _kind(tag: str) -> str:
    if tag in _HEADINGS:
        return "section_header"
    if tag == "li":
        return "list_item"
    if tag in ("pre", "code"):
        return "code"
    if tag in ("figcaption", "caption"):
        return "caption"
    return "text"


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict[str, Any]] = []
        self._strip_depth = 0
        self._anchor_depth = 0
        self._stack: list[dict[str, Any] | None] = []
        self._in_table = 0
        self._table_rows: list[list[str]] = []

    # -- helpers -----------------------------------------------------------
    def _open_block(self, tag: str) -> None:
        self._stack.append({"tag": tag, "text": [], "link_chars": 0})

    def _close_block(self) -> None:
        blk = self._stack.pop()
        if blk is None:
            return
        text = " ".join("".join(blk["text"]).split())
        if not text:
            return
        total = len(text)
        density = blk["link_chars"] / total if total else 1.0
        if density > _MAX_LINK_DENSITY:
            return  # link-dominated block = navigation debris
        if total < _MIN_SHORT_BLOCK_CHARS and blk["link_chars"] > 0:
            return
        self.blocks.append({"kind": _kind(blk["tag"]), "text": text,
                            "media_ref": ""})

    # -- parser events ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        ad = dict(attrs)
        marker = f"{ad.get('id', '')} {ad.get('class', '')}"
        if self._strip_depth or tag in STRIP_TAGS or BOILERPLATE_RX.search(marker):
            self._strip_depth += 1
            return
        if tag in _VOID_TAGS:
            return
        if tag == "a":
            self._anchor_depth += 1
            self._stack.append(None)
            return
        if tag == "img":
            src = ad.get("src", "")
            if src:
                self.blocks.append({"kind": "picture", "text": "",
                                    "media_ref": src})
            return
        if tag == "table":
            # nested tables flatten into the outermost one (their rows
            # append to the same buffer); only depth 0->1 starts fresh
            if self._in_table == 0:
                self._table_rows = []
            self._in_table += 1
            return
        if self._in_table:
            if tag == "tr":
                self._table_rows.append([])
            elif tag in ("td", "th"):
                self._open_block(tag)
            return
        if tag in BLOCK_TAGS:
            self._open_block(tag)
        else:
            self._stack.append(None)  # inline: text flows to enclosing block

    def handle_endtag(self, tag):
        if self._strip_depth:
            self._strip_depth -= 1
            return
        if tag in _VOID_TAGS:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
            if self._stack and self._stack[-1] is None:
                self._stack.pop()
            return
        if tag == "img":
            return
        if tag == "table" and self._in_table:
            self._in_table -= 1
            if self._in_table:  # closing a nested table: keep buffering
                return
            rows = ["\t".join(r) for r in self._table_rows if r]
            if rows:
                self.blocks.append({"kind": "table",
                                    "text": "\n".join(rows), "media_ref": ""})
            return
        if self._in_table:
            if tag in ("td", "th") and self._stack:
                blk = self._stack.pop()
                if blk is not None and self._table_rows:
                    cell = " ".join("".join(blk["text"]).split())
                    self._table_rows[-1].append(cell)
            return
        if self._stack:
            if self._stack[-1] is None:
                self._stack.pop()
            else:
                self._close_block()

    def handle_data(self, data):
        if self._strip_depth or not data:
            return
        target = next(
            (b for b in reversed(self._stack) if b is not None), None
        )
        if target is None:
            return
        target["text"].append(data)
        if self._anchor_depth:
            target["link_chars"] += len(" ".join(data.split()))


def html_to_spans(html: str) -> list[dict[str, Any]]:
    """HTML string → ordered main-content spans
    [{kind, text, media_ref, order}]."""
    ex = _Extractor()
    ex.feed(html)
    ex.close()
    # drain any unclosed blocks (malformed HTML)
    while ex._stack:
        if ex._stack[-1] is None:
            ex._stack.pop()
        else:
            ex._close_block()
    return [
        {**b, "order": i} for i, b in enumerate(ex.blocks)
    ]
