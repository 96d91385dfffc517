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
    """One-pass boilerplate-stripping extractor.

    Stack frames are dicts {tag, inline, text, link_chars}; inline frames
    carry no text (data flows to the nearest enclosing block frame).  End
    tags pop by TAG MATCH (closing any intervening blocks), and tags with
    optional end tags (li, p, td/th) implicitly close a still-open sibling
    — so real-world HTML that omits </li>/</p>/</td> keeps document
    order.  Strip regions track a TAG STACK rather than a counter, so
    void tags (<br>, <img>, <input>) and omitted end tags inside
    nav/footer/form can never wedge the parser in strip mode.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict[str, Any]] = []
        self._strip_stack: list[str] = []
        self._anchor_depth = 0
        self._stack: list[dict[str, Any]] = []
        self._in_table = 0
        self._table_rows: list[list[str]] = []

    # -- helpers -----------------------------------------------------------
    def _open_block(self, tag: str) -> None:
        # anchor scope ends at block boundaries: an <a> left open when a
        # block element starts (unclosed anchor, card-style block links)
        # must not flag every following block as link text
        if self._anchor_depth:
            self._stack = [f for f in self._stack if f["tag"] != "a"]
            self._anchor_depth = 0
        self._stack.append({"tag": tag, "inline": False, "text": [],
                            "link_chars": 0})

    def _open_inline(self, tag: str) -> None:
        self._stack.append({"tag": tag, "inline": True})

    def _pop_frame(self) -> dict[str, Any]:
        frame = self._stack.pop()
        if frame["tag"] == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        return frame

    def _close_block(self) -> None:
        blk = self._pop_frame()
        if blk["inline"]:
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

    def _close_cell(self) -> None:
        """Drain an open td/th frame into the current table row; a cell
        with no open row implies one (HTML5 implies <tr> before a stray
        <td>), so its text is never silently dropped."""
        if (self._stack and not self._stack[-1]["inline"]
                and self._stack[-1]["tag"] in ("td", "th")):
            blk = self._pop_frame()
            cell = " ".join("".join(blk["text"]).split())
            if not self._table_rows:
                self._table_rows.append([])
            self._table_rows[-1].append(cell)

    def _top_block_tag(self) -> str | None:
        if self._stack and not self._stack[-1]["inline"]:
            return self._stack[-1]["tag"]
        return None

    # -- parser events ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        # Void tags never receive end tags: they must not touch the strip
        # stack or the block stack regardless of context (a <br> inside
        # <nav> previously left the parser stripping forever).
        if tag in _VOID_TAGS:
            return
        if tag == "img":
            if self._strip_stack:
                return
            src = dict(attrs).get("src", "")
            if src:
                self.blocks.append({"kind": "picture", "text": "",
                                    "media_ref": src})
            return
        ad = dict(attrs)
        marker = f"{ad.get('id', '')} {ad.get('class', '')}"
        if self._strip_stack or tag in STRIP_TAGS or BOILERPLATE_RX.search(marker):
            self._strip_stack.append(tag)
            return
        if tag == "a":
            self._anchor_depth += 1
            self._open_inline(tag)
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
                self._close_cell()  # <tr> implies closing an open cell
                self._table_rows.append([])
            elif tag in ("td", "th"):
                self._close_cell()  # sibling cell with omitted </td>
                self._open_block(tag)
            elif (tag in BLOCK_TAGS
                  and self._top_block_tag() not in ("td", "th")):
                # foster-parenting (HTML5 tables): block content inside a
                # table but OUTSIDE any cell must not vanish — an
                # unclosed <table> would otherwise swallow the rest of
                # the document
                self._open_block(tag)
            return
        # Optional end tags: a new <li> closes an open li; any block-level
        # start closes an open <p> (HTML5 "optional tags" rules).
        top = self._top_block_tag()
        if tag == "li" and top == "li":
            self._close_block()
        elif tag in BLOCK_TAGS and top == "p":
            self._close_block()
        if tag in BLOCK_TAGS:
            self._open_block(tag)
        else:
            self._open_inline(tag)  # inline: text flows to enclosing block

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS or tag == "img":
            return  # stray </br> etc. must not unwind anything
        if self._strip_stack:
            # Pop to the nearest matching open stripped tag; a stray end
            # tag with no open match (omitted start, typo) is ignored —
            # omitted end tags inside boilerplate unwind at the ancestor.
            if tag in self._strip_stack:
                while self._strip_stack.pop() != tag:
                    pass
            return
        if tag == "table" and self._in_table:
            self._close_cell()
            self._in_table -= 1
            if self._in_table:  # closing a nested table: keep buffering
                return
            rows = ["\t".join(r) for r in self._table_rows if r]
            if rows:
                self.blocks.append({"kind": "table",
                                    "text": "\n".join(rows), "media_ref": ""})
            return
        if self._in_table:
            if tag in ("tr", "td", "th"):
                self._close_cell()  # </tr> with omitted </td> drains too
            elif self._top_block_tag() == tag:
                self._close_block()  # foster-parented block closes inline
            return
        # Generic: pop to the MATCHING open frame, closing any intervening
        # blocks (omitted </li>/</p> before a parent's end tag close here,
        # in document order); an end tag with no open match is ignored.
        if not any(f["tag"] == tag for f in self._stack):
            return
        while self._stack:
            matched = self._stack[-1]["tag"] == tag
            if self._stack[-1]["inline"]:
                self._pop_frame()
            else:
                self._close_block()
            if matched:
                return

    def handle_data(self, data):
        if self._strip_stack or not data:
            return
        target = next(
            (b for b in reversed(self._stack) if not b["inline"]), None
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
    # drain any unclosed structures (malformed HTML): an unterminated
    # table flushes first (open cell → row, rows → one table block),
    # then remaining block frames close in stack order
    if ex._in_table:
        ex._close_cell()
        rows = ["\t".join(r) for r in ex._table_rows if r]
        if rows:
            ex.blocks.append({"kind": "table", "text": "\n".join(rows),
                              "media_ref": ""})
        ex._in_table = 0
    while ex._stack:
        if ex._stack[-1]["inline"]:
            ex._pop_frame()
        else:
            ex._close_block()
    return [
        {**b, "order": i} for i, b in enumerate(ex.blocks)
    ]
