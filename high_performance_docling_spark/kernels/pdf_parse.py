"""Minimal pure-Python PDF text extraction — the real-input smoke seam.

The reference opens downloaded PDFs with docling's parse backend
(main.py:31-43 download → InputDocument; lambda_preprocessor.py:15-44
load_page → get_segmented_page → cells). That backend (qpdf/poppler
bindings) is not in this sandbox, so this module implements a small,
honest subset of ISO 32000 sufficient to prove the S1 contract on
NON-synthetic input: real PDF bytes → positioned text cells → elements →
the SAME assemble_spans kernel the synthetic pipeline uses → ordered
(kind, text, media_ref, order) spans.

Supported: classic xref PDFs; /Page objects with /MediaBox and direct or
array /Contents; FlateDecode (stdlib zlib) or plain streams; text
operators BT/ET, Tf, Td, TD, TL, Tm, T*, Tj, ', and TJ with literal
`(...)` strings including escapes. Glyph widths are approximated at half
the font size (the Helvetica average) — positions drive ordering, not
typography, so the approximation is immaterial to span output.

Out of scope (documented production seams, like the multimodal codec):
encrypted files, CID/Type0 fonts, cross-reference streams, inline
images. Cells use TOP-LEFT origin like the rest of the engine (the
PDF-native bottom-left y is flipped at parse time — the one place the
reference's coordinate flip, readingorder_model.py:56, survives).
"""

from __future__ import annotations

import re
import zlib
from typing import Any

_AVG_GLYPH_W = 0.5  # fraction of font size (Helvetica-ish average width)


def _objects(data: bytes) -> dict[int, bytes]:
    """num → raw object bytes (between `N 0 obj` and `endobj`)."""
    out: dict[int, bytes] = {}
    for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", data, re.S):
        out[int(m.group(1))] = m.group(2)
    return out


def _stream_bytes(obj: bytes) -> bytes | None:
    m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", obj, re.S)
    if not m:
        return None
    raw = m.group(1)
    if b"/FlateDecode" in obj.split(b"stream", 1)[0]:
        raw = zlib.decompress(raw)
    return raw


def _ref(obj: bytes, key: bytes) -> int | None:
    m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", obj)
    return int(m.group(1)) if m else None


def _refs(obj: bytes, key: bytes) -> list[int]:
    m = re.search(key + rb"\s*\[(.*?)\]", obj, re.S)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    one = _ref(obj, key)
    return [one] if one is not None else []


def _unescape(s: bytes) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i:i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1:i + 2]
            mapping = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b",
                       b"f": "\f", b"(": "(", b")": ")", b"\\": "\\"}
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape (\8 / \9 are not octal)
                m = re.match(rb"\\([0-7]{1,3})", s[i:])
                if m:
                    # ISO 32000 7.3.4.2: "high-order overflow shall be
                    # ignored" — \400..\777 wrap to the byte value mod 256
                    out.append(chr(int(m.group(1), 8) & 0xFF))
                    i += 1 + len(m.group(1))
                    continue
            # ISO 32000 7.3.4.2: backslash-EOL is a line continuation
            # (emits nothing); any other backslash-X ignores the
            # backslash and keeps only X — never a literal backslash.
            if nxt in (b"\r", b"\n"):
                i += 2
                if nxt == b"\r" and s[i:i + 1] == b"\n":
                    i += 1
                continue
            out.append(nxt.decode("latin-1"))
            i += 2
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


_TOKEN = re.compile(
    rb"\((?:\\.|[^\\()])*\)"   # literal string
    rb"|\[|\]"
    rb"|/[A-Za-z0-9#+.-]+"
    rb"|[-+]?\d*\.?\d+"
    rb"|[A-Za-z'\"*]+"
)


def _text_cells(content: bytes, page_h: float) -> list[dict[str, Any]]:
    """Run the text-object state machine over one content stream."""
    cells: list[dict[str, Any]] = []
    fs = 12.0      # current font size (Tf)
    leading = 14.4  # TL
    x = y = 0.0    # current text-line origin (PDF bottom-left space)
    stack: list[bytes] = []

    def show(text: str) -> None:
        if not text.strip():
            return
        w = max(1.0, _AVG_GLYPH_W * fs * len(text))
        cells.append({
            "text": text,
            "l": x, "r": x + w,
            # flip to TOP-LEFT origin: baseline y + ascent ~ fs
            "t": page_h - y - fs, "b": page_h - y + 0.25 * fs,
            "font_size": fs,
        })

    for tok in _TOKEN.finditer(content):
        t = tok.group(0)
        if t.startswith(b"(") or t.startswith(b"/") or t in (b"[", b"]"):
            stack.append(t)
            continue
        if re.fullmatch(rb"[-+]?\d*\.?\d+", t):
            stack.append(t)
            continue
        op = t
        if op == b"Tf" and len(stack) >= 1:
            fs = float(stack[-1])
            leading = 1.2 * fs
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            x += float(stack[-2])
            y += float(stack[-1])
            if op == b"TD":
                leading = -float(stack[-1])
        elif op == b"Tm" and len(stack) >= 6:
            x, y = float(stack[-2]), float(stack[-1])
        elif op == b"TL" and len(stack) >= 1:
            leading = float(stack[-1])
        elif op == b"T*":
            y -= leading
        elif op == b"Tj" and stack and stack[-1].startswith(b"("):
            show(_unescape(stack[-1][1:-1]))
        elif op == b"'" and stack and stack[-1].startswith(b"("):
            y -= leading
            show(_unescape(stack[-1][1:-1]))
        elif op == b"TJ":
            parts = [
                _unescape(s[1:-1]) for s in stack
                if s.startswith(b"(")
            ]
            show("".join(parts))
        elif op == b"BT":
            x = y = 0.0
        stack = []
    return cells


def parse_pdf_pages(data: bytes) -> list[dict[str, Any]]:
    """PDF bytes → [{page_no, width, height, cells:[{text,l,t,r,b,...}]}].
    Raises ValueError on non-PDF input; unsupported constructs simply
    yield fewer cells (this is a smoke-seam parser, not a validator)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objs = _objects(data)
    pages = []
    for num in sorted(objs):
        obj = objs[num]
        if not re.search(rb"/Type\s*/Page\b(?!s)", obj):
            continue
        mb = re.search(
            rb"/MediaBox\s*\[\s*([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)", obj
        )
        w, h = (float(mb.group(3)), float(mb.group(4))) if mb else (612.0, 792.0)
        cells: list[dict[str, Any]] = []
        for cref in _refs(obj, rb"/Contents"):
            stream = _stream_bytes(objs.get(cref, b""))
            if stream:
                cells.extend(_text_cells(stream, h))
        pages.append({
            "page_no": len(pages), "width": w, "height": h, "cells": cells,
        })
    if not pages:
        raise ValueError("no /Page objects found")
    return pages


_LINE_GAP = 1.5   # max leading multiple for two lines to share a block
_X_ALIGN = 3.0    # max left-edge drift within a block (pt)


def pdf_to_elements(data: bytes) -> list[dict[str, Any]]:
    """Group parsed text cells into layout elements (the mini layout
    stage standing where RT-DETR would run): consecutive lines with the
    same left edge and a gap under ~1.5 line-heights form one block;
    blocks whose font size is >= 1.4x the page's body size are
    SECTION_HEADERs. Output matches the assemble_spans element contract."""
    elements: list[dict[str, Any]] = []
    for page in parse_pdf_pages(data):
        cells = sorted(page["cells"], key=lambda c: (round(c["l"] / 200.0), c["t"]))
        if not cells:
            continue
        body_fs = sorted(c["font_size"] for c in cells)[len(cells) // 2]
        blocks: list[list[dict]] = []
        for c in cells:
            prev = blocks[-1][-1] if blocks else None
            if (
                prev is not None
                and abs(c["l"] - prev["l"]) <= _X_ALIGN
                # top-to-top line step (boxes overlap by the descent)
                and 0 < c["t"] - prev["t"] <= _LINE_GAP * c["font_size"]
                and abs(c["font_size"] - prev["font_size"]) < 0.5
            ):
                blocks[-1].append(c)
            else:
                blocks.append([c])
        for blk in blocks:
            label = (
                "section_header"
                if blk[0]["font_size"] >= 1.4 * body_fs
                else "text"
            )
            elements.append({
                "cid": len(elements),
                "page_no": page["page_no"],
                "l": min(c["l"] for c in blk),
                "t": min(c["t"] for c in blk),
                "r": max(c["r"] for c in blk),
                "b": max(c["b"] for c in blk),
                "label": label,
                "text": "\n".join(c["text"] for c in blk),
                "media_ref": "",
                "children": [],
            })
    return elements


def extract_pdf_spans(data: bytes) -> list[dict[str, Any]]:
    """PDF bytes → ordered spans, through the SAME sanitize + reading
    order kernels as the synthetic pipeline (S1 contract on real input)."""
    from .reading_order import assemble_spans
    from .sanitize import sanitize_text

    elements = pdf_to_elements(data)
    for el in elements:
        el["text"] = sanitize_text(el["text"].split("\n"))
    return assemble_spans(elements)
