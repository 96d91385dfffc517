"""Text sanitization — exact-parity port of the reference's line joiner.

Reference: /root/reference/page_assemble_model.py:36-67 (sanitize_text)
and the per-cell cleanup at :89-92 (\\x02 → '-', strip, drop blanks).
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"\b[\w]+\b")

# Unicode normalization table (page_assemble_model.py:60-65).
_NORMALIZATION = {
    "⁄": "/",   # fraction slash
    "’": "'",   # right single quote
    "‘": "'",   # left single quote
    "“": '"',   # left double quote
    "”": '"',   # right double quote
    "•": "·",  # bullet → middle dot
}
_NORMALIZATION_TRANS = str.maketrans(_NORMALIZATION)


def sanitize_text(lines: list[str]) -> str:
    """Join text lines: de-hyphenate across breaks when both sides are
    alphanumeric words, otherwise join with a space; then normalize
    unicode punctuation and strip.

    Matches page_assemble_model.py:36-67 exactly, including the in-place
    list mutation semantics (each line looks at the PREVIOUS line as
    already rewritten).
    """
    lines = list(lines)
    if len(lines) <= 1:
        return " ".join(lines)

    for ix, line in enumerate(lines[1:]):
        prev_line = lines[ix]
        if prev_line.endswith("-"):
            prev_words = _WORD_RE.findall(prev_line)
            line_words = _WORD_RE.findall(line)
            if (
                prev_words
                and line_words
                and prev_words[-1].isalnum()
                and line_words[0].isalnum()
            ):
                lines[ix] = prev_line[:-1]
        else:
            lines[ix] += " "

    joined = "".join(lines)
    # translate() walks every char through the table dict; the six
    # normalization chars are rare, so probe with C-level substring
    # scans first — identical output either way
    for ch in _NORMALIZATION:
        if ch in joined:
            return joined.translate(_NORMALIZATION_TRANS).strip()
    return joined.strip()


def clean_cell_text(text: str) -> str:
    """Per-cell cleanup applied before line joining
    (page_assemble_model.py:89-92): \\x02 → '-', strip."""
    return text.replace("\x02", "-").strip()


def cluster_text(cell_texts: list[str]) -> str:
    """Full text for a cluster: clean each cell, drop blanks, sanitize-join
    (page_assemble_model.py:88-94)."""
    lines = [t for t in (clean_cell_text(raw) for raw in cell_texts) if t]
    return sanitize_text(lines)


def child_text(cell_texts: list[str]) -> str:
    """Text for a wrapper's child cluster: plain space-join of cleaned
    cells WITHOUT de-hyphenation or unicode normalization — the reference
    treats children differently (readingorder_model.py:86-91)."""
    return " ".join(t for t in (clean_cell_text(raw) for raw in cell_texts) if t)
