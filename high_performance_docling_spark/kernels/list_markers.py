"""List-item marker detection, normalization and grouping.

Public re-implementation of the behavior the reference gets from
docling-ibm-models' ``ListItemMarkerProcessor`` (imported at
/root/reference/readingorder_model.py:15-17; the package itself is not
vendored in the reference tree, so this is written from the documented
docling behavior, not ported code):

  - a text item starting with a list marker (bullet, dash, ``1.``,
    ``a)``, ``(iv)`` ...) is a list item: label normalized to
    ``list_item``, the marker split off into its own field, numbered
    markers flagged ``enumerated``;
  - a MARKER-ONLY item (OCR/layout often splits "1." and the body into
    two boxes) merges with the immediately following text item in
    reading order;
  - consecutive list items in reading order form one GROUP (docling
    wraps them in a list group node); ``group_id`` numbers the groups.
"""

from __future__ import annotations

import re
from typing import Any

from ..labels import LIST_ITEM, TEXT

# bullets | "1." "1)" "(1)" | "a." "A)" "(b)" | roman "iv." "(xi)"
_MARKER = re.compile(
    r"^(?P<marker>"
    r"[-*+•◦▪‣⁃·]"  # - * + • ◦ ▪ ‣ ⁃ ·
    r"|\(?\d{1,3}[.)]"
    r"|\(?[ivxlc]{1,6}[.)]"
    r"|\(?[IVXLC]{1,6}[.)]"
    r"|\(?[a-zA-Z][.)]"  # single letters (roman branch wins longer runs)
    r")(?P<sep>\s+|$)"
)
_ENUMERATED = re.compile(r"^\(?([0-9]+|[a-zA-Z]|[ivxlcIVXLC]+)[.)]$")


def split_marker(text: str) -> tuple[str, str]:
    """(marker, rest) — marker is "" when the text doesn't start with one."""
    m = _MARKER.match(text or "")
    if not m:
        return "", (text or "").strip()
    return m.group("marker"), text[m.end():].strip()


def process_list_markers(
    elements_by_cid: dict[int, dict[str, Any]], ordered_cids: list[int]
) -> dict[str, Any]:
    """Run marker detection over elements in reading order.

    Mutates matched elements: label → ``list_item``, text → marker-stripped
    body, adds ``marker`` / ``enumerated`` / ``group_id``. Marker-only
    elements merge into the NEXT text-ish element (which inherits the
    marker). Returns {"absorbed": set of cids consumed by marker-only
    merges, "groups": {group_id: [cids]}}.
    """
    absorbed: set[int] = set()
    # pass 1: detect markers / merge marker-only boxes forward
    for pos, cid in enumerate(ordered_cids):
        el = elements_by_cid[cid]
        if el["label"] not in (TEXT, LIST_ITEM) or cid in absorbed:
            continue
        marker, rest = split_marker(el.get("text") or "")
        if not marker and el["label"] == TEXT:
            continue
        if marker and not rest:
            # marker-only box: merge with the next text-ish element
            nxt = next(
                (
                    elements_by_cid[c]
                    for c in ordered_cids[pos + 1:]
                    if c not in absorbed
                    and elements_by_cid[c]["label"] in (TEXT, LIST_ITEM)
                ),
                None,
            )
            if nxt is None:
                continue
            absorbed.add(nxt["cid"])
            rest = (nxt.get("text") or "").strip()
        el["label"] = LIST_ITEM
        el["text"] = rest
        el["marker"] = marker
        el["enumerated"] = bool(marker and _ENUMERATED.match(marker))
    # pass 2: group consecutive list items (reading order)
    groups: dict[int, list[int]] = {}
    gid = -1
    prev_was_list = False
    for cid in ordered_cids:
        if cid in absorbed:
            continue
        el = elements_by_cid[cid]
        if el["label"] == LIST_ITEM:
            if not prev_was_list:
                gid += 1
            el["group_id"] = gid
            groups.setdefault(gid, []).append(cid)
            prev_was_list = True
        else:
            prev_was_list = False
    return {"absorbed": absorbed, "groups": groups}
