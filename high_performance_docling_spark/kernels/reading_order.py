"""Rule-based reading order + caption/footnote attachment.

The reference delegates reading order to docling-ibm-models'
``ReadingOrderPredictor`` (rule-based; consumed at
/root/reference/readingorder_model.py:355-371) which is not available in
this environment. This module implements TWO deterministic
document-local orderings, flag-selected with ``mode``:

  - ``"rb"`` (default): the predictor-style column/row PRECEDENCE GRAPH
    following the documented design of the public ``reading_order_rb``
    algorithm (own code, own predicates — see _rb_order): same-line
    left→right chains, an up/down map built from "i is immediately above
    j" relations with occlusion checks, head selection, and a
    depth-first downward traversal gated on all predecessors being
    visited. Unlike XY-cut this reads a column to its end even when
    whitespace bands align across columns (the interleave failure mode
    pinned in tests/test_reading_order.py).
  - ``"xycut"``: the classic recursive XY-cut (Nagy & Seth, 1984),
    retained for comparison and as the corpus generator's second
    validity check.

Inputs are page elements in TOP-LEFT-origin coordinates; the reference's
bottom-left flip (readingorder_model.py:56) is unnecessary because we fix
a single TOP-LEFT convention at ingest (SURVEY.md §1.3).
"""

from __future__ import annotations

from bisect import bisect_left as _bisect_left
from typing import Any

from ..labels import CAPTION, FOOTNOTE, PICTURE, TABLE, DOCUMENT_INDEX, CODE

DEFAULT_READING_ORDER_MODE = "rb"

# Elements that can own captions/footnotes (docling attaches captions to
# tables, pictures and code blocks).
_CAPTION_PARENTS = {TABLE, DOCUMENT_INDEX, PICTURE, CODE}
# Max vertical gap (pt) between a caption/footnote and its parent.
_ATTACH_GAP = 12.0
# Minimum gap (pt) treated as a real cut line by XY-cut.
_MIN_CUT_GAP = 0.5


def _best_gap(intervals: list[tuple[float, float]], min_gap: float):
    """Widest whitespace gap separating the intervals into two non-empty
    groups. Returns (gap_width, cut_position) or None. (Sorting the
    tuples directly is order-identical to sorting indices by (lo, hi) —
    the hot path of XY-cut, so no lambda-key indirection.)"""
    ivs = sorted(intervals)
    best = None
    cur_end = ivs[0][1]
    for lo, hi in ivs[1:]:
        gap = lo - cur_end
        if gap > min_gap and (best is None or gap > best[0]):
            best = (gap, cur_end + gap / 2.0)
        if hi > cur_end:
            cur_end = hi
    return best


def _xy_cut(boxes: list[tuple[float, float, float, float]], ids: list[int]) -> list[int]:
    """Recursive XY-cut (Nagy & Seth): binary-split at the single widest
    whitespace gap — horizontal (reads top band first) or vertical (reads
    left column first), whichever gap is wider (horizontal wins ties, so
    full-width headers/footers separate before columns). Leaves sort by
    (t, l)."""
    if len(ids) <= 1:
        return list(ids)
    h = _best_gap([(b[1], b[3]) for b in boxes], _MIN_CUT_GAP)
    v = _best_gap([(b[0], b[2]) for b in boxes], _MIN_CUT_GAP)
    if h is not None and (v is None or h[0] >= v[0]):
        axis, cut = 1, h[1]
    elif v is not None:
        axis, cut = 0, v[1]
    else:
        order = sorted(range(len(ids)), key=lambda i: (boxes[i][1], boxes[i][0]))
        return [ids[i] for i in order]
    first = [i for i in range(len(ids)) if boxes[i][axis] < cut]
    second = [i for i in range(len(ids)) if boxes[i][axis] >= cut]
    return _xy_cut([boxes[i] for i in first], [ids[i] for i in first]) + _xy_cut(
        [boxes[i] for i in second], [ids[i] for i in second]
    )


_RB_EPS = 1e-3        # strictly-above / strictly-left slack (pt)
_L2R_Y_OVERLAP = 0.8  # min y-overlap fraction for a same-line chain
# Only running text chains into same-line l2r segments (the
# follows_maintext_order guard: a picture/table that merely happens to
# sit beside the next element in cid order is NOT a wrapped line).
_TEXT_CHAIN_LABELS = {"text", "list_item"}
_L2R_MAX_GAP = 8.0    # max horizontal gap (pt) between same-line segments
_L2R_TOP_ALIGN = 2.0  # max top-edge misalignment (pt) for a shared line


def _rb_order(
    boxes: list[tuple[float, float, float, float]],
    ids: list[int],
    labels: list[str] | None = None,
) -> list[int]:
    """Predictor-style precedence-graph page order (the public
    ``reading_order_rb`` design consumed at readingorder_model.py:355-361,
    re-expressed with our own predicates in top-left origin):

      1. l2r chains — consecutive elements on the same text line (i
         strictly left of i+1, y-overlap >= 0.8 of the shorter box) link
         left→right, so a wrapped line reads as a unit;
      2. up/dn precedence — i precedes j when i overlaps j horizontally
         and sits strictly above it, UNLESS some w occludes the pair
         (w strictly between them, overlapping j in x) — occlusion is
         what confines precedence to immediate neighbors and keeps
         columns independent;
      3. heads — elements with no predecessor, read top-then-left;
      4. depth-first DOWNWARD traversal from each head, entering a node
         only once ALL its predecessors were emitted — a full-width
         element below two columns therefore waits for both columns.

    The public algorithm additionally dilates elements horizontally and
    applies an is_horizontally_connected veto; both guard layouts rarer
    than this corpus exercises and are documented as out of scope."""
    n = len(ids)
    if n <= 1:
        return list(ids)
    l = [b[0] for b in boxes]
    t = [b[1] for b in boxes]
    r = [b[2] for b in boxes]
    btm = [b[3] for b in boxes]

    def x_overlap(i: int, j: int) -> bool:
        return min(r[i], r[j]) - max(l[i], l[j]) > _RB_EPS

    def y_overlap_frac(i: int, j: int) -> float:
        ov = min(btm[i], btm[j]) - max(t[i], t[j])
        mh = min(btm[i] - t[i], btm[j] - t[j])
        return ov / mh if mh > 0 else 0.0

    def above(i: int, j: int) -> bool:
        return btm[i] < t[j] + _RB_EPS

    def left_of(i: int, j: int) -> bool:
        return r[i] < l[j] + _RB_EPS

    # candidates for j all satisfy btm[i] < t[j] + eps: scanning a
    # btm-ascending prefix (bisect) visits only them. cand ORDER is
    # irrelevant downstream — it feeds a max scan and up/dn sets (dn is
    # re-sorted, up is membership-only) — so the permuted order is safe.
    by_btm = sorted(range(n), key=btm.__getitem__)
    btm_sorted = [btm[i] for i in by_btm]
    r2l: dict[int, int] = {}
    up: dict[int, list[int]] = {i: [] for i in range(n)}
    dn: dict[int, list[int]] = {i: [] for i in range(n)}
    for i in range(n - 1):
        j = i + 1  # follows_maintext_order: consecutive cids only
        if labels is not None and not (
            labels[i] in _TEXT_CHAIN_LABELS and labels[j] in _TEXT_CHAIN_LABELS
        ):
            continue
        # Same-line segments share a baseline and sit a character apart;
        # a column gutter (or any block-level gap) is far wider, so these
        # bounds keep cross-column neighbors out of the chain.
        if (
            left_of(i, j)
            and l[j] - r[i] <= _L2R_MAX_GAP
            and abs(t[j] - t[i]) <= _L2R_TOP_ALIGN
            and y_overlap_frac(i, j) >= _L2R_Y_OVERLAP
        ):
            r2l[j] = i
    for j in range(n):
        if j in r2l:  # a right line-segment follows only its left part
            i = r2l[j]
            up[j].append(i)
            dn[i].append(j)
            continue
        # candidates above j; i is occluded iff some OTHER candidate w
        # sits strictly below i (above(i, w) ⟺ btm[i] < t[w] + eps), so
        # the check reduces to the max candidate top excluding i —
        # O(|C|) per j instead of the naive O(n) per (i, j) pair.
        # Predicates inlined: this scan is the kernel's hottest loop and
        # the closure-call overhead measured ~10% of serial ms/doc.
        lj, tj, rj = l[j], t[j], r[j]
        thr = tj + _RB_EPS
        k = _bisect_left(btm_sorted, thr)
        cand = [
            i for i in by_btm[:k]
            if i != j
            and (r[i] if r[i] < rj else rj) - (l[i] if l[i] > lj else lj)
            > _RB_EPS
        ]
        if not cand:
            continue
        # top-two scan replaces the full sort: only the (t, w)-max and
        # runner-up are ever read, and tuple-max over (t[w], w) is exactly
        # the head of the reverse-sorted list
        top1 = top2 = None
        for w in cand:
            key = (t[w], w)
            if top1 is None or key > top1:
                top1, top2 = key, top1
            elif top2 is None or key > top2:
                top2 = key
        for i in cand:
            if top1[1] != i:
                tmax = top1[0]
            elif top2 is not None:
                tmax = top2[0]
            else:
                tmax = None
            if tmax is None or btm[i] >= tmax + _RB_EPS:
                up[j].append(i)
                dn[i].append(j)

    key = lambda i: (t[i], l[i])  # noqa: E731
    for i in range(n):
        dn[i].sort(key=key)
    visited: set[int] = set()
    order: list[int] = []

    def dfs(i: int) -> None:
        for j in dn[i]:
            if j not in visited and all(k in visited for k in up[j]):
                visited.add(j)
                order.append(j)
                dfs(j)

    for h in sorted((i for i in range(n) if not up[i]), key=key):
        if h not in visited:
            visited.add(h)
            order.append(h)
            dfs(h)
    for i in sorted(range(n), key=key):  # acyclicity guard (never expected)
        if i not in visited:
            visited.add(i)
            order.append(i)
            dfs(i)
    return [ids[i] for i in order]


def predict_reading_order(
    elements: list[dict[str, Any]], mode: str | None = None
) -> list[int]:
    """Order elements into reading sequence.

    ``elements``: dicts with cid:int, page_no:int, l,t,r,b:float, label:str.
    Returns the list of cids in reading order: pages ascending, then the
    per-page order of ``mode`` ("rb" precedence graph by default,
    "xycut" for the recursive-cut alternative).
    """
    mode = mode or DEFAULT_READING_ORDER_MODE
    if mode not in ("rb", "xycut"):
        raise ValueError(f"unknown reading-order mode {mode!r}")
    by_page: dict[int, list[dict]] = {}
    for el in elements:
        by_page.setdefault(int(el["page_no"]), []).append(el)
    ordered: list[int] = []
    for page_no in sorted(by_page):
        els = by_page[page_no]
        boxes = [(e["l"], e["t"], e["r"], e["b"]) for e in els]
        cids = [e["cid"] for e in els]
        if mode == "rb":
            ordered.extend(
                _rb_order(boxes, cids, [e.get("label", "") for e in els])
            )
        else:
            ordered.extend(_xy_cut(boxes, cids))
    return ordered


def _x_overlap(a: dict, b: dict) -> float:
    return min(a["r"], b["r"]) - max(a["l"], b["l"])


def _attach(
    elements_by_cid: dict[int, dict],
    ordered_cids: list[int],
    child_label: str,
) -> dict[int, list[int]]:
    """Map parent cid → [child cids] for caption/footnote attachment.

    A child attaches to the vertically nearest parent (label in
    _CAPTION_PARENTS) on the same page whose horizontal span overlaps at
    least half of the narrower box, within _ATTACH_GAP pt above or below.
    Below-parent wins ties; then earlier reading order.
    """
    parents = [
        elements_by_cid[cid]
        for cid in ordered_cids
        if elements_by_cid[cid]["label"] in _CAPTION_PARENTS
    ]
    mapping: dict[int, list[int]] = {}
    for cid in ordered_cids:
        el = elements_by_cid[cid]
        if el["label"] != child_label:
            continue
        best = None  # (gap, prefer_above_flag, parent_pos)
        for pos, p in enumerate(parents):
            if p["page_no"] != el["page_no"]:
                continue
            ov = _x_overlap(el, p)
            min_w = min(el["r"] - el["l"], p["r"] - p["l"])
            if min_w <= 0 or ov < 0.5 * min_w:
                continue
            gap_below = el["t"] - p["b"]  # child below parent
            gap_above = p["t"] - el["b"]  # child above parent
            for gap, above in ((gap_below, 0), (gap_above, 1)):
                if -1e-6 <= gap <= _ATTACH_GAP:
                    key = (gap, above, pos)
                    if best is None or key < best[0]:
                        best = (key, p["cid"])
        if best is not None:
            mapping.setdefault(best[1], []).append(cid)
    return mapping


def predict_merges(
    elements_by_cid: dict[int, dict], ordered_cids: list[int]
) -> dict[int, list[int]]:
    """Cross-boundary paragraph merges (the reference's
    ``predict_merges``, consumed at readingorder_model.py:369-371 and
    applied by ``_merge_elements`` :336-353): a TEXT element continues
    into the next TEXT element in reading order when they sit in
    different columns or on different pages, the first doesn't end with
    sentence-terminal punctuation, and the continuation starts lowercase.

    ON by default (GenConfig.enable_merges=True): the corpus generator
    terminates regular paragraphs with '.' (merge-proof) and splits long
    paragraphs across column/page boundaries, so exactly the deliberate
    continuations merge back."""
    merges: dict[int, list[int]] = {}
    merged_into: dict[int, int] = {}
    for prev_cid, next_cid in zip(ordered_cids, ordered_cids[1:]):
        a = elements_by_cid[prev_cid]
        b = elements_by_cid[next_cid]
        if a["label"] != "text" or b["label"] != "text":
            continue
        same_region = a["page_no"] == b["page_no"] and not (
            a["r"] < b["l"] or b["r"] < a["l"]  # different columns
        )
        if same_region:
            continue
        ta = (a.get("text") or "").rstrip()
        tb = (b.get("text") or "").lstrip()
        if not ta or not tb:
            continue
        if ta[-1] in ".!?:;":
            continue
        if not tb[0].islower():
            continue
        root = merged_into.get(prev_cid, prev_cid)
        merges.setdefault(root, []).append(next_cid)
        merged_into[next_cid] = root
    return merges


def assemble_spans(
    elements: list[dict[str, Any]],
    enable_merges: bool = False,
    process_list_markers: bool = False,
    reading_order_mode: str | None = None,
    enrich_formulas: bool = False,
) -> list[dict[str, Any]]:
    """Full document assembly: reading order + attachment → ordered spans.

    ``elements``: dicts with cid, page_no, l,t,r,b, label, text, media_ref,
    children (list of dicts with label, text). Returns spans
    [{kind, text, media_ref, order}] — the engine's output contract
    (BASELINE.json input_hint; reference analogue:
    readingorder_model.py:106-277 document build + markdown export order).

    ``process_list_markers`` runs the list-marker normalizer
    (readingorder_model.py:15-17 ListItemMarkerProcessor role): marker'd
    text becomes ``list_item`` with the marker stripped, marker-only boxes
    merge forward, consecutive items group. ON by default — typeset
    prepends a per-document marker to list items, and this stage strips
    it back off (GenConfig.process_list_markers).
    """
    by_cid = {el["cid"]: el for el in elements}
    ordered = predict_reading_order(elements, mode=reading_order_mode)
    absorbed: set[int] = set()
    if process_list_markers:
        from .list_markers import process_list_markers as _plm

        absorbed = _plm(by_cid, ordered)["absorbed"]
    captions = _attach(by_cid, ordered, CAPTION)
    footnotes = _attach(by_cid, ordered, FOOTNOTE)
    merges = predict_merges(by_cid, ordered) if enable_merges else {}
    skippable = (
        {c for lst in captions.values() for c in lst}
        | {c for lst in footnotes.values() for c in lst}
        | {c for lst in merges.values() for c in lst}
        | absorbed
    )

    spans: list[dict[str, Any]] = []

    def emit(kind: str, text: str, media_ref: str) -> None:
        spans.append(
            {
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
                "order": len(spans),
            }
        )

    for cid in ordered:
        if cid in skippable:
            continue
        el = by_cid[cid]
        text = el.get("text") or ""
        for merged_cid in merges.get(cid, ()):  # _merge_elements :351
            nxt = by_cid[merged_cid].get("text") or ""
            if text.endswith("-"):
                # hyphenated continuation: de-hyphenate across the
                # boundary (the same rule sanitize_text applies to
                # intra-element line breaks)
                text = text[:-1] + nxt
            else:
                text += " " + nxt
        emit(el["label"], text, el.get("media_ref") or "")
        for child in el.get("children") or []:
            emit(child["label"], child.get("text") or "", child.get("media_ref") or "")
        for cap_cid in captions.get(cid, ()):  # captions then footnotes
            cap = by_cid[cap_cid]
            emit(cap["label"], cap.get("text") or "", cap.get("media_ref") or "")
        for fn_cid in footnotes.get(cid, ()):
            fn = by_cid[fn_cid]
            emit(fn["label"], fn.get("text") or "", fn.get("media_ref") or "")
    if enrich_formulas:
        # the reference's enrichment pass runs over the assembled doc
        # (gpu_processor.py:184-202): formula/code spans through the
        # batch-5 VLM stand-in (LaTeX-izer + code-language parse)
        from .enrichment import enrich_elements

        work = [
            {"label": s["kind"], "text": s["text"], "_span": s}
            for s in spans
            if s["kind"] in ("formula", "code")
        ]
        if work:
            enrich_elements(work)
            for w in work:
                w["_span"]["text"] = w["text"]
                w.pop("_span")
    return spans
