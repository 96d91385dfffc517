"""Deterministic synthetic corpus of interleaved text+media documents.

The north-rule input table has rows ``(doc_id: string, spans:
array<struct<kind, text, media_ref, offset>>)`` (BASELINE.json
``input_hint``). This module generates that corpus deterministically from
a seed — no external data — and provides the *typesetter*: the pure
function that lays a document's spans out onto synthetic PDF-like pages
(cells with geometry). The typesetter is the sandbox stand-in for the
reference's PDF parse backend (lambda_preprocessor.py:15-44:
``load_page → get_segmented_page → cells``), so the extraction pipeline
genuinely re-derives structure from geometry.

Layout detections ("hints") are produced by :func:`synth_detections`, the
deterministic stand-in for the RT-DETR layout model
(fork/layout/layout_predictor_gpu.py:253-315): true element boxes plus
noise that the layout post-processor must clean up — sub-threshold
spurious boxes, duplicate/inset detections, TITLE mislabels, outward
jitter, full-page pictures, missing detections (orphan path), and FORM
wrapper proposals.

Everything is a pure function of (seed, doc content) — platform-stable
via ``random.Random`` string seeding — so Spark stages and the serial
oracle compute identical values.
"""

from __future__ import annotations

import math
import random
import re
from dataclasses import dataclass, field
from typing import Any

from .kernels.assemble import media_ref_for_crop
from .kernels.reading_order import (
    _rb_order,
    _xy_cut,
    assemble_spans,
    predict_reading_order,
)
from . import labels as L

PAGE_W = 612.0
PAGE_H = 792.0
MARGIN = 54.0
LINE_H = 11.0
LEADING = 14.0
PARA_GAP = 16.0  # > reading_order._ATTACH_GAP so only planted captions attach
ATTACH_GAP = 4.0
BODY_TOP = MARGIN
BODY_BOTTOM = PAGE_H - MARGIN
COL_GAP = 20.0

VOCAB = (
    "spark shuffle partition executor driver catalyst tungsten arrow batch "
    "column row schema parquet iceberg table scan filter join window agg "
    "broadcast salt skew codegen vector kernel layout cluster cell page "
    "document span text media figure caption reading order extract pipeline "
    "stage checkpoint lineage resume graph plan stream state merge sort rank "
    "index hash range bucket sample quantile distinct union map reduce fold "
    "encode decode tokenize segment detect assemble render corpus synthetic "
    "deterministic throughput latency scale efficiency baseline metric bench"
).split()

UNICODE_DECOR = ["’", "‘", "“", "”", "•", "⁄"]


@dataclass
class GenConfig:
    seed: int = 42
    n_docs: int = 100
    pages_min: int = 1
    pages_max: int = 5
    mega_frac: float = 0.02   # fraction of docs with mega page counts (skew)
    mega_pages: int = 24
    noise: bool = True        # plant detector noise (postprocessor work)
    two_col_frac: float = 0.3
    # OCR exercise: fraction of blocks that are "scanned" (image-only text
    # regions with no extractable cells). Requires keep_empty_clusters so
    # the 0-cell clusters survive to the OCR stage (gpu_processor.py:
    # 204-234); that in turn disables the empty-competitor noise case.
    ocr_frac: float = 0.0
    keep_empty_clusters: bool = False
    # Reading-order extras (readingorder_model.py predict_merges +
    # ListItemMarkerProcessor), ON by default — the corpus generator
    # emits what they consume: text paragraphs end with terminal
    # punctuation and SPLIT across column/page boundaries when they
    # don't fit (typeset carries the remainder, possibly hyphenated,
    # to the next column — the cross-boundary continuation the merge
    # predictor re-joins), and list items typeset with a per-document
    # marker the ListItemMarkerProcessor strips back off.
    enable_merges: bool = True
    process_list_markers: bool = True
    # Per-page ordering algorithm: "rb" = predictor-style precedence
    # graph (default, the reference's reading_order_rb analogue),
    # "xycut" = recursive XY-cut. The generator validates two-column
    # layouts against BOTH so either mode round-trips exactly.
    reading_order_mode: str = "rb"
    # Layout-detection model for the staged path: "synth" replays
    # ground-truth boxes + recoverable noise; "conv" runs the real-math
    # conv detector (kernels/toy_models.ConvLayoutDetector) — a genuine
    # float32-NCHW forward whose post-process recovers boxes to ~1e-6 pt
    # from pixel coverage — exact end-to-end on both plain and OCR
    # corpora (the OCR text keying int-rounds coordinates, far above the
    # recovery error).
    detector: str = "synth"
    # Pathological cluster-density stress (VERDICT r4 #7): tile this many
    # tiny low-confidence FORMULA proposals INSIDE the largest text
    # element's cell envelope on every page. Each tile has IoS = 1
    # against its anchor (overlap dedup absorbs the whole pile into the
    # anchor, which wins the rule-based best pick on area), and tiles are
    # mutually disjoint, so the >GRID_CUTOVER page resolves through the
    # grid index while spans stay EXACT. 0 = off (the default corpus).
    dense_noise_boxes: int = 0
    # Post-assembly enrichment stage (gpu_processor.py:184-202 role):
    # formula spans rewrite to LaTeX through the batch-5 VLM stand-in.
    # Off by default only because the round-trip invariant compares raw
    # input text; flip on for docling-parity output.
    enrich_formulas: bool = False


def docling_parity_config(**overrides) -> "GenConfig":
    """The docling-parity OUTPUT PROFILE (VERDICT r4 #4): enrichment ON
    plus the merges/markers defaults — matching the reference pipeline,
    which always runs formula enrichment (gpu_processor.py:184-202).
    Under this profile the tested invariant is the ENRICHED span
    sequence (tests/goldens/spans_enriched_seed42.json), not the
    raw-text round trip that keeps the base profile's default off."""
    overrides.setdefault("enrich_formulas", True)
    overrides.setdefault("enable_merges", True)
    overrides.setdefault("process_list_markers", True)
    return GenConfig(**overrides)


# --------------------------------------------------------------------------
# span content generation
# --------------------------------------------------------------------------

def _words(rng: random.Random, n: int) -> list[str]:
    return [rng.choice(VOCAB) for _ in range(n)]


def _formula_text(rng: random.Random) -> str:
    """Math-shaped formula text: most draws contain constructs the
    LaTeX-izer rule chain (kernels/enrichment.py LATEX_RULES) rewrites —
    sqrt()/^/_//, greek names, comparisons — so the docling-parity
    enriched profile is non-vacuous; one form stays plain words (the
    already-LaTeX fixed-point case). Single-line, no trailing hyphen
    (keeps the merge predictor and sanitize semantics untouched)."""
    a, b, c = _words(rng, 3)
    forms = [
        f"sqrt({a}) + {b}/{c}",
        f"x^{rng.randint(2, 9)} + {a} - {b}",
        f"{a} <= {b} + gamma",
        f"sum {a} -> inf",
        f"alpha + beta * {a}",
        f"f_{rng.randint(1, 9)} = {a}/{b}",
        f"{a} {b}",
    ]
    return forms[rng.randrange(len(forms))]


def _make_lines(rng: random.Random, n_lines: int, wpl: tuple[int, int]) -> list[str]:
    """Build raw text lines with deterministic hyphenation and unicode
    decoration (exercises sanitize_text: page_assemble_model.py:36-67)."""
    lines = [" ".join(_words(rng, rng.randint(*wpl))) for _ in range(n_lines)]
    # Hyphenate: move the tail of the next line's first word up.
    for i in range(n_lines - 1):
        if rng.random() < 0.25:
            nxt = lines[i + 1].split(" ")
            w = nxt[0]
            if len(w) >= 6 and w.isalnum():
                cut = rng.randint(2, len(w) - 2)
                lines[i] += " " + w[:cut] + "-"
                nxt[0] = w[cut:]
                lines[i + 1] = " ".join(nxt)
    # Unicode decoration on a random middle word (never the first word of a
    # line, so de-hyphenation preconditions stay intact).
    for i in range(n_lines):
        if rng.random() < 0.2:
            ws = lines[i].split(" ")
            if len(ws) >= 3:
                j = rng.randint(1, len(ws) - 1)
                deco = rng.choice(UNICODE_DECOR)
                if deco in ("“",):
                    ws[j] = "“" + ws[j] + "”"
                elif deco in ("’", "‘"):
                    ws[j] = ws[j] + deco + "s"
                elif deco == "⁄":
                    ws[j] = ws[j] + "⁄" + rng.choice(VOCAB)
                else:
                    ws[j] = deco + " " + ws[j]
                lines[i] = " ".join(ws)
    return lines


def gen_doc_spans(cfg: GenConfig, doc_index: int) -> list[dict[str, Any]]:
    """Draft the document's spans in flow order (raw text, media_ref filled
    after typesetting). Returns span dicts: kind, text, media_ref, plus a
    private _table (grid dims) / _pic (size) hint used only by typesetting
    content decisions — everything derivable from text itself."""
    rng = random.Random(f"{cfg.seed}:{doc_index}:content")
    is_mega = rng.random() < cfg.mega_frac
    n_pages = (
        rng.randint(cfg.pages_max, cfg.mega_pages) if is_mega
        else rng.randint(cfg.pages_min, cfg.pages_max)
    )
    # Target content volume ~ pages; typesetting flows across pages itself.
    spans: list[dict[str, Any]] = []

    def add(kind: str, text: str) -> dict[str, Any]:
        s = {"kind": kind, "text": text, "media_ref": ""}
        spans.append(s)
        return s

    n_blocks = max(3, int(n_pages * rng.uniform(6, 10)))
    add(L.SECTION_HEADER, " ".join(_words(rng, rng.randint(2, 5))))
    for _ in range(n_blocks):
        if cfg.ocr_frac > 0 and rng.random() < cfg.ocr_frac:
            # scanned region: no extractable text; the typesetter places
            # blank cells and the generator fills the expected OCR text
            # post-typeset (generate_doc)
            s = add(L.TEXT, "")
            s["media_ref"] = f"scan:{rng.randint(1, 3)}"
            continue
        roll = rng.random()
        if roll < 0.42:
            # terminal '.' makes regular paragraphs merge-proof: the
            # merge predictor only joins continuations whose first part
            # lacks sentence-terminal punctuation (split parts, below).
            # ~1 in 5 paragraphs is long, so column/page boundaries
            # regularly split one (the cross-boundary merge exercise).
            n_lines = (
                rng.randint(6, 12) if rng.random() < 0.2
                else rng.randint(1, 5)
            )
            lines = _make_lines(rng, n_lines, (4, 8))
            lines[-1] += "."
            add(L.TEXT, "\n".join(lines))
        elif roll < 0.54:
            add(L.SECTION_HEADER, " ".join(_words(rng, rng.randint(2, 5))))
        elif roll < 0.68:
            add(L.LIST_ITEM, "\n".join(_make_lines(rng, rng.randint(1, 2), (3, 7))))
        elif roll < 0.76:  # table (+ optional caption/footnote)
            # encoding: rows joined by \n, cells by \t; a row with fewer
            # cells than the widest row means its FIRST cell spans the
            # missing columns (OTSL lcel); a "^" cell is merged with the
            # cell above it (OTSL ucel)
            nr, nc = rng.randint(2, 4), rng.randint(2, 4)
            rows = []
            merge_roll = rng.random()
            col_merged = merge_roll < 0.15
            row_merged = 0.15 <= merge_roll < 0.3 and nr >= 3
            grid = [[rng.choice(VOCAB) for _ in range(nc)] for _ in range(nr)]
            if col_merged and nc >= 2:
                span = rng.randint(2, nc)
                grid[0] = grid[0][: nc - span + 1]
            elif row_merged:
                c_star = rng.randrange(nc)
                r_star = rng.randrange(nr - 2)  # keep the last row unmerged
                grid[r_star + 1][c_star] = "^"
            rows = ["\t".join(cells) for cells in grid]
            add(L.TABLE, "\n".join(rows))
            if rng.random() < 0.6:
                add(L.CAPTION, " ".join(_words(rng, rng.randint(3, 7))))
            if rng.random() < 0.25:
                add(L.FOOTNOTE, " ".join(_words(rng, rng.randint(3, 6))))
        elif roll < 0.84:  # picture (+ optional caption)
            add(L.PICTURE, "")
            if rng.random() < 0.6:
                add(L.CAPTION, " ".join(_words(rng, rng.randint(3, 7))))
        elif roll < 0.90:
            add(L.CODE, "\n".join(_make_lines(rng, rng.randint(1, 3), (2, 5))))
        elif roll < 0.95:
            add(L.FORMULA, _formula_text(rng))
        else:
            add(L.PAGE_HEADER, " ".join(_words(rng, rng.randint(2, 4))))
    return spans


# --------------------------------------------------------------------------
# typesetting (the synthetic "PDF backend")
# --------------------------------------------------------------------------

@dataclass(slots=True)
class TypesetElement:
    span_ix: int            # index into the input span list (-1 = none)
    label: str
    page_no: int
    l: float
    t: float
    r: float
    b: float
    cell_ixs: list[int] = field(default_factory=list)  # page-local cell indices
    lines: list[str] = field(default_factory=list)
    scanned: bool = False  # image-only region: blank cells, OCR fills text


@dataclass(slots=True)
class TypesetPage:
    page_no: int
    width: float
    height: float
    cells: list[dict[str, Any]] = field(default_factory=list)
    elements: list[TypesetElement] = field(default_factory=list)


# typeset list markers split into their own cell ("- " excluded: a bare
# "-" cell would trip sanitize's hyphen-join and glue onto the body)
_MARKER_SPLIT = re.compile(r"^([*•]|\d+\.)\s(.+)$")
_MARKER_ONLY = re.compile(r"[*•]|\d+\.")


def _line_width(text: str, col_w: float, is_last: bool, rng: random.Random) -> float:
    if not is_last:
        return col_w
    return max(24.0, min(col_w, 5.4 * len(text) * (0.85 + 0.3 * rng.random())))


def typeset(doc_id: str, spans: list[dict[str, Any]], cfg: GenConfig) -> list[TypesetPage]:
    """Lay spans out onto pages. Pure function of (doc_id, span kinds+texts,
    cfg.seed) — styling randomness is keyed by doc_id, not by how the span
    list was produced, so the generator and the Spark parse stage (S1)
    compute identical geometry.

    Flow: fill column(s) top to bottom; a table/picture's caption and
    footnote stay attached (gap ATTACH_GAP); a new column/page starts when
    a block doesn't fit. Two-column pages are used only when BOTH reading-order
    modes (rb precedence graph and XY-cut) provably recover flow order
    (checked per page; otherwise the page falls back to one column)."""
    style = random.Random(f"{cfg.seed}:{doc_id}:style")
    pages: list[TypesetPage] = []

    # Group spans into blocks that must stay together vertically:
    # parent + trailing caption/footnote.
    blocks: list[list[int]] = []
    i = 0
    while i < len(spans):
        group = [i]
        if spans[i]["kind"] in (L.TABLE, L.PICTURE):
            j = i + 1
            while j < len(spans) and spans[j]["kind"] in (L.CAPTION, L.FOOTNOTE):
                group.append(j)
                j += 1
            i = j
        else:
            i += 1
        blocks.append(group)

    # list-item marker style, one per document (ListItemMarkerProcessor
    # strips it back off downstream); "" disables marker typesetting.
    # "1." = enumerated style: items number by their position in the
    # consecutive list run — a pure function of the SPAN LIST (not of
    # pagination), so retries/splits can't renumber.
    marker = (
        random.Random(f"{cfg.seed}:{doc_id}:marker").choice(
            ("- ", "• ", "* ", "1.")
        )
        if cfg.process_list_markers
        else ""
    )
    list_number: dict[int, int] = {}
    if marker == "1.":
        run = 0
        for ix, sp in enumerate(spans):
            if sp["kind"] == L.LIST_ITEM:
                run += 1
                list_number[ix] = run
            else:
                run = 0

    # memoized per-span derived data: pure functions of (spans, marker),
    # recomputed otherwise on every placement attempt / column retry
    _rl_cache: dict[int, list[str]] = {}
    _bh_cache: dict[int, float] = {}
    _grid_cache: dict[int, list[list[str]]] = {}

    def rendered_lines(ix: int) -> list[str]:
        """Span text → typeset lines (list items carry the doc marker).
        Cached: callers only read/slice the list (el.lines is write-only
        downstream), so sharing one list per span is safe."""
        lines = _rl_cache.get(ix)
        if lines is None:
            sp = spans[ix]
            lines = sp["text"].split("\n")
            if marker and sp["kind"] == L.LIST_ITEM:
                m = f"{list_number[ix]}. " if marker == "1." else marker
                lines = [m + lines[0]] + lines[1:]
            _rl_cache[ix] = lines
        return lines

    def grid_rows_of(ix: int) -> list[list[str]]:
        rows = _grid_cache.get(ix)
        if rows is None:
            rows = [r.split("\t") for r in spans[ix]["text"].split("\n")]
            _grid_cache[ix] = rows
        return rows

    def _span_height(ix: int) -> float:
        h = _bh_cache.get(ix)
        if h is None:
            sp = spans[ix]
            if sp["kind"] == L.TABLE:
                h = len(sp["text"].split("\n")) * 16.0 + 8.0
            elif sp["kind"] == L.PICTURE:
                h = 90.0
            elif sp["media_ref"].startswith("scan:"):
                h = int(sp["media_ref"][5:]) * LEADING
            else:
                h = len(sp["text"].split("\n")) * LEADING
            _bh_cache[ix] = h
        return h

    def block_height(group: list[int], col_w: float) -> float:
        h = 0.0
        for k, ix in enumerate(group):
            h += _span_height(ix)
            if k + 1 < len(group):
                h += ATTACH_GAP
        return h

    def place_block(page: TypesetPage, group: list[int], x0: float, col_w: float, y: float) -> float:
        rng = random.Random(f"{cfg.seed}:{doc_id}:p{page.page_no}:b{group[0]}")
        for k, ix in enumerate(group):
            sp = spans[ix]
            kind = sp["kind"]
            if kind == L.PICTURE:
                w = col_w * (0.6 + 0.35 * rng.random())
                h = 60.0 + 60.0 * rng.random()
                el = TypesetElement(ix, kind, page.page_no, x0, y, x0 + w, y + h)
                page.elements.append(el)
                y += h
            elif kind == L.TABLE:
                grid_rows = grid_rows_of(ix)
                n_rows = len(grid_rows)
                n_cols = max(len(r) for r in grid_rows)
                cw, rh = col_w / n_cols, 16.0
                el = TypesetElement(ix, kind, page.page_no, x0, y,
                                    x0 + col_w, y + n_rows * rh + 8.0)
                for rr, row_cells in enumerate(grid_rows):
                    span_first = n_cols - len(row_cells) + 1
                    cc = 0
                    for j, wtext in enumerate(row_cells):
                        span = span_first if j == 0 else 1
                        if wtext == "^":  # merged with the cell above
                            cc += span
                            continue
                        # rows covered: this cell plus consecutive "^"
                        # below in the same column → a TALL token (ucel)
                        down = 1
                        while (
                            rr + down < n_rows
                            and span == 1
                            and j < len(grid_rows[rr + down])
                            and len(grid_rows[rr + down]) == n_cols
                            and grid_rows[rr + down][j] == "^"
                        ):
                            down += 1
                        cl = x0 + cc * cw + 3.0
                        ct = y + 4.0 + rr * rh
                        if span > 1:
                            cr = cl + span * cw - 6.0  # wide token → lcel span
                        else:
                            cr = cl + max(10.0, min(cw - 6.0, 5.4 * len(wtext)))
                        cb = ct + (down - 1) * rh + LINE_H
                        cell = {
                            "index": len(page.cells),
                            "text": wtext,
                            "l": cl, "t": ct, "r": cr, "b": cb,
                            "from_ocr": False, "confidence": 1.0,
                        }
                        page.cells.append(cell)
                        el.cell_ixs.append(cell["index"])
                        cc += span
                el.lines = [w for r in grid_rows for w in r if w != "^"]
                page.elements.append(el)
                y = el.b
            else:  # text-like: one cell per line
                scanned = sp["media_ref"].startswith("scan:")
                if scanned:
                    # blank cells: the parse backend "sees" no text here
                    lines = [""] * int(sp["media_ref"][5:])
                else:
                    lines = rendered_lines(ix)
                y = place_lines(page, ix, kind, lines, x0, col_w, y, rng,
                                scanned=scanned)
            y += ATTACH_GAP if k + 1 < len(group) else 0.0
        return y

    def place_lines(page: TypesetPage, ix: int, kind: str, lines: list[str],
                    x0: float, col_w: float, y: float, rng: random.Random,
                    scanned: bool = False) -> float:
        el = TypesetElement(ix, kind, page.page_no, x0, y, x0, y,
                            scanned=scanned)
        cells = page.cells
        cell_ixs = el.cell_ixs

        def emit_cell(text: str, cl: float, cr: float) -> None:
            index = len(cells)
            cells.append({
                "index": index,
                "text": text,
                "l": cl, "t": y, "r": cr, "b": y + LINE_H,
                "from_ocr": False, "confidence": 1.0,
            })
            cell_ixs.append(index)

        for li, line in enumerate(lines):
            last = li == len(lines) - 1
            # multi-line items only: an extra cell changes the sanitize
            # line count, and sanitize's 1-line path skips normalization
            # — splitting a 1-line item would break text parity
            m = _MARKER_SPLIT.match(line) if (
                li == 0 and kind == L.LIST_ITEM and marker and len(lines) >= 2
            ) else None
            if m:
                # the marker is its own pdf cell (real parsers emit the
                # bullet/number as a separate word box — the geometry the
                # marker-only detection-noise case needs)
                mtxt, body = m.group(1), m.group(2)
                mw = 5.4 * len(mtxt)
                emit_cell(mtxt, x0, x0 + mw)
                bx = x0 + mw + 4.0
                w = _line_width(body, col_w - (mw + 4.0), last, rng)
                emit_cell(body, bx, bx + w)
            else:
                w = _line_width(line, col_w, last, rng)
                emit_cell(line, x0, x0 + w)
            y += LEADING
        y -= LEADING - LINE_H  # element bottom = last line bottom
        el.l = x0
        el.r = max(page.cells[c]["r"] for c in el.cell_ixs)
        el.b = y
        el.lines = lines
        page.elements.append(el)
        return y

    def place_text_part(page: TypesetPage, ix: int, x0: float, col_w: float,
                        y: float, start: int, end: int) -> float:
        """One PART of a split paragraph — its own element, same span_ix;
        the merge predictor re-joins the parts downstream."""
        rng = random.Random(f"{cfg.seed}:{doc_id}:p{page.page_no}:b{ix}:s{start}")
        return place_lines(page, ix, spans[ix]["kind"],
                           rendered_lines(ix)[start:end], x0, col_w, y, rng)

    def page_flow_ok(page: TypesetPage) -> bool:
        """Check both reading-order modes return flow order for this
        page's elements. Calls the per-page kernels directly (the page is
        single by construction) — identical to predict_reading_order's
        single-page grouping, minus the dict packing."""
        els = page.elements
        boxes = [(e.l, e.t, e.r, e.b) for e in els]
        flow = list(range(len(els)))
        return (
            _rb_order(boxes, flow, [e.label for e in els]) == flow
            and _xy_cut(boxes, flow) == flow
        )

    def fill_column(page: TypesetPage, x0: float, col_w: float, cur: int,
                    carry: tuple[int, int] | None):
        """Fill one column top to bottom. ``carry`` = (span_ix,
        start_line) of a paragraph remainder from the previous column /
        page; it places FIRST (flow order). A plain multi-line TEXT
        block that doesn't fit splits when ≥2 lines fit here and ≥2
        remain (≥2 keeps both parts on sanitize_text's multi-line path,
        whose unicode normalization a 1-line element skips). Returns the
        advanced (cur, carry)."""
        y = BODY_TOP
        while True:
            if carry is not None:
                ix, start = carry
                m = len(rendered_lines(ix)) - start
                k_max = int((BODY_BOTTOM - y) // LEADING)
                if m <= k_max:
                    y = place_text_part(page, ix, x0, col_w, y, start,
                                        start + m)
                    y += PARA_GAP
                    carry = None
                    continue
                if k_max >= 2 and m >= 4:
                    k_fit = min(k_max, m - 2)
                    place_text_part(page, ix, x0, col_w, y, start,
                                    start + k_fit)
                    carry = (ix, start + k_fit)
                elif y == BODY_TOP:  # tiny column remnant: place whole
                    place_text_part(page, ix, x0, col_w, y, start, start + m)
                    carry = None
                return cur, carry
            if cur >= len(blocks):
                return cur, carry
            group = blocks[cur]
            h = block_height(group, col_w)
            if y > BODY_TOP and y + h > BODY_BOTTOM:
                sp = spans[group[0]]
                if (
                    cfg.enable_merges
                    and len(group) == 1
                    and sp["kind"] == L.TEXT
                    and not sp["media_ref"].startswith("scan:")
                ):
                    n = len(rendered_lines(group[0]))
                    k_max = int((BODY_BOTTOM - y) // LEADING)
                    if n >= 4 and 2 <= k_max < n:
                        k_fit = min(k_max, n - 2)
                        place_text_part(page, group[0], x0, col_w, y, 0,
                                        k_fit)
                        carry = (group[0], k_fit)
                        cur += 1
                return cur, carry
            y = place_block(page, group, x0, col_w, y)
            y += PARA_GAP
            cur += 1

    bi = 0
    carry: tuple[int, int] | None = None
    page_no = 0
    while bi < len(blocks) or carry is not None:
        for attempt_cols in (2 if style.random() < cfg.two_col_frac else 1, 1):
            page = TypesetPage(page_no, PAGE_W, PAGE_H)
            cur, cur_carry = bi, carry
            if attempt_cols == 1:
                col_xs = [(MARGIN, PAGE_W - 2 * MARGIN)]
            else:
                cw = (PAGE_W - 2 * MARGIN - COL_GAP) / 2
                col_xs = [(MARGIN, cw), (MARGIN + cw + COL_GAP, cw)]
            for (x0, col_w) in col_xs:
                cur, cur_carry = fill_column(page, x0, col_w, cur, cur_carry)
                if cur >= len(blocks) and cur_carry is None:
                    break
            if attempt_cols == 1 or page_flow_ok(page):
                bi, carry = cur, cur_carry
                pages.append(page)
                break
            # else: retry same blocks as single column
        page_no += 1
        if page_no > 2000:  # safety
            break
    return pages


# --------------------------------------------------------------------------
# synthetic layout detections (the fake RT-DETR)
# --------------------------------------------------------------------------

def element_to_dict(el: TypesetElement) -> dict[str, Any]:
    """Serialize the fields :func:`synth_detections` reads (the page-image
    stand-in carried across the staged S1→detect boundary). ``lines`` is
    deliberately dropped — the detector never reads it."""
    return {
        "span_ix": el.span_ix,
        "label": el.label,
        "l": el.l, "t": el.t, "r": el.r, "b": el.b,
        "cell_ixs": list(el.cell_ixs),
        "scanned": el.scanned,
    }


def element_from_dict(d: dict[str, Any], page_no: int) -> TypesetElement:
    return TypesetElement(
        span_ix=int(d["span_ix"]),
        label=d["label"],
        page_no=page_no,
        l=float(d["l"]), t=float(d["t"]), r=float(d["r"]), b=float(d["b"]),
        cell_ixs=[int(i) for i in d["cell_ixs"]],
        scanned=bool(d["scanned"]),
    )


def synth_detections(
    doc_id: str, page: TypesetPage, cfg: GenConfig
) -> list[dict[str, Any]]:
    """Raw cluster proposals for one page: true element boxes + recoverable
    noise. Mirrors the predictor output dicts
    (fork/layout/layout_predictor_gpu.py:312: {l,t,r,b,label,confidence})."""
    rng = random.Random(f"{cfg.seed}:{doc_id}:p{page.page_no}:noise")
    dets: list[dict[str, Any]] = []
    next_id = 0

    def emit(label: str, l: float, t: float, r: float, b: float, conf: float) -> None:
        nonlocal next_id
        dets.append(
            {"id": next_id, "label": label, "l": l, "t": t, "r": r, "b": b,
             "confidence": conf}
        )
        next_id += 1

    noise = cfg.noise
    # FORM wrapper proposals over runs of >=2 consecutive single-column
    # text-ish elements (exercises child assignment :503-530).
    form_members: set[int] = set()
    if noise and rng.random() < 0.15:
        idxs = [
            n for n, e in enumerate(page.elements)
            if e.label in (L.TEXT, L.LIST_ITEM) and e.span_ix >= 0
        ]
        runs = [
            (a, b) for a, b in zip(idxs, idxs[1:])
            if b == a + 1 and page.elements[a].label in (L.TEXT, L.LIST_ITEM)
            and abs(page.elements[a].l - page.elements[b].l) < 1.0
        ]
        if runs:
            a, b = runs[rng.randrange(len(runs))]
            ea, eb = page.elements[a], page.elements[b]
            emit(L.FORM, min(ea.l, eb.l) - 2, ea.t - 2, max(ea.r, eb.r) + 2,
                 eb.b + 2, 0.8)
            form_members.update((a, b))

    for n, el in enumerate(page.elements):
        conf = 0.55 + 0.4 * rng.random()
        label = el.label
        if el.label == L.PICTURE:
            emit(L.PICTURE, el.l, el.t, el.r, el.b, max(conf, 0.6))
            if noise and rng.random() < 0.3:  # inset duplicate → picture merge
                emit(L.PICTURE, el.l + 2, el.t + 2, el.r - 2, el.b - 2,
                     max(conf - 0.1, 0.55))
            continue
        if el.label == L.TABLE:
            emit(L.TABLE, el.l, el.t, el.r, el.b, max(conf, 0.6))
            if noise and rng.random() < 0.3:  # inset duplicate → wrapper merge
                emit(L.TABLE, el.l + 2, el.t + 2, el.r - 2, el.b - 2,
                     max(conf - 0.1, 0.55))
            continue
        if el.scanned:
            # image-only region: exact box (no cells will adjust it; the
            # OCR stage keys its synthetic text on this exact geometry)
            emit(label, el.l, el.t, el.r, el.b, max(conf, 0.6))
            continue
        # marker-only box: OCR/layout often splits a list bullet/number
        # into its own detection; the ListItemMarkerProcessor merges it
        # forward into the body box (readingorder_model.py:15-17 role).
        # Only when the typeset marker IS its own cell (multi-line items)
        if (
            noise
            and el.label == L.LIST_ITEM
            and len(el.cell_ixs) >= 2
            and _MARKER_ONLY.fullmatch(page.cells[el.cell_ixs[0]]["text"])
            and rng.random() < 0.2
        ):
            mc = page.cells[el.cell_ixs[0]]
            body = [page.cells[c] for c in el.cell_ixs[1:]]
            emit(el.label, mc["l"] - 1, mc["t"] - 1, mc["r"] + 1,
                 mc["b"] + 1, max(conf, 0.6))
            emit(el.label, min(c["l"] for c in body) - 1,
                 min(c["t"] for c in body) - 1,
                 max(c["r"] for c in body) + 1,
                 max(c["b"] for c in body) + 1, max(conf, 0.6))
            continue
        # regular text-like detection
        if noise and el.label == L.TEXT and len(el.cell_ixs) == 1 and rng.random() < 0.08:
            continue  # missing detection → orphan cell path (:436-455)
        if el.label == L.SECTION_HEADER and noise and rng.random() < 0.5:
            label = L.TITLE  # remap case (:417-420)
        l, t, r, b = el.l, el.t, el.r, el.b
        if noise and rng.random() < 0.2:  # outward jitter; envelope-adjust fixes
            l -= 1.5 * rng.random(); t -= 1.5 * rng.random()
            r += 1.5 * rng.random(); b += 1.5 * rng.random()
        if noise and not cfg.keep_empty_clusters and rng.random() < 0.07:
            # right-sliver competitor listed first: argmax assignment must
            # still route every cell to the full box (left-anchored lines
            # never sit mostly inside the right sliver), leaving the sliver
            # empty → dropped by the empty filter (:426-434). Suppressed
            # when empty clusters are kept (OCR mode) — an empty competitor
            # would otherwise become a phantom OCR region.
            emit(label, el.l + 0.45 * (el.r - el.l), el.t, el.r, el.b, conf)
        emit(label, l, t, r, b, conf)
        if noise and rng.random() < 0.12:
            # sub-threshold spurious proposal (filtered at :410-415)
            thr = L.CONFIDENCE_THRESHOLDS[label]
            emit(label, l, t, r, b, max(0.05, thr - 0.05 - 0.1 * rng.random()))

    if noise and rng.random() < 0.06:
        # full-page picture proposal (filtered at :488-501)
        emit(L.PICTURE, 2.0, 2.0, page.width - 2.0, page.height - 2.0, 0.9)

    if cfg.dense_noise_boxes > 0:
        # pathological density stress (no rng — deterministic tiling, and
        # zero draws so the base noise stream above is untouched): tiny
        # disjoint above-threshold FORMULA proposals inside the largest
        # text element's cell envelope. Each is fully inside the anchor
        # (IoS = 1 edge to it, no tile-tile edges), so overlap dedup
        # absorbs the pile into the anchor and output spans are EXACT.
        anchors = [
            e for e in page.elements
            if e.label == L.TEXT and not e.scanned and e.cell_ixs
        ]
        if anchors:
            a = max(anchors, key=lambda e: (e.r - e.l) * (e.b - e.t))
            acells = [page.cells[i] for i in a.cell_ixs]
            l0 = min(c["l"] for c in acells) + 0.5
            t0 = min(c["t"] for c in acells) + 0.5
            r0 = max(c["r"] for c in acells) - 0.5
            b0 = max(c["b"] for c in acells) - 0.5
            bw, bh = r0 - l0, b0 - t0
            if bw > 4.0 and bh > 4.0:
                n = cfg.dense_noise_boxes
                cols = max(1, int(math.ceil(math.sqrt(n * bw / bh))))
                nrows = max(1, int(math.ceil(n / cols)))
                dw, dh = bw / cols, bh / nrows
                conf = L.CONFIDENCE_THRESHOLDS[L.FORMULA] + 0.01
                k = 0
                for ri in range(nrows):
                    for ci in range(cols):
                        if k >= n:
                            break
                        x, y = l0 + ci * dw, t0 + ri * dh
                        emit(L.FORMULA, x + 0.1 * dw, y + 0.1 * dh,
                             x + 0.6 * dw, y + 0.6 * dh, conf)
                        k += 1
    return dets


# --------------------------------------------------------------------------
# document-level generation
# --------------------------------------------------------------------------

def doc_id_for(doc_index: int) -> str:
    return f"doc-{doc_index:09d}"


def generate_doc(cfg: GenConfig, doc_index: int) -> dict[str, Any]:
    """One input-table row: {doc_id, spans:[{kind,text,media_ref,offset}]}.

    Picture media_refs are filled from typeset geometry so the pipeline's
    content-addressed crop refs round-trip exactly."""
    doc_id = doc_id_for(doc_index)
    spans = gen_doc_spans(cfg, doc_index)
    pages = typeset(doc_id, spans, cfg)
    for page in pages:
        for el in page.elements:
            if el.label == L.PICTURE and el.span_ix >= 0:
                spans[el.span_ix]["media_ref"] = media_ref_for_crop(
                    doc_id, page.page_no, el.l, el.t, el.r, el.b
                )
            elif el.scanned and el.span_ix >= 0:
                # the expected extraction for a scanned region is what the
                # (synthetic) OCR recognizes from the exact crop geometry
                from .kernels.convert import synth_ocr_text

                spans[el.span_ix]["text"] = synth_ocr_text(
                    doc_id, page.page_no, el.l, el.t, el.r, el.b
                )
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": s["kind"], "text": s["text"],
             "media_ref": s["media_ref"], "offset": i}
            for i, s in enumerate(spans)
        ],
    }


def generate_corpus(cfg: GenConfig) -> list[dict[str, Any]]:
    return [generate_doc(cfg, i) for i in range(cfg.n_docs)]


def clustered_embeddings_dataframe(
    spark,
    n_vecs: int = 8192,
    dim: int = 64,
    n_clusters: int = 8,
    noise: float = 0.05,
    seed: int = 7,
    num_partitions: int = 16,
):
    """Planted-cluster embedding table (VERDICT r5 #5): ``n_clusters``
    random unit centers, each vector = its cluster's center + N(0,
    noise²) per component. The driver's synthetic embeddings are near-
    isotropic, which bounds ANY partition-based ANN's recall at its scan
    fraction; this table has real structure, so an index that captures
    it shows recall far ABOVE scan fraction (recorded in the bench).

    Distributed and deterministic PER ROW: each vec_id derives its own
    numpy generator from (seed, vec_id) and cluster = vec_id mod
    n_clusters, so any partitioning/reordering yields identical rows.
    Schema matches the driver's embeddings table (vec_id, embedding
    array<float>) with cluster_id as the planted ground truth."""
    import numpy as _np

    centers = _np.random.default_rng(seed).standard_normal(
        (n_clusters, dim))
    centers /= _np.linalg.norm(centers, axis=1, keepdims=True)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            cl = (ids % n_clusters).astype(int)
            vecs = []
            for vid, c in zip(ids, cl):
                rng = _np.random.default_rng(seed * 1_000_003 + int(vid))
                v = centers[c] + noise * rng.standard_normal(dim)
                vecs.append([float(x) for x in v.astype(_np.float32)])
            yield pd.DataFrame(
                {"vec_id": ids, "cluster_id": cl, "embedding": vecs})

    return spark.range(n_vecs, numPartitions=num_partitions).mapInPandas(
        fn, "vec_id long, cluster_id int, embedding array<float>")
