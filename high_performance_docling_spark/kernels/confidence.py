"""ConfidenceReport kernels — the reference's quality scoring
(base_models.py:379-459) fed by the fork's layout-stage hooks
(fork/layout/layout_model.py:243-249), completed with public analogues
for the two sub-scores the fork never sets.

Per page (PageConfidenceScores):
  - layout_score = mean confidence of the post-processed clusters (:243)
  - ocr_score    = mean confidence of from_ocr cells (:247; NaN if none)
  - parse_score  = low-decile (q=0.10) of per-cell text-quality ratings —
    the public docling parse-score analogue (upstream docling's page
    preprocess rates each parsed cell's text and takes a low quantile;
    the fork drops that stage, so this is our own deterministic rating,
    see text_quality). NaN when the page has no cells.
  - table_score  = mean confidence of TABLE-family clusters (TABLE /
    DOCUMENT_INDEX) — the TableFormer-confidence analogue; NaN when the
    page has no tables.
  - mean_score = nanmean([ocr, table, layout, parse])   (:408-419)
  - low_score  = nanquantile(same, q=0.05)              (:422-434)
  - grades: <0.5 poor, <0.8 fair, <0.9 good, >=0.9 excellent,
    NaN → unspecified (:386-395)

Per document (ConfidenceReport): mean_score = nanmean of page means,
low_score = nanMEAN of page lows (:437-459 — a mean, not a quantile).
"""

from __future__ import annotations

import math
import warnings
from typing import Any

import numpy as np

from ..labels import TABLE_LABELS

NAN = float("nan")

_OK_PUNCT = set(",.;:!?'\"()-/%&")


def text_quality(text: str) -> float:
    """Deterministic per-cell text-quality rating in [0, 1] — the public
    analogue of docling's parse-cell rating: 1.0 for clean printable
    prose; penalized for non-printable characters, symbol-dominated
    content, and single-character token fragments (the classic signature
    of a bad PDF text layer)."""
    if not text or not text.strip():
        return 0.0
    t = text.strip()
    printable = sum(ch.isprintable() for ch in t) / len(t)
    clean = (
        sum(ch.isalnum() or ch.isspace() or ch in _OK_PUNCT for ch in t)
        / len(t)
    )
    toks = t.split()
    frag = sum(len(w) == 1 for w in toks) / len(toks)
    return printable * clean * (1.0 - 0.5 * frag)


def score_to_grade(score: float | None) -> str:
    """base_models.py:386-395 (NaN falls through every branch)."""
    if score is None or math.isnan(score):
        return "unspecified"
    if score < 0.5:
        return "poor"
    if score < 0.8:
        return "fair"
    if score < 0.9:
        return "good"
    return "excellent"


def _nanmean(vals: list[float]) -> float:
    xs = [v for v in vals if not math.isnan(v)]
    return sum(xs) / len(xs) if xs else NAN


def page_confidence(page_no: int, clusters: list[dict[str, Any]]) -> dict[str, Any]:
    """PageConfidenceScores for one post-processed page."""
    confs = [float(c["confidence"]) for c in clusters]
    layout = _nanmean(confs) if confs else NAN
    ocr_confs = [
        float(cell["confidence"])
        for c in clusters
        for cell in c["cells"]
        if cell.get("from_ocr")
    ]
    ocr = _nanmean(ocr_confs) if ocr_confs else NAN
    cell_quality = [
        text_quality(cell.get("text", ""))
        for c in clusters
        for cell in c["cells"]
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
        parse = (
            float(np.nanquantile(cell_quality, q=0.10)) if cell_quality else NAN
        )
        table_confs = [
            float(c["confidence"]) for c in clusters
            if c.get("label") in TABLE_LABELS
        ]
        table = _nanmean(table_confs) if table_confs else NAN
        arr = [ocr, table, layout, parse]  # base_models.py:412-418 order
        mean = float(np.nanmean(arr))
        low = float(np.nanquantile(arr, q=0.05)) if not all(
            math.isnan(v) for v in arr
        ) else NAN
    # unset scores serialize as SQL NULL (Arrow's pandas conversion maps
    # NaN to null anyway); the NaN semantics live in the math above
    return {
        "page_no": int(page_no),
        "parse_score": _out(parse),
        "layout_score": _out(layout),
        "table_score": _out(table),
        "ocr_score": _out(ocr),
        "mean_score": _out(mean),
        "low_score": _out(low),
        "mean_grade": score_to_grade(mean),
        "low_grade": score_to_grade(low),
    }


def _out(v: float) -> float | None:
    return None if math.isnan(v) else v


def doc_confidence(pages: list[dict[str, Any]]) -> dict[str, Any]:
    """ConfidenceReport roll-up: nanmean of page means, nanMEAN of page
    lows (base_models.py:443-459)."""
    mean = _nanmean([p["mean_score"] for p in pages if p["mean_score"] is not None])
    low = _nanmean([p["low_score"] for p in pages if p["low_score"] is not None])
    return {
        "mean_score": _out(mean),
        "low_score": _out(low),
        "mean_grade": score_to_grade(mean),
        "low_grade": score_to_grade(low),
        "pages": pages,
    }
