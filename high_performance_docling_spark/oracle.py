"""Serial reference-faithful pipeline (the "golden oracle").

Runs the exact same kernels as the Spark stages, eagerly and in-process,
one document at a time — mirroring the reference's single-process flow
(/root/reference/main.py:53-93: preprocess → layout → postprocess →
assemble → reading order). pytest asserts Spark output == this oracle
exactly (FIXTURES.md §5), so the Spark plumbing (Arrow schemas,
partitioning, shuffles, checkpoints) is what the equality tests exercise.
"""

from __future__ import annotations

from typing import Any

from .corpus import GenConfig, typeset
from .kernels.assemble import assemble_page_elements
from .kernels.convert import process_page_batch
from .kernels.reading_order import assemble_spans


def extract_doc_spans(
    doc_id: str, spans: list[dict[str, Any]], cfg: GenConfig
) -> list[dict[str, Any]]:
    """docs-row → ordered output spans [(kind, text, media_ref, order)]."""
    pages = typeset(doc_id, spans, cfg)
    page_clusters = process_page_batch([(doc_id, p) for p in pages], cfg)
    elements: list[dict[str, Any]] = []
    for page, clusters in zip(pages, page_clusters):
        elements.extend(assemble_page_elements(doc_id, page.page_no, clusters))
    for cid, el in enumerate(elements):  # global cids (readingorder_model.py:61)
        el["cid"] = cid
    return assemble_spans(elements)
