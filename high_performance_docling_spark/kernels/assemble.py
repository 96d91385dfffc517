"""Page assembly: final layout clusters → typed page elements.

Port of the reference's PageAssembleModel
(/root/reference/page_assemble_model.py:69-158): text-labeled clusters
become text elements with sanitize-joined cell text; table-labeled
clusters become table elements (text = serialized cell text, since our
span contract carries table content as text); pictures become figure
elements with a content-addressed media_ref (the Spark analogue of the
reference's figure-crop ImageRef, document_assembler.py:62-90); FORM /
KEY_VALUE_REGION become container elements whose children render as
child spans (readingorder_model.py:77-104).
"""

from __future__ import annotations

import hashlib
from typing import Any

from ..labels import (
    CONTAINER_LABELS,
    FIGURE_LABEL,
    TABLE_LABELS,
    TEXT_ELEM_LABELS,
)
from .sanitize import child_text, cluster_text


def media_ref_for_crop(
    doc_id: str, page_no: int, l: float, t: float, r: float, b: float
) -> str:
    """Deterministic content-address for a figure crop.

    In production this is the hash of the cropped pixel region / the
    object-store key (reference crops the page image at
    document_assembler.py:66-90). Without image bytes in the sandbox, the
    crop identity is (doc, page, bbox) at 0.1pt resolution.
    """
    key = f"{doc_id}|{page_no}|{l:.1f},{t:.1f},{r:.1f},{b:.1f}"
    return "img:" + hashlib.sha1(key.encode("utf-8")).hexdigest()[:16]


def assemble_page_elements(
    doc_id: str, page_no: int, clusters: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    """Build the page's element list from post-processed clusters.

    ``clusters``: output of kernels.layout_postprocess.postprocess_page —
    each has id, label, l,t,r,b, confidence, cells (sorted), children.
    Returns element dicts: cid (page-local = cluster id), page_no, label,
    l,t,r,b, text, media_ref, children [{label, text, media_ref}].
    Cluster order is preserved (the reference keeps assembly in cluster
    order; final ordering happens in reading order).
    """
    elements: list[dict[str, Any]] = []
    for cl in clusters:
        label = cl["label"]
        base = {
            "cid": int(cl["id"]),
            "page_no": int(page_no),
            "label": label,
            "l": float(cl["l"]),
            "t": float(cl["t"]),
            "r": float(cl["r"]),
            "b": float(cl["b"]),
            "media_ref": "",
            "children": [],
        }
        if label in TEXT_ELEM_LABELS:
            base["text"] = cluster_text([c["text"] for c in cl["cells"]])
            elements.append(base)
        elif label in TABLE_LABELS:
            # Table text: serialized cell text. When the table-structure
            # stage has produced a grid (added via the S5 stage), its
            # row-major serialization wins; otherwise fall back to the
            # sanitize-join of member cells (reference fallback: empty
            # Table at page_assemble_model.py:114-123).
            structured = cl.get("table_text")
            base["text"] = (
                structured
                if structured is not None
                else cluster_text([c["text"] for c in cl["cells"]])
            )
            elements.append(base)
        elif label == FIGURE_LABEL:
            base["text"] = ""
            base["media_ref"] = media_ref_for_crop(
                doc_id, page_no, cl["l"], cl["t"], cl["r"], cl["b"]
            )
            # pictures render contained clusters as child spans, like
            # containers (readingorder_model.py:263 _add_child_elements);
            # tables deliberately don't (:234 TODO in the reference)
            base["children"] = [
                {
                    "label": child["label"],
                    "text": child_text([c["text"] for c in child["cells"]]),
                    "media_ref": "",
                }
                for child in cl["children"]
            ]
            elements.append(base)
        elif label in CONTAINER_LABELS:
            base["text"] = ""
            base["children"] = [
                {
                    "label": child["label"],
                    # Children use plain space-join, NOT sanitize_text
                    # (readingorder_model.py:86-91).
                    "text": child_text([c["text"] for c in child["cells"]]),
                    "media_ref": "",
                }
                for child in cl["children"]
            ]
            elements.append(base)
        # other labels (none today) are dropped, as in the reference
    return elements
