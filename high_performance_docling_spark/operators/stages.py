"""Pipeline stages as vectorized Arrow UDF DataFrame transforms.

Stage DAG (SURVEY.md §7):

  S0 docs      (doc_id, spans[])                      input corpus
  S1 parse     docs → pages (cells + detections)      mapInPandas, 1→N rows
  S2+S3+S6     pages → page elements                  mapInPandas, 1→1 rows
  S7 assemble  elements → (doc_id, spans_out[])       groupBy(doc_id).applyInPandas

Scale design:
  - S1 explodes documents to page grain immediately, so a 400-page
    mega-doc becomes 400 independent rows — skew from long documents is
    handled by repartitioning the page table, not by bigger tasks
    (reference analogue: batch splitter, lambda_preprocessor.py:47-58).
  - S2/S3/S6 are narrow (no shuffle): Catalyst pipelines the chained
    mapInPandas stages into one pass over each partition.
  - The ONLY shuffle in the whole pipeline is the final groupBy(doc_id);
    elements are text-sized (images/cells already dropped), so the
    shuffled payload is small.
  - Inside each stage the work is batched NumPy/Python over Arrow record
    batches — no per-row Python UDFs (input_hint requirement).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator
from typing import Any

import pandas as pd

from ..corpus import GenConfig, synth_detections, typeset, TypesetPage
from ..kernels.assemble import assemble_page_elements
from ..kernels.layout_postprocess import postprocess_page
from ..kernels.reading_order import assemble_spans
from ..schemas import ELEMENTS_SCHEMA, PAGES_SCHEMA, SPANS_OUT_SCHEMA


def _write_lineage(lineage_dir: str | None, stage: str, n_in: int, n_out: int, t0: float) -> None:
    """Append a per-partition lineage row (SURVEY.md §2.9). Executor-local
    file append; on a real cluster this directory is shared storage."""
    if not lineage_dir:
        return
    try:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
    except Exception:
        pid = -1
    os.makedirs(lineage_dir, exist_ok=True)
    row = {
        "stage": stage,
        "partition_id": pid,
        "input_rows": n_in,
        "output_rows": n_out,
        "wall_ms": (time.monotonic() - t0) * 1000.0,
    }
    with open(os.path.join(lineage_dir, f"{stage}-{pid}-{os.getpid()}.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


# --------------------------------------------------------------------------
# S1: parse — docs → pages (the synthetic "PDF backend" scan)
# --------------------------------------------------------------------------

def parse_stage(docs_df, cfg: GenConfig, lineage_dir: str | None = None):
    """(doc_id, spans[]) → one row per page with cells + raw detections.

    Reference analogue: per-page load/parse + layout predictor invocation
    (lambda_preprocessor.py:15-44 + layout_predictor_gpu.py:253-315); the
    neural detector is replaced by the deterministic synthetic detector,
    batching semantics preserved (whole Arrow batch per call).
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        n_in = n_out = 0
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                n_in += 1
                span_list = [dict(s) for s in spans]
                span_list.sort(key=lambda s: s["offset"])
                pages = typeset(doc_id, span_list, cfg)
                for page in pages:
                    dets = synth_detections(doc_id, page, cfg)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "page_no": page.page_no,
                            "width": page.width,
                            "height": page.height,
                            "cells": page.cells,
                            "detections": dets,
                        }
                    )
            n_out += len(rows)
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "page_no", "width", "height", "cells", "detections"],
            )
        _write_lineage(lineage_dir, "parse", n_in, n_out, t0)

    return docs_df.mapInPandas(fn, PAGES_SCHEMA)


# --------------------------------------------------------------------------
# S2+S3+S6: layout postprocess + page assembly — pages → page elements
# --------------------------------------------------------------------------

def layout_stage(pages_df, cfg: GenConfig, lineage_dir: str | None = None):
    """One row per page in, one row per page out: run the layout
    post-processor (layout_postprocessor.py port) and page assembly
    (page_assemble_model.py port) on each page. Narrow — no shuffle."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        n = 0
        for pdf in batches:
            out_elements = []
            for doc_id, page_no, width, height, cells, dets in zip(
                pdf["doc_id"], pdf["page_no"], pdf["width"], pdf["height"],
                pdf["cells"], pdf["detections"],
            ):
                n += 1
                clusters = postprocess_page(
                    float(width), float(height),
                    [dict(c) for c in cells], [dict(d) for d in dets],
                )
                els = assemble_page_elements(doc_id, int(page_no), clusters)
                out_elements.append(
                    [
                        {
                            "label": e["label"],
                            "l": e["l"], "t": e["t"], "r": e["r"], "b": e["b"],
                            "text": e["text"],
                            "media_ref": e["media_ref"],
                            "children": e["children"],
                        }
                        for e in els
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "page_no": pdf["page_no"],
                    "elements": out_elements,
                }
            )
        _write_lineage(lineage_dir, "layout", n, n, t0)

    return pages_df.mapInPandas(fn, ELEMENTS_SCHEMA)


# --------------------------------------------------------------------------
# S7: document assembly — elements → ordered spans per doc
# --------------------------------------------------------------------------

def doc_assemble_stage(elements_df, lineage_dir: str | None = None):
    """groupBy(doc_id): sort pages, assign global cids, run reading order +
    caption/footnote attachment, emit the ordered span array.

    The in-group page sort makes the result independent of shuffle order
    (SURVEY.md §7 "never rely on shuffle order"). This is the pipeline's
    single shuffle.
    """
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("page_no")
        doc_id = pdf["doc_id"].iloc[0]
        elements: list[dict[str, Any]] = []
        for page_no, els in zip(pdf["page_no"], pdf["elements"]):
            for e in els:
                el = dict(e)
                el["page_no"] = int(page_no)
                children = el.get("children")
                el["children"] = [] if children is None else [dict(c) for c in children]
                el["cid"] = len(elements)
                elements.append(el)
        spans = assemble_spans(elements)
        return pd.DataFrame({"doc_id": [doc_id], "spans": [spans]})

    return elements_df.groupBy("doc_id").applyInPandas(fn, SPANS_OUT_SCHEMA)
