#!/usr/bin/env python3
"""Regenerate the frozen golden fixtures (tests/goldens/*.json) after a
DELIBERATE corpus/kernel semantics change. The formats mirror what
tests/test_regression_golden.py asserts; run the suite afterwards —
goldens are only as good as the review of their diff.

Independent cross-check (advisory r5: a corpus change that forces
golden regeneration makes the golden-regression tests vacuous for that
change): before writing ANY golden file this script asserts the
round-trip invariant — on a noise-free corpus (different seeds than
the goldens) extraction must reproduce the input spans exactly. The
invariant depends only on the generator/extractor CONTRACT, not on any
frozen output, so a behavioral regression cannot be baked into fresh
goldens without tripping it here first. The DuckDB registry oracles
(scripts/verify_queries.py) remain the second independent check."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from high_performance_docling_spark.corpus import (  # noqa: E402
    GenConfig,
    generate_doc,
    synth_detections,
    typeset,
)
from high_performance_docling_spark.kernels.layout_postprocess import (  # noqa: E402
    postprocess_page,
)
from high_performance_docling_spark.kernels.table_decode import (  # noqa: E402
    table_structure_for_tokens,
)
from high_performance_docling_spark.oracle import extract_doc_spans  # noqa: E402
from high_performance_docling_spark.testing.regression import (  # noqa: E402
    canonical_layout,
    spans_hash,
    table_hash,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "tests", "goldens")


def regen_spans() -> None:
    cfg = GenConfig(seed=42, n_docs=10)
    out = {}
    for i in range(10):
        d = generate_doc(cfg, i)
        spans = extract_doc_spans(d["doc_id"], d["spans"], cfg)
        out[d["doc_id"]] = {
            "n_spans": len(spans),
            "hash": spans_hash(spans),
            "spans": [
                {"kind": s["kind"], "text": s["text"],
                 "media_ref": s["media_ref"], "order": s["order"]}
                for s in spans
            ],
        }
    with open(os.path.join(GOLDEN_DIR, "spans_seed42.json"), "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    print(f"spans_seed42.json: {len(out)} docs")


def regen_enriched_spans() -> None:
    """Docling-parity profile goldens (enrichment ON — VERDICT r4 #4):
    the invariant is the ENRICHED span sequence."""
    from high_performance_docling_spark.corpus import docling_parity_config

    cfg = docling_parity_config(seed=42, n_docs=10)
    out = {}
    for i in range(10):
        d = generate_doc(cfg, i)
        spans = extract_doc_spans(d["doc_id"], d["spans"], cfg)
        out[d["doc_id"]] = {
            "n_spans": len(spans),
            "hash": spans_hash(spans),
            "spans": [
                {"kind": s["kind"], "text": s["text"],
                 "media_ref": s["media_ref"], "order": s["order"]}
                for s in spans
            ],
        }
    with open(os.path.join(GOLDEN_DIR, "spans_enriched_seed42.json"), "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    n_formula = sum(
        1 for doc in out.values() for s in doc["spans"] if s["kind"] == "formula"
    )
    print(f"spans_enriched_seed42.json: {len(out)} docs, {n_formula} formula spans")


def regen_layout_and_tables() -> None:
    cfg = GenConfig(seed=42, n_docs=6)
    layout, tables = {}, {}
    for i in range(6):
        d = generate_doc(cfg, i)
        for p in typeset(d["doc_id"], d["spans"], cfg)[:2]:
            dets = synth_detections(d["doc_id"], p, cfg)
            clusters = postprocess_page(p.width, p.height, p.cells, dets)
            layout[f"{d['doc_id']}:p{p.page_no}"] = canonical_layout(clusters)
            for cl in clusters:
                if cl["label"] in ("table", "document_index") and cl["cells"]:
                    toks = [
                        {"id": c["index"], "text": c["text"],
                         "bbox": [c["l"], c["t"], c["r"], c["b"]]}
                        for c in cl["cells"]
                    ]
                    res = table_structure_for_tokens(
                        [cl["l"], cl["t"], cl["r"], cl["b"]], toks
                    )
                    if res is None:
                        continue
                    tables[f"{d['doc_id']}:p{p.page_no}:c{cl['id']}"] = {
                        "hash": table_hash(res["tf_cells"]),
                        "num_rows": res["num_rows"],
                        "num_cols": res["num_cols"],
                    }
    with open(os.path.join(GOLDEN_DIR, "layout_seed42.json"), "w") as f:
        json.dump(layout, f, indent=1, ensure_ascii=False)
    with open(os.path.join(GOLDEN_DIR, "tables_seed42.json"), "w") as f:
        json.dump(tables, f, indent=1, ensure_ascii=False)
    print(f"layout_seed42.json: {len(layout)} pages")
    print(f"tables_seed42.json: {len(tables)} tables")


def validate_roundtrip() -> None:
    """Gate: input == output on noise-free corpora (seeds disjoint from
    the goldens') BEFORE any golden is rewritten. Mirrors
    tests/test_corpus_roundtrip.py::test_noise_free_roundtrip_exact."""
    from high_performance_docling_spark.kernels.sanitize import sanitize_text
    import high_performance_docling_spark.labels as L

    checked = 0
    for seed in (7, 101):
        cfg = GenConfig(seed=seed, n_docs=20, noise=False)
        for i in range(cfg.n_docs):
            d = generate_doc(cfg, i)
            out = extract_doc_spans(d["doc_id"], d["spans"], cfg)
            assert len(out) == len(d["spans"]), (seed, d["doc_id"])
            for s_in, s_out in zip(d["spans"], out):
                if s_in["kind"] == L.PICTURE:
                    exp = (s_in["kind"], "", s_in["media_ref"])
                elif s_in["kind"] == L.TABLE:
                    toks = [t for t in s_in["text"].split() if t != "^"]
                    exp = (s_in["kind"], " ".join(toks), "")
                else:
                    exp = (s_in["kind"],
                           sanitize_text(s_in["text"].split("\n")), "")
                got = (s_out["kind"], s_out["text"], s_out["media_ref"],
                       s_out["order"])
                assert got == exp + (s_in["offset"],), (seed, d["doc_id"])
            checked += 1
    print(f"round-trip invariant: {checked} noise-free docs exact "
          "(independent of all goldens) — proceeding to regen")


if __name__ == "__main__":
    validate_roundtrip()
    regen_spans()
    regen_enriched_spans()
    regen_layout_and_tables()
