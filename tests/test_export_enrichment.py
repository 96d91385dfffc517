"""Markdown export, format registry, enrichment kernels."""

from high_performance_docling_spark.kernels.enrichment import (
    enrich_elements,
    extract_code_language,
    most_frequent_edge_color,
)
from high_performance_docling_spark.operators.export import (
    EXTENSION_TO_FORMAT,
    detect_format,
    to_markdown,
)


def test_extract_code_language():
    assert extract_code_language("<_python_> print(1)") == ("print(1)", "python")
    assert extract_code_language("no prefix here") == ("no prefix here", None)
    # DOTALL: body may span lines
    assert extract_code_language("<_go_> a\nb") == ("a\nb", "go")


def test_enrich_elements_batch():
    els = [
        {"label": "code", "text": "<_rust_> fn main() {}"},
        {"label": "text", "text": "plain"},
        {"label": "code", "text": "raw code"},
    ]
    out = enrich_elements(els)
    assert out[0]["text"] == "fn main() {}" and out[0]["code_language"] == "rust"
    assert "code_language" not in out[2]


def test_latexize_rule_families():
    from high_performance_docling_spark.kernels.enrichment import (
        latexize_formula,
    )

    assert latexize_formula("sqrt(x)") == r"\sqrt{x}"
    assert latexize_formula("x^2") == "x^{2}"
    assert latexize_formula("a_i") == "a_{i}"
    assert latexize_formula("p/q") == r"\frac{p}{q}"
    assert latexize_formula("alpha + beta") == r"\alpha + \beta"
    assert latexize_formula("sin y") == r"\sin y"
    assert latexize_formula("a <= b >= c != d -> inf") == \
        r"a \leq b \geq c \neq d \to \infty"
    # composition, rule order: sup/sub convert before frac braces mask them
    assert latexize_formula("v^2 + x_n - p/q <= alpha, sqrt(w) -> inf") == \
        r"v^{2} + x_{n} - \frac{p}{q} \leq \alpha, \sqrt{w} \to \infty"


def test_enrich_formula_golden_and_batch_accounting():
    """Enrichment goldens: frozen LaTeX outputs for a fixture batch, and
    the harness must make exactly ceil(n/5) forwards (batch-5 loop,
    code_formula_model.py:69)."""
    import json
    import pathlib

    from high_performance_docling_spark.kernels import enrichment as EN

    fixtures = [
        "E = m c^2",
        "x_i <= sqrt(b) / gamma",
        "sum k^2 -> inf",
        "delta != epsilon",           # epsilon not in rule table: kept
        "<_py_> f(x)",                # formula label: prefix NOT stripped
        "pi r^2",
        "a/b + c/d",
    ]
    els = [{"label": "formula", "text": t} for t in fixtures]
    stats = {}
    out = EN.enrich_elements(els, stats=stats)
    # batch accounting: 7 elements through the batch-5 loop = 2 forwards
    assert stats["n_forward_calls"] == 2
    golden_path = pathlib.Path(__file__).parent / "goldens" / "enrichment.json"
    got = [e["text"] for e in out]
    if not golden_path.exists():
        golden_path.write_text(json.dumps(got, indent=1))
    assert got == json.loads(golden_path.read_text())


def test_most_frequent_edge_color():
    import numpy as np

    img = np.zeros((10, 10), dtype=np.uint8)
    img[0, :] = 7
    img[-1, :] = 7
    img[:, 0] = 7
    img[:, -1] = 7
    assert most_frequent_edge_color(img) == (7,)


def test_detect_format(spark):
    df = spark.createDataFrame(
        [("a.pdf",), ("b.DOCX",), ("c.weird",)], ["filename"]
    )
    out = {r["filename"]: r["format"] for r in detect_format(df).collect()}
    assert out == {"a.pdf": "pdf", "b.DOCX": "docx", "c.weird": "unknown"}
    assert EXTENSION_TO_FORMAT["htm"] == "html"


def test_to_markdown(spark):
    spans = [
        {"kind": "section_header", "text": "Title", "media_ref": "", "order": 0},
        {"kind": "text", "text": "Body.", "media_ref": "", "order": 1},
        {"kind": "list_item", "text": "item", "media_ref": "", "order": 2},
        {"kind": "picture", "text": "", "media_ref": "img:abc", "order": 3},
        {"kind": "page_footer", "text": "pg 1", "media_ref": "", "order": 4},
        {"kind": "code", "text": "x = 1", "media_ref": "", "order": 5},
    ]
    df = spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,`order`:int>>",
    )
    md = to_markdown(df).collect()[0]["markdown"]
    assert md == "## Title\n\nBody.\n\n- item\n\n![image](img:abc)\n\n```\nx = 1\n```"


def test_sources_parquet_fallback(spark, tmp_path):
    from high_performance_docling_spark.sources import (
        iceberg_available,
        read_corpus,
        write_spans,
    )

    assert iceberg_available(spark) is False  # no jars in this sandbox
    df = spark.createDataFrame([("d1", [])],
                               "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,`order`:int>>")
    out = str(tmp_path / "spans_tbl")
    write_spans(df, out, partitions=2)
    assert read_corpus(spark, out).count() == 1


def test_fetch_documents_source(spark):
    """URL-manifest download stage (main.py:31-43 seam): deterministic
    fake fetch in-sandbox, real HTTP behind NotImplementedError."""
    import pytest

    from high_performance_docling_spark.sources import fetch_documents

    manifest = spark.createDataFrame(
        [("d1", "https://ex.com/a b.pdf"), ("d2", "https://ex.com/two.pdf")],
        ["doc_id", "url"],
    )
    rows = {r["doc_id"]: r for r in fetch_documents(manifest).collect()}
    assert rows["d1"]["filename"] == "https_ex.com_a_b.pdf.pdf"
    assert rows["d1"]["n_bytes"] == 128 and len(rows["d1"]["payload"]) == 128
    rows2 = {r["doc_id"]: bytes(r["payload"]) for r in fetch_documents(manifest).collect()}
    assert {k: bytes(v["payload"]) for k, v in rows.items()} == rows2
    with pytest.raises(NotImplementedError):
        fetch_documents(manifest, real_http=True)


def test_enrichment_stage_in_pipeline(spark):
    """cfg.enrich_formulas=True runs the batch-5 enrichment pass over the
    assembled document: formula spans come out LaTeX-ized (matching the
    kernel applied to the sanitized input), everything else unchanged,
    and Spark == serial oracle still holds."""
    from high_performance_docling_spark.corpus import GenConfig
    from high_performance_docling_spark.kernels.enrichment import (
        latexize_formula,
    )
    from high_performance_docling_spark.kernels.sanitize import sanitize_text
    from high_performance_docling_spark.oracle import extract_doc_spans
    from high_performance_docling_spark.pipeline import (
        docs_dataframe,
        extract_spans,
    )

    cfg = GenConfig(seed=9, n_docs=14, noise=False, enrich_formulas=True)
    docs = docs_dataframe(spark, cfg, num_partitions=3)
    got = {r["doc_id"]: [s.asDict() for s in r["spans"]]
           for r in extract_spans(spark, docs, cfg).collect()}
    inputs = {r["doc_id"]: [s.asDict() for s in r["spans"]]
              for r in docs.collect()}
    n_formula = 0
    for doc_id, in_spans in inputs.items():
        assert got[doc_id] == extract_doc_spans(doc_id, in_spans, cfg)
        for s_in, s_out in zip(sorted(in_spans, key=lambda s: s["offset"]),
                               got[doc_id]):
            if s_in["kind"] == "formula":
                n_formula += 1
                want = latexize_formula(sanitize_text(s_in["text"].split("\n")))
                assert s_out["text"] == want, doc_id
    assert n_formula > 0  # non-vacuous
