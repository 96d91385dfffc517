"""Export sinks: markdown rendering and the format registry.

Reference analogues: `export_to_markdown` (main.py:93, via docling-core)
and the InputFormat ↔ extension ↔ MIME registry (base_models.py:72-124).
The markdown renderer is a pure column expression (JVM-side
transform/when chain over the spans array — no Python UDF), so it
pipelines into any plan reading the spans table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import labels as L

# --- format registry (base_models.py:72-124) -------------------------------
FORMAT_TO_EXTENSIONS = {
    "pdf": ["pdf"],
    "docx": ["docx", "dotx", "docm", "dotm"],
    "pptx": ["pptx", "potx", "ppsx", "pptm"],
    "html": ["html", "htm", "xhtml"],
    "image": ["bmp", "jpg", "jpeg", "png", "tiff", "tif", "webp"],
    "asciidoc": ["adoc", "asciidoc", "asc"],
    "md": ["md"],
    "csv": ["csv"],
    "xlsx": ["xlsx"],
    "xml_uspto": ["xml", "txt"],
}
FORMAT_TO_MIME = {
    "pdf": "application/pdf",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "html": "text/html",
    "image": "image/png",
    "asciidoc": "text/asciidoc",
    "md": "text/markdown",
    "csv": "text/csv",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xml_uspto": "application/xml",
}
EXTENSION_TO_FORMAT = {
    ext: fmt for fmt, exts in FORMAT_TO_EXTENSIONS.items() for ext in exts
}


def detect_format(df: DataFrame, filename_col: str = "filename") -> DataFrame:
    """Extension → format as a when() chain (no UDF)."""
    ext = F.lower(F.regexp_extract(F.col(filename_col), r"\.([A-Za-z0-9]+)$", 1))
    col = None
    for e, fmt in EXTENSION_TO_FORMAT.items():
        col = F.when(ext == e, fmt) if col is None else col.when(ext == e, fmt)
    col = col.otherwise(F.lit("unknown"))
    return df.withColumn("format", col)


# --- markdown export --------------------------------------------------------

def _span_md(s):
    """Markdown for one span struct (docling-core's markdown conventions:
    headings, list dashes, fenced code, $$ formulas, image refs; furniture
    page_header/page_footer excluded)."""
    kind = s["kind"]
    text = s["text"]
    return (
        F.when(kind == L.SECTION_HEADER, F.concat(F.lit("## "), text))
        .when(kind == L.TITLE, F.concat(F.lit("# "), text))
        .when(kind == L.LIST_ITEM, F.concat(F.lit("- "), text))
        .when(kind == L.CODE, F.concat(F.lit("```\n"), text, F.lit("\n```")))
        .when(kind == L.FORMULA, F.concat(F.lit("$$"), text, F.lit("$$")))
        .when(kind == L.PICTURE, F.concat(F.lit("![image]("), s["media_ref"], F.lit(")")))
        .when(kind.isin(L.PAGE_HEADER, L.PAGE_FOOTER), F.lit(None).cast("string"))
        .when((kind.isin(L.FORM, L.KEY_VALUE_REGION)) & (text == ""), F.lit(None).cast("string"))
        .otherwise(text)
    )


def to_markdown(spans_df: DataFrame) -> DataFrame:
    """(doc_id, spans[]) → (doc_id, markdown). Pure column expressions."""
    ordered = F.array_sort(
        F.col("spans"), lambda a, b: a["order"] - b["order"]
    )
    blocks = F.filter(F.transform(ordered, _span_md), lambda x: x.isNotNull())
    return spans_df.select(
        "doc_id", F.array_join(blocks, "\n\n").alias("markdown")
    )
