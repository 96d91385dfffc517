"""Corpus source/sink connectors.

Production target is an Iceberg table of interleaved documents (north
rule); the Iceberg runtime jars are not in this sandbox, so the connector
probes for the catalog and falls back to partitioned parquet with the
same schema and the same write layout (hash-bucketed by doc_id). Swap is
a config change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j package traversal never raises — force a real classload
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read the docs table. ``location`` is either an Iceberg table name
    (catalog.db.table) or a parquet path."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_spans(
    df: DataFrame, location: str, partitions: int | None = None
) -> None:
    """Write the output span table. Iceberg table name → iceberg writer
    (append semantics, hidden partitioning); path → parquet."""
    if partitions:
        df = df.repartition(partitions, "doc_id")
    if "/" not in location and iceberg_available(df.sparkSession):
        df.writeTo(location).createOrReplace()
        return
    df.write.mode("overwrite").parquet(location)


# --------------------------------------------------------------------------
# URL manifest → document bytes (main.py:31-43 download + InputDocument)
# --------------------------------------------------------------------------

FETCH_SCHEMA = "doc_id string, url string, filename string, n_bytes int, payload binary"


def _fake_fetch(url: str) -> bytes:
    """Deterministic stand-in fetch: 'downloads' sha256-stream bytes of
    the URL (no network in this sandbox)."""
    import hashlib

    return hashlib.sha256(url.encode()).digest() * 4


def fetch_documents(manifest_df: DataFrame, fetcher=None, real_http: bool = False):
    """Distributed download stage: (doc_id, url) manifest → document BYTES
    rows, one fetch per row inside a mapInPandas pass (the Spark-shaped
    form of main.py:31-33 ``requests.get``; at scale the manifest is the
    work queue and fetch parallelism = partitions).

    ``real_http`` is the production seam — requests/urllib are not
    importable here, so it raises ``NotImplementedError`` exactly like
    the multimodal codec seam; tests run the deterministic fake fetch.
    """
    if real_http:
        raise NotImplementedError(
            "HTTP fetch requires the requests package — not in this sandbox; "
            "pass fetcher=<callable url -> bytes> in production"
        )
    fetch = fetcher or _fake_fetch

    def fn(batches):
        import pandas as pd

        from .util import safe_id

        for pdf in batches:
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                data = fetch(url)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "url": url,
                        "filename": safe_id(url) + ".pdf",
                        "n_bytes": len(data),
                        "payload": data,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "filename", "n_bytes", "payload"]
            )

    return manifest_df.mapInPandas(fn, FETCH_SCHEMA)


def extract_fetched_documents(fetched_df: DataFrame) -> DataFrame:
    """Format-sniffing extraction stage over fetch_documents output:
    %PDF payloads go through the pure-Python PDF parser, HTML payloads
    through the boilerplate-strip extractor — both to the SAME ordered
    span contract, in one narrow mapInPandas pass (the Spark shape of
    the reference's format registry dispatch, main.py InputFormat)."""
    from .schemas import SPANS_OUT_SCHEMA

    def fn(batches):
        import pandas as pd

        from .kernels.html_extract import html_to_spans
        from .kernels.pdf_parse import extract_pdf_spans

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                try:
                    if data.startswith(b"%PDF"):
                        spans = extract_pdf_spans(data)
                    else:
                        spans = [
                            {"kind": s["kind"], "text": s["text"],
                             "media_ref": s["media_ref"], "order": s["order"]}
                            for s in html_to_spans(
                                data.decode("utf-8", errors="replace")
                            )
                        ]
                        if not spans:
                            raise ValueError("no extractable content")
                except ValueError as e:
                    spans = [{"kind": "error", "text": str(e),
                              "media_ref": "", "order": 0}]
                rows.append({"doc_id": doc_id, "spans": spans})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return fetched_df.mapInPandas(fn, SPANS_OUT_SCHEMA)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    id_field: str = "id",
    text_field: str = "text",
    source_field: str | None = None,
) -> DataFrame:
    """JSONL(.gz) text corpus (the Pile/C4-style layout) → the
    (doc_id, source, text) shape every text-analysis/dedup operator
    consumes. Spark's json reader handles gzip transparently and splits
    uncompressed files; schema is inferred once then projected (column
    pruning pushes into the scan). Missing id falls back to a
    content+position-free md5 of the text (append-stable)."""
    from pyspark.sql import functions as F

    raw = spark.read.json(path)
    cols = set(raw.columns)
    if id_field in cols:
        # PER-ROW fallback: rows missing an id get md5(text)
        doc_id = F.coalesce(F.col(id_field).cast("string"),
                            F.md5(F.col(text_field)))
    else:
        doc_id = F.md5(F.col(text_field))
    src = (
        F.col(source_field).cast("string")
        if source_field and source_field in cols
        else F.lit("jsonl")
    )
    return raw.select(
        doc_id.alias("doc_id"),
        src.alias("source"),
        F.col(text_field).cast("string").alias("text"),
    )


# --------------------------------------------------------------------------
# WARC (Common Crawl) source → the same span contract
# --------------------------------------------------------------------------

WARC_DOC_SCHEMA = (
    "doc_id string, warc_path string, url string, content_type string, "
    "n_bytes int, payload binary"
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → one row per file (path, content). binaryFile keeps a
    whole archive per task — correct for Common Crawl's ~1 GB segment
    files (one task per segment; parallelism = segment count, which at
    crawl scale is tens of thousands). Offset-indexed splitting (CDX) is
    the production optimization when individual archives outgrow a
    task."""
    return spark.read.format("binaryFile").load(path)


def warc_response_documents(warc_df: DataFrame) -> DataFrame:
    """(path, content) WARC rows → one row per well-formed HTTP response
    record: (doc_id, warc_path, url, content_type, n_bytes, payload).
    Narrow mapInPandas (no shuffle); doc_id = safe_id(url):record_ix is
    stable across re-reads of the same archive."""
    def fn(batches):
        import pandas as pd

        from .kernels.warc import response_documents
        from .util import safe_id

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for ix, doc in enumerate(response_documents(bytes(content))):
                    rows.append(
                        {
                            "doc_id": f"{safe_id(doc['url'])}:{ix}",
                            "warc_path": path,
                            "url": doc["url"],
                            "content_type": doc["content_type"],
                            "n_bytes": len(doc["payload"]),
                            "payload": doc["payload"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "warc_path", "url", "content_type",
                         "n_bytes", "payload"],
            )

    return warc_df.select("path", "content").mapInPandas(fn, WARC_DOC_SCHEMA)


def extract_warc_documents(warc_df: DataFrame) -> DataFrame:
    """WARC file rows → ordered spans: response-record fan-out, then the
    SAME format-sniffing extraction stage the URL-manifest path uses
    (PDF parser / HTML boilerplate strip). Two chained narrow stages —
    crawl archives to training spans with zero shuffles."""
    return extract_fetched_documents(warc_response_documents(warc_df))


def extract_fetched_pdfs(fetched_df: DataFrame) -> DataFrame:
    """Distributed PDF-bytes → ordered-spans stage: the S1 contract on
    REAL (non-synthetic) input. Consumes fetch_documents output
    (doc_id, payload) and runs kernels.pdf_parse.extract_pdf_spans —
    parse, block grouping, sanitize, and the SAME rule-based reading
    order as the synthetic pipeline — inside one mapInPandas pass
    (narrow, no shuffle; one task per manifest partition at scale).
    Rows whose payload is not parseable PDF are dropped with their
    doc_id recorded in the `error` of a companion row (kind='error')."""
    from .schemas import SPANS_OUT_SCHEMA

    def fn(batches):
        import pandas as pd

        from .kernels.pdf_parse import extract_pdf_spans

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    spans = extract_pdf_spans(bytes(payload))
                except ValueError as e:
                    spans = [{"kind": "error", "text": str(e),
                              "media_ref": "", "order": 0}]
                rows.append({"doc_id": doc_id, "spans": spans})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return fetched_df.mapInPandas(fn, SPANS_OUT_SCHEMA)
