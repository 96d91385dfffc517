"""Real-PDF smoke seam (VERDICT r2 #9): a tiny vendored PDF — built
byte-for-byte in _build_pdf, classic xref, one Flate-compressed page —
parsed by the pure-Python reader and driven end-to-end to ordered spans,
serially and through the fetch_documents → extract_fetched_pdfs Spark
stage."""

import zlib

from high_performance_docling_spark.kernels.pdf_parse import (
    extract_pdf_spans,
    parse_pdf_pages,
    pdf_to_elements,
)


def _pdf_object(num: int, body: bytes) -> bytes:
    return b"%d 0 obj%s\nendobj\n" % (num, body)


def _stream_obj(num: int, content: bytes, flate: bool = False) -> bytes:
    extra = b""
    if flate:
        content = zlib.compress(content)
        extra = b"/Filter /FlateDecode "
    head = b"<< %s/Length %d >>\nstream\n" % (extra, len(content))
    return _pdf_object(num, head + content + b"\nendstream")


PAGE1_CONTENT = b"""BT /F1 24 Tf 72 720 Td (Engine Report) Tj ET
BT /F1 12 Tf 14 TL 72 660 Td (left column first paragraph) Tj T* (wraps to a second line) Tj ET
BT /F1 12 Tf 14 TL 72 560 Td (left column lower block) Tj ET
BT /F1 12 Tf 14 TL 320 660 Td (right column starts here) Tj T* (and continues \\(escaped\\)) Tj ET
BT /F1 12 Tf 14 TL 320 560 Td (right column lower block) Tj ET"""

PAGE2_CONTENT = b"""BT /F1 12 Tf 72 700 Td [(Hello ) (compressed )(page two)] TJ ET"""


def _build_pdf() -> bytes:
    objs = [
        _pdf_object(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _pdf_object(2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
        _pdf_object(
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 7 0 R >> >> >>",
        ),
        _stream_obj(4, PAGE1_CONTENT),
        _pdf_object(
            5,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> >> >>",
        ),
        _stream_obj(6, PAGE2_CONTENT, flate=True),
        _pdf_object(
            7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        ),
    ]
    out = b"%PDF-1.4\n"
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return out


def _png_up_filter(rows: list[bytes]) -> bytes:
    """Apply the PNG Up predictor (filter 2) to fixed-width rows — the
    common /DecodeParms << /Predictor 12 >> encoding of xref streams."""
    out = b""
    prev = bytes(len(rows[0]))
    for row in rows:
        out += b"\x02" + bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return out


def _build_pdf_15() -> bytes:
    """The SAME logical document as _build_pdf, re-serialized as a PDF
    1.5+ file: all non-stream objects live in a Flate /ObjStm (obj 8) and
    the cross-reference is a /Type /XRef stream (obj 9) with /W [1 2 1]
    and a PNG-Up predictor — the construct VERDICT r4 #3 requires
    (ISO 32000 §7.5.7/§7.5.8). The member page objects are invisible to
    a classic whole-file regex sweep (they only exist zlib-compressed)."""
    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 7 0 R >> >> >>"),
        (5, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> >> >>"),
        (7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    bodies, offs, pos = [], [], 0
    for _, body in members:
        bodies.append(body)
        offs.append(pos)
        pos += len(body) + 1
    header = b" ".join(
        b"%d %d" % (num, off) for (num, _), off in zip(members, offs)
    ) + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    zpayload = zlib.compress(payload)
    objstm = (
        b"8 0 obj<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % (len(members), len(header), len(zpayload))
        + zpayload + b"\nendstream\nendobj\n"
    )

    out = b"%PDF-1.5\n"
    offsets: dict[int, int] = {}
    for num, blob in (
        (4, _stream_obj(4, PAGE1_CONTENT)),
        (6, _stream_obj(6, PAGE2_CONTENT, flate=True)),
        (8, objstm),
    ):
        offsets[num] = len(out)
        out += blob
    xref_pos = len(out)

    def row(typ: int, f2: int, f3: int) -> bytes:
        return bytes([typ]) + f2.to_bytes(2, "big") + bytes([f3])

    rows = [
        row(0, 0, 255),                 # 0: free
        row(2, 8, 0), row(2, 8, 1), row(2, 8, 2),   # 1,2,3 in ObjStm 8
        row(1, offsets[4], 0),
        row(2, 8, 3),                   # 5 in ObjStm
        row(1, offsets[6], 0),
        row(2, 8, 4),                   # 7 in ObjStm
        row(1, offsets[8], 0),
        row(1, xref_pos, 0),            # 9: the xref stream itself
    ]
    zx = zlib.compress(_png_up_filter(rows))
    out += (
        b"9 0 obj<< /Type /XRef /Size 10 /W [1 2 1] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> "
        b"/Length %d >>\nstream\n" % len(zx)
        + zx + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return out


def test_pdf_parser_extracts_positioned_cells():
    pages = parse_pdf_pages(_build_pdf())
    assert len(pages) == 2
    p1 = pages[0]
    assert (p1["width"], p1["height"]) == (612.0, 792.0)
    texts = [c["text"] for c in p1["cells"]]
    assert "Engine Report" in texts
    assert "and continues (escaped)" in texts  # escape handling
    hdr = next(c for c in p1["cells"] if c["text"] == "Engine Report")
    assert hdr["font_size"] == 24.0
    assert abs(hdr["t"] - (792 - 720 - 24)) < 1e-6  # top-left flip
    # Flate page decodes and TJ concatenates
    assert [c["text"] for c in pages[1]["cells"]] == ["Hello compressed page two"]


def test_pdf_elements_block_grouping_and_labels():
    els = pdf_to_elements(_build_pdf())
    by_text = {e["text"].split("\n")[0]: e for e in els}
    assert by_text["Engine Report"]["label"] == "section_header"
    left = by_text["left column first paragraph"]
    assert left["label"] == "text"
    assert left["text"].endswith("wraps to a second line")  # T* line joined


def test_pdf_bytes_to_ordered_spans_end_to_end():
    """Header first, LEFT column to its end, then the right column, then
    page 2 — the rule-based reading order on real PDF geometry."""
    spans = extract_pdf_spans(_build_pdf())
    got = [(s["kind"], s["text"], s["order"]) for s in spans]
    assert got == [
        ("section_header", "Engine Report", 0),
        ("text", "left column first paragraph wraps to a second line", 1),
        ("text", "left column lower block", 2),
        ("text", "right column starts here and continues (escaped)", 3),
        ("text", "right column lower block", 4),
        ("text", "Hello compressed page two", 5),
    ]


def test_pdf_seam_through_spark_fetch_stage(spark):
    """fetch_documents (deterministic fetcher returning the vendored PDF)
    → extract_fetched_pdfs: the distributed S1 contract on real bytes."""
    from high_performance_docling_spark.sources import (
        extract_fetched_pdfs,
        fetch_documents,
    )

    pdf = _build_pdf()
    manifest = spark.createDataFrame(
        [("d1", "https://example.com/a.pdf"), ("d2", "https://example.com/b.pdf"),
         ("bad", "https://example.com/broken.bin")],
        ["doc_id", "url"],
    )
    fetched = fetch_documents(
        manifest,
        fetcher=lambda url: b"not a pdf" if "broken" in url else pdf,
    )
    out = {r["doc_id"]: r["spans"] for r in extract_fetched_pdfs(fetched).collect()}
    assert len(out) == 3
    for doc_id in ("d1", "d2"):
        spans = [(s["kind"], s["text"], s["order"]) for s in out[doc_id]]
        assert spans[0] == ("section_header", "Engine Report", 0)
        assert len(spans) == 6
    assert out["bad"][0]["kind"] == "error"  # unparseable rows surfaced


def test_pdf15_xref_stream_objstm_same_spans_as_classic():
    """VERDICT r4 #3 done-criterion: the xref-stream + ObjStm
    re-serialization of the vendored fixture parses to EXACTLY the same
    spans as its classic-xref form."""
    classic = extract_pdf_spans(_build_pdf())
    modern = extract_pdf_spans(_build_pdf_15())
    assert [(s["kind"], s["text"], s["order"]) for s in modern] == \
           [(s["kind"], s["text"], s["order"]) for s in classic]
    assert len(modern) == 6


def test_pdf15_xref_stream_is_the_discovery_path():
    """The member objects (catalog/pages/page dicts/font) exist ONLY
    zlib-compressed inside the ObjStm — prove the §7.5.7/§7.5.8 loader
    actually finds them (not the regex sweep)."""
    from high_performance_docling_spark.kernels.pdf_parse import (
        _objects,
        _objects_via_xref,
    )

    data = _build_pdf_15()
    swept = _objects(data)
    assert set(swept) == {4, 6, 8, 9}  # regex sweep can't see 1,2,3,5,7
    via_xref, _ = _objects_via_xref(data)
    assert {1, 2, 3, 5, 7, 4, 6, 8, 9} <= set(via_xref)
    assert b"/Type /Catalog" in via_xref[1]
    assert b"/BaseFont /Helvetica" in via_xref[7]


def test_png_predictor_roundtrip():
    from high_performance_docling_spark.kernels.pdf_parse import _unpredict

    rows = [bytes([1, 0, 200, 3]), bytes([2, 8, 1, 255]), bytes([1, 0, 77, 0])]
    assert _unpredict(_png_up_filter(rows), 4, 12) == b"".join(rows)
    # TIFF predictor 2: horizontal byte diffs
    tiff = bytes([5, 251, 2, 10, 254, 1])  # rows (5,0,2) and (10,8,9)
    assert _unpredict(tiff, 3, 2) == bytes([5, 0, 2, 10, 8, 9])


def test_pdf15_hybrid_classic_trailer_with_xrefstm():
    """Hybrid-reference file (§7.5.8.4): classic trailer carrying
    /XRefStm — the chain must follow it into the xref stream."""
    from high_performance_docling_spark.kernels.pdf_parse import (
        _objects_via_xref,
    )

    base = _build_pdf_15()
    stream_startxref = int(base.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    # append a classic trailer section pointing at the xref stream
    hybrid = base + (
        b"xref\n0 1\n0000000000 65535 f \n"
        b"trailer\n<< /Size 10 /Root 1 0 R /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (stream_startxref, len(base))
    )
    objs, _ = _objects_via_xref(hybrid)
    assert {1, 2, 3, 5, 7} <= set(objs)
    spans = extract_pdf_spans(hybrid)
    assert len(spans) == 6


def test_pdf_incremental_update_prev_chain():
    """Incremental-update file (ISO 32000 §7.5.6): an appended body
    replaces page 2's content stream via a new xref section whose
    trailer /Prev points at the original table. The updated object must
    win; everything else resolves through the chain."""
    base = _build_pdf()
    new_content = b"BT /F1 12 Tf 72 700 Td (updated page two) Tj ET"
    update_obj = _stream_obj(6, new_content)
    out = base + update_obj
    xref_pos = len(out)
    orig_xref = int(base.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    out += (
        b"xref\n6 1\n%010d 00000 n \n"
        b"trailer\n<< /Size 8 /Root 1 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (len(base), orig_xref, xref_pos)
    )
    spans = extract_pdf_spans(out)
    texts = [s["text"] for s in spans]
    assert "updated page two" in texts
    assert "Hello compressed page two" not in texts
    assert len(spans) == 6  # page 1 untouched


def test_pdf_incremental_update_deletes_page():
    """ADVICE r5: an incremental update that FREES a page's objects
    (classic 'f' entries in the newer section) must delete the page —
    the regex-sweep floor and the /Prev chain may not resurrect it.
    §7.5.6: a freed object no longer exists; the dangling /Kids ref is
    skipped."""
    base = _build_pdf()
    orig_xref = int(base.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    xref_pos = len(base)
    out = base + (
        b"xref\n0 1\n0000000000 65535 f \n"
        b"5 2\n0000000000 00001 f \n0000000000 00001 f \n"
        b"trailer\n<< /Size 8 /Root 1 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (orig_xref, xref_pos)
    )
    spans = extract_pdf_spans(out)
    texts = [s["text"] for s in spans]
    assert "Hello compressed page two" not in texts
    assert len(spans) == 5  # page 1 intact
    # and the tombstones are visible at the loader level
    from high_performance_docling_spark.kernels.pdf_parse import (
        _objects_via_xref,
    )

    objs, free = _objects_via_xref(out)
    assert {5, 6} <= free and 5 not in objs and 6 not in objs
    # an even NEWER section can re-add the object (first-seen wins on
    # the resurrection too): appending a re-creation update on top wins
    recreated = _stream_obj(6, b"BT /F1 12 Tf 72 700 Td (page two is back) Tj ET")
    page5 = _pdf_object(
        5,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> >> >>",
    )
    out2 = out + page5 + recreated
    xref2 = len(out2)
    out2 += (
        b"xref\n0 1\n0000000000 65535 f \n"
        b"5 2\n%010d 00000 n \n%010d 00000 n \n"
        b"trailer\n<< /Size 8 /Root 1 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (len(out), len(out) + len(page5), xref_pos, xref2)
    )
    texts2 = [s["text"] for s in extract_pdf_spans(out2)]
    assert "page two is back" in texts2


def test_pdf_parser_fuzz_no_hangs_or_foreign_exceptions():
    """ADVICE r4 stretch: hypothesis-mutate the modern fixture — byte
    flips, truncations, splices — and assert the parser either returns
    pages or raises ValueError; never any other exception."""
    from hypothesis import given, settings, strategies as st

    base = _build_pdf_15()

    @settings(max_examples=200, deadline=None)
    @given(
        start=st.integers(0, len(base) - 1),
        length=st.integers(1, 64),
        payload=st.binary(min_size=0, max_size=64),
        truncate=st.integers(0, len(base)),
    )
    def run(start, length, payload, truncate):
        mutated = (base[:start] + payload + base[start + length:])[:truncate or None]
        try:
            pages = parse_pdf_pages(mutated)
            assert isinstance(pages, list)
        except ValueError:
            pass

    run()


def test_literal_string_unescape_iso_32000():
    """ISO 32000 7.3.4.2: \\b/\\f map to control chars, \\<EOL> is a line
    continuation, and backslash before any other char is IGNORED (keeps
    only the char — r3 ADVICE: '(\\8)' must decode to '8', not '\\\\8')."""
    from high_performance_docling_spark.kernels.pdf_parse import _unescape

    assert _unescape(rb"a\8b") == "a8b"
    assert _unescape(rb"\q") == "q"
    assert _unescape(rb"tab\there") == "tab\there"
    assert _unescape(rb"back\bspace\ffeed") == "back\bspace\ffeed"
    assert _unescape(b"line\\\ncont") == "linecont"
    assert _unescape(b"line\\\r\ncont") == "linecont"
    assert _unescape(rb"\101\102") == "AB"      # octal
    assert _unescape(rb"\(paren\)") == "(paren)"
