"""Unit tests for the S5 table pipeline kernels (OTSL walk, span
derivation, IOPDF matching, matching post-processor, response/merge/
compaction)."""

from high_performance_docling_spark.kernels.otsl import (
    build_table_cells,
    otsl_spans,
    otsl_square,
    translate_bboxes,
)
from high_performance_docling_spark.kernels.table_decode import (
    geometric_table_decode,
    table_structure_for_tokens,
)
from high_performance_docling_spark.kernels.table_match import (
    compact_row_col_indexes,
    generate_tf_response,
    iopdf_match,
    matching_post_process,
    merge_tf_output,
)


def tok(i, text, l, t, r, b):
    return {"id": i, "text": text, "bbox": [float(l), float(t), float(r), float(b)]}


def test_otsl_square():
    assert otsl_square(["fcel", "fcel", "nl", "fcel", "fcel", "nl"])
    assert not otsl_square(["fcel", "fcel", "nl", "fcel", "nl"])
    assert otsl_square([])


def test_otsl_spans_colspan():
    # 2x2 where the top row is one merged cell: fcel lcel / fcel fcel
    seq = ["fcel", "lcel", "nl", "fcel", "fcel", "nl"]
    assert otsl_spans(seq) == {0: (2, 1)}


def test_otsl_spans_rowspan_and_xcel():
    # 2x2 fully merged via ucel/xcel: fcel lcel / ucel xcel
    seq = ["fcel", "lcel", "nl", "ucel", "xcel", "nl"]
    spans = otsl_spans(seq)
    assert spans[0] == (2, 2)


def test_build_table_cells_ids_and_spans():
    seq = ["ched", "lcel", "nl", "fcel", "fcel", "nl"]
    bboxes = [[0, 0, 1, 1]] * 3
    cells = build_table_cells(seq, bboxes, [2, 2, 2])
    assert [(c["cell_id"], c["row_id"], c["column_id"]) for c in cells] == [
        (0, 0, 0), (1, 1, 0), (2, 1, 1)
    ]
    assert cells[0]["colspan_val"] == 2
    assert cells[0]["label"] == "ched"


def test_translate_bboxes_affine():
    out = translate_bboxes([100, 200, 300, 260], [[0.0, 0.0, 0.5, 0.5]])
    assert out == [[100.0, 200.0, 200.0, 230.0]]


def test_iopdf_match_argmax():
    tcells = [
        {"cell_id": 0, "bbox": [0, 0, 50, 20]},
        {"cell_id": 1, "bbox": [50, 0, 100, 20]},
    ]
    pdf = [tok(7, "a", 2, 2, 48, 18), tok(9, "b", 52, 2, 98, 18)]
    m = iopdf_match(tcells, pdf)
    assert m["7"][0]["table_cell_id"] == 0
    assert m["9"][0]["table_cell_id"] == 1


def test_matching_pp_moves_unmatched_and_orphans():
    # 2x2 grid; token for (1,1) missing from matches → orphan pickup
    tcells = [
        {"cell_id": 0, "row_id": 0, "column_id": 0, "bbox": [0, 0, 50, 20], "cell_class": 2, "label": "fcel"},
        {"cell_id": 1, "row_id": 0, "column_id": 1, "bbox": [50, 0, 100, 20], "cell_class": 2, "label": "fcel"},
        {"cell_id": 2, "row_id": 1, "column_id": 0, "bbox": [0, 20, 50, 40], "cell_class": 2, "label": "fcel"},
        {"cell_id": 3, "row_id": 1, "column_id": 1, "bbox": [50, 20, 100, 40], "cell_class": 2, "label": "fcel"},
    ]
    pdf = [
        tok(0, "a", 2, 2, 48, 18),
        tok(1, "b", 52, 2, 98, 18),
        tok(2, "c", 2, 22, 48, 38),
        tok(3, "d", 52, 22, 98, 38),
    ]
    matches = iopdf_match(tcells, pdf)
    cells_out, final = matching_post_process(tcells, pdf, matches)
    # every pdf cell ends matched to its grid cell
    assert {k: v[0]["table_cell_id"] for k, v in final.items()} == {
        "0": 0, "1": 1, "2": 2, "3": 3
    }


def test_generate_merge_compact():
    tcells = [
        {"cell_id": 0, "row_id": 0, "column_id": 0, "bbox": [0, 0, 50, 20], "cell_class": 2, "label": "ched", "colspan_val": 2},
        {"cell_id": 1, "row_id": 1, "column_id": 0, "bbox": [0, 20, 50, 40], "cell_class": 2, "label": "fcel"},
        {"cell_id": 2, "row_id": 1, "column_id": 1, "bbox": [50, 20, 100, 40], "cell_class": 2, "label": "fcel"},
    ]
    matches = {
        "10": [{"table_cell_id": 0, "iopdf": 1.0}],
        "11": [{"table_cell_id": 1, "iopdf": 1.0}],
        "12": [{"table_cell_id": 2, "iopdf": 1.0}],
    }
    pdf = [tok(10, "hdr", 0, 0, 50, 20), tok(11, "x", 0, 20, 50, 40),
           tok(12, "y", 50, 20, 100, 40)]
    resp = generate_tf_response(tcells, matches)
    resp.sort(key=lambda r: r["cell_id"])
    tf_cells = merge_tf_output(resp, pdf)
    assert len(tf_cells) == 3
    hdr = next(c for c in tf_cells if c["column_header"])
    assert hdr["col_span"] == 2
    n_rows, n_cols = compact_row_col_indexes(tf_cells)
    assert (n_rows, n_cols) == (2, 2)


def test_geometric_decode_grid_and_span():
    # 2x2 with merged top row (wide token)
    tokens = [
        tok(0, "hdr", 3, 4, 94, 15),
        tok(1, "a", 3, 20, 40, 31),
        tok(2, "b", 53, 20, 90, 31),
    ]
    otsl, bboxes, classes = geometric_table_decode([0, 0, 100, 40], tokens)
    assert otsl == ["ched", "lcel", "nl", "fcel", "fcel", "nl"]
    assert len(bboxes) == 3 and classes == [2, 2, 2]


def test_table_structure_end_to_end_text():
    tokens = [
        tok(0, "h1", 3, 4, 40, 15), tok(1, "h2", 53, 4, 90, 15),
        tok(2, "a", 3, 20, 40, 31), tok(3, "b", 53, 20, 90, 31),
    ]
    out = table_structure_for_tokens([0, 0, 100, 40], tokens)
    assert out["text"] == "h1 h2 a b"
    assert (out["num_rows"], out["num_cols"]) == (2, 2)


def test_check_bbox_sync():
    from high_performance_docling_spark.kernels.otsl import check_bbox_sync

    seq = ["fcel", "fcel", "nl"]
    ok, out = check_bbox_sync(seq, [[0, 0, 1, 1], [1, 0, 2, 1]])
    assert ok and len(out) == 2
    # over-emission after a span origin gets dropped
    seq2 = ["fcel", "lcel", "nl", "fcel", "fcel", "nl"]  # 3 emitting
    boxes = [[0, 0, 1, 1], [9, 9, 9, 9], [0, 1, 1, 2], [1, 1, 2, 2]]
    ok, out = check_bbox_sync(seq2, boxes)
    assert not ok and len(out) == 3
    assert [9, 9, 9, 9] not in out
    # under-emission pads zeros
    ok, out = check_bbox_sync(seq2, [[0, 0, 1, 1]])
    assert not ok and len(out) == 3 and out[1] == [0.0, 0.0, 0.0, 0.0]


def test_geometric_decode_rowspan_and_xcel():
    # 2x2 where the left column is one tall merged cell:
    #   fcel fcel / ucel fcel
    tokens = [
        tok(0, "tall", 3, 4, 40, 35),   # spans both row bands
        tok(1, "a", 53, 4, 90, 15),
        tok(2, "b", 53, 20, 90, 31),
    ]
    otsl, bboxes, classes = geometric_table_decode([0, 0, 100, 40], tokens)
    assert otsl == ["ched", "ched", "nl", "ucel", "fcel", "nl"]  # row 0 = headers
    from high_performance_docling_spark.kernels.otsl import otsl_spans

    assert otsl_spans(otsl) == {0: (1, 2)}

    # 3x3 with a 2x2 merge in the top-left (wide AND tall token):
    # ched lcel ched / ucel xcel fcel / fcel fcel fcel
    tokens2 = [
        tok(0, "big", 3, 4, 60, 38),     # spans cols 0-1, rows 0-1
        tok(1, "h2", 63, 4, 90, 15),
        tok(2, "m2", 63, 22, 90, 33),
        tok(3, "a", 3, 40, 30, 51),
        tok(4, "b", 33, 40, 58, 51),
        tok(5, "c", 63, 40, 90, 51),
    ]
    otsl2, bboxes2, classes2 = geometric_table_decode([0, 0, 100, 60], tokens2)
    assert otsl2 == ["ched", "lcel", "ched", "nl",
                     "ucel", "xcel", "fcel", "nl",
                     "fcel", "fcel", "fcel", "nl"]
    # xcel consumed a bbox/class slot (emitting tag)
    assert len(bboxes2) == 7 and len(classes2) == 7
    from high_performance_docling_spark.kernels.otsl import otsl_spans as _sp
    assert _sp(otsl2)[0] == (2, 2)


def test_table_structure_rowspan_text_roundtrip():
    tokens = [
        tok(0, "tall", 3, 4, 40, 35),
        tok(1, "a", 53, 4, 90, 15),
        tok(2, "b", 53, 20, 90, 31),
    ]
    out = table_structure_for_tokens([0, 0, 100, 40], tokens)
    assert out["text"] == "tall a b"
    assert (out["num_rows"], out["num_cols"]) == (2, 2)


def test_gather_table_tokens_ios_word_index_semantics():
    """VERDICT r1 parity fix: table tokens come from an IoS>=0.8 lookup of
    ALL page words against the table bbox (page_word_index.py:80-126), not
    from the cluster's argmax-assigned cells — a word overlapping the
    table but claimed by a neighboring cluster is still captured."""
    from high_performance_docling_spark.kernels.layout_postprocess import (
        postprocess_page,
    )
    from high_performance_docling_spark.kernels.table_decode import (
        attach_table_structures,
        gather_table_tokens,
    )

    table_bbox = [100.0, 100.0, 300.0, 200.0]
    # word straddling the table's left edge: IoS vs table = 35/40 = 0.875
    # (>= 0.8 → word-index token) but fully inside a TEXT cluster that
    # extends left of the table (IoS 1.0 → wins the argmax assignment)
    straddler = {"index": 99, "text": "straddler", "l": 95.0, "t": 105.0,
                 "r": 135.0, "b": 115.0, "from_ocr": False, "confidence": 1.0}
    # anchor word keeps the TEXT cluster's cell envelope mostly outside the
    # table, so special-containment doesn't swallow the cluster
    anchor = {"index": 98, "text": "anchor", "l": 60.0, "t": 105.0,
              "r": 92.0, "b": 115.0, "from_ocr": False, "confidence": 1.0}
    in_table = [
        {"index": i, "text": f"w{i}", "l": 110.0 + 60 * (i % 3),
         "t": 130.0 + 25 * (i // 3), "r": 150.0 + 60 * (i % 3),
         "b": 140.0 + 25 * (i // 3), "from_ocr": False, "confidence": 1.0}
        for i in range(6)
    ]
    cells = [anchor, straddler] + in_table
    detections = [
        # TEXT cluster covering the straddler, mostly OUTSIDE the table
        # (IoS vs table 0.5) so dedup/containment keeps it as a separate
        # cluster and the word argmaxes to it (IoS 1.0 > 0.875)
        {"id": 0, "label": "text", "l": 60.0, "t": 103.0, "r": 140.0,
         "b": 117.0, "confidence": 0.95},
        {"id": 1, "label": "table", "l": table_bbox[0], "t": table_bbox[1],
         "r": table_bbox[2], "b": table_bbox[3], "confidence": 0.9},
    ]
    clusters = postprocess_page(400.0, 400.0, cells, detections)
    tbl = next(c for c in clusters if c["label"] == "table")
    assigned_ids = {c["index"] for c in tbl["cells"]}
    tokens = gather_table_tokens(table_bbox, cells)
    token_ids = {t["id"] for t in tokens}
    # the straddler is NOT argmax-assigned to the table, yet IS a token
    assert 99 not in assigned_ids
    assert 99 in token_ids
    assert {c["index"] for c in in_table} <= token_ids
    # and the full attach path uses the word-index gathering
    pages_clusters = [clusters]
    attach_table_structures(pages_clusters, [cells])
    assert "straddler" in tbl["table_text"]


def test_otsl_grammar_corrections():
    """batched_decoder.py:158-166: first-line xcel→lcel; lcel right after
    a ucel → fcel. State (prev_ucel, line_num) tracks the CORRECTED tags."""
    from high_performance_docling_spark.kernels.otsl import correct_otsl_sequence

    # illegal xcel on the first line is rewritten to lcel
    assert correct_otsl_sequence(["fcel", "xcel", "nl", "fcel", "fcel", "nl"]) == [
        "fcel", "lcel", "nl", "fcel", "fcel", "nl"]
    # xcel after the first nl is legal and kept
    assert correct_otsl_sequence(["fcel", "lcel", "nl", "ucel", "xcel", "nl"]) == [
        "fcel", "lcel", "nl", "ucel", "xcel", "nl"]
    # ucel followed by lcel becomes fcel
    assert correct_otsl_sequence(["fcel", "fcel", "nl", "ucel", "lcel", "nl"]) == [
        "fcel", "fcel", "nl", "ucel", "fcel", "nl"]
    # corrected tag updates state: first-line xcel→lcel does NOT then
    # become fcel (prev tag was fcel, not ucel); chain checks
    assert correct_otsl_sequence(["ucel", "lcel", "lcel"]) == [
        "ucel", "fcel", "lcel"]


def test_iou_match_alternative():
    """tf_cell_matcher.py:564-640: IoU keeps EVERY pair >= threshold (a pdf
    cell may match several table cells), unlike iopdf_match's argmax."""
    from high_performance_docling_spark.kernels.table_match import (
        iopdf_match,
        iou_match,
    )

    table_cells = [
        {"cell_id": 0, "row_id": 0, "column_id": 0, "bbox": [0, 0, 10, 10], "label": "fcel"},
        {"cell_id": 1, "row_id": 0, "column_id": 1, "bbox": [8, 0, 18, 10], "label": "fcel"},
    ]
    pdf_cells = [{"id": 5, "text": "w", "bbox": [4.0, 0.0, 14.0, 10.0]}]
    m_iou, n = iou_match(table_cells, pdf_cells, iou_thres=0.05)
    assert n == 2 and [x["table_cell_id"] for x in m_iou["5"]] == [0, 1]
    assert all("iou" in x and x["text"] == "w" for x in m_iou["5"])
    m_iopdf = iopdf_match(table_cells, pdf_cells)
    assert len(m_iopdf["5"]) == 1  # argmax keeps only the best
    # threshold filters
    m_hi, n_hi = iou_match(table_cells, pdf_cells, iou_thres=0.5)
    assert n_hi == 0 and m_hi == {}


def test_table_structure_iou_matcher_end_to_end():
    toks = [tok(i, f"c{i}", 10 + 40 * (i % 2), 10 + 20 * (i // 2),
                40 + 40 * (i % 2), 25 + 20 * (i // 2)) for i in range(4)]
    out = table_structure_for_tokens([0, 0, 100, 60], toks, matcher="iou")
    assert out is not None and out["num_rows"] == 2 and out["num_cols"] == 2
    assert all(f"c{i}" in out["text"] for i in range(4))


def test_normalize_translate_roundtrip():
    from high_performance_docling_spark.kernels.otsl import (
        normalize_bboxes,
        translate_bboxes,
    )

    table = [100.0, 200.0, 300.0, 260.0]
    page_boxes = [[110.0, 210.0, 150.0, 220.0], [100.0, 200.0, 300.0, 260.0]]
    norm = normalize_bboxes(table, page_boxes)
    assert norm[1] == [0.0, 0.0, 1.0, 1.0]
    back = translate_bboxes(table, norm)
    for a, b in zip(back, page_boxes):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))


def test_otsl_to_html_seq_tokens():
    from high_performance_docling_spark.kernels.otsl import otsl_to_html_seq

    # row 1: 2-col span + plain; row 2: three plain cells
    seq = ["fcel", "lcel", "fcel", "nl", "fcel", "fcel", "fcel", "nl"]
    assert otsl_to_html_seq(seq) == [
        "<tr>", "<td", ' colspan="2"', ">", "<td>", "</tr>",
        "<tr>", "<td>", "<td>", "<td>", "</tr>",
    ]
    # 2x2 block span: ucel/lcel/xcel render NO cell tokens
    seq2 = ["fcel", "lcel", "fcel", "nl", "ucel", "xcel", "fcel", "nl"]
    html2 = otsl_to_html_seq(seq2)
    assert html2 == [
        "<tr>", "<td", ' rowspan="2"', ' colspan="2"', ">", "<td>", "</tr>",
        "<tr>", "<td>", "</tr>",
    ]


def test_check_bbox_sync_html_desync_repair():
    from high_performance_docling_spark.kernels.otsl import (
        check_bbox_sync_html,
        otsl_to_html_seq,
    )

    seq = ["fcel", "lcel", "fcel", "nl", "fcel", "fcel", "fcel", "nl"]
    html = otsl_to_html_seq(seq)
    # in-sync: 5 cells (1 spanned via '>', 4 plain '<td>')
    ok, out = check_bbox_sync_html(html, [[i, 0, 0, 0] for i in range(5)])
    assert ok and len(out) == 5
    # over-emission: the decoder emitted one extra bbox after the span —
    # the repair must delete exactly the bbox FOLLOWING the '>' token
    # (index 1), per tf_predictor.py:237-253 semantics
    ok, out = check_bbox_sync_html(html, [[i, 0, 0, 0] for i in range(6)])
    assert not ok
    assert [b[0] for b in out] == [0, 2, 3, 4, 5]
