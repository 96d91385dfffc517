"""Hypothesis property tests for the pure-Python kernels (grammar
corrections, list markers, bbox merges) — invariants that must hold for
ANY input a real neural decoder / OCR engine could produce."""

import math

from hypothesis import given, settings, strategies as st

from high_performance_docling_spark.geometry import (
    cxcywh_to_xyxy,
    merge_bboxes_cxcywh,
    xyxy_to_cxcywh,
)
from high_performance_docling_spark.kernels.list_markers import split_marker
from high_performance_docling_spark.kernels.otsl import correct_otsl_sequence

TAGS = ["fcel", "ecel", "ched", "rhed", "srow", "lcel", "ucel", "xcel", "nl"]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(TAGS), max_size=40))
def test_otsl_corrections_invariants(seq):
    out = correct_otsl_sequence(seq)
    assert len(out) == len(seq)
    # invariant 1: no xcel before the first nl
    first_nl = out.index("nl") if "nl" in out else len(out)
    assert "xcel" not in out[:first_nl]
    # invariant 2: no lcel immediately after a ucel
    for a, b in zip(out, out[1:]):
        assert not (a == "ucel" and b == "lcel")
    # invariant 3: idempotent — corrected streams are fixed points
    assert correct_otsl_sequence(out) == out
    # invariant 4: only xcel→lcel / lcel→fcel rewrites happen, including
    # the chained xcel→lcel→fcel (both corrections fire in one step, as
    # in the reference's sequential masks batched_decoder.py:158-166)
    for orig, new in zip(seq, out):
        assert new == orig or (orig, new) in {
            ("xcel", "lcel"), ("lcel", "fcel"), ("xcel", "fcel")
        }


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=30))
def test_split_marker_reassembles(text):
    marker, rest = split_marker(text)
    if marker:
        # marker is a true prefix; rest is the stripped remainder
        assert text.lstrip().startswith(marker) or text.startswith(marker)
        assert rest == text[len(marker):].strip() or rest == ""
    else:
        assert rest == text.strip()


_box = st.tuples(
    st.floats(-1e3, 1e3), st.floats(-1e3, 1e3),
    st.floats(0.001, 1e3), st.floats(0.001, 1e3),
)


@settings(max_examples=300, deadline=None)
@given(_box, _box)
def test_bbox_merge_is_commutative_union(b1, b2):
    m12 = merge_bboxes_cxcywh(list(b1), list(b2))
    m21 = merge_bboxes_cxcywh(list(b2), list(b1))
    assert all(math.isclose(a, b, abs_tol=1e-9) for a, b in zip(m12, m21))
    # the merge contains both inputs (corner-space union)
    u = cxcywh_to_xyxy(m12)
    for b in (b1, b2):
        c = cxcywh_to_xyxy(list(b))
        assert u[0] <= c[0] + 1e-9 and u[1] <= c[1] + 1e-9
        assert u[2] >= c[2] - 1e-9 and u[3] >= c[3] - 1e-9
    # round-trip stability
    rt = xyxy_to_cxcywh(cxcywh_to_xyxy(m12))
    assert all(math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9) for a, b in zip(rt, m12))


def test_rb_order_occlusion_reduction_equals_naive_definition():
    """The O(|C|) max-top occlusion shortcut in _rb_order must equal the
    quantified definition (exists w: above(i,w) & above(w,j) &
    x_overlap(w,j)) on random layouts."""
    import random

    import high_performance_docling_spark.kernels.reading_order as RO

    def rb_naive(boxes, ids, labels):
        n = len(ids)
        l = [b[0] for b in boxes]; t = [b[1] for b in boxes]
        r = [b[2] for b in boxes]; btm = [b[3] for b in boxes]
        eps = RO._RB_EPS

        def xov(i, j):
            return min(r[i], r[j]) - max(l[i], l[j]) > eps

        def yfrac(i, j):
            ov = min(btm[i], btm[j]) - max(t[i], t[j])
            mh = min(btm[i] - t[i], btm[j] - t[j])
            return ov / mh if mh > 0 else 0.0

        def ab(i, j):
            return btm[i] < t[j] + eps

        r2l = {}
        for i in range(n - 1):
            j = i + 1
            if not (labels[i] in RO._TEXT_CHAIN_LABELS
                    and labels[j] in RO._TEXT_CHAIN_LABELS):
                continue
            if (r[i] < l[j] + eps and l[j] - r[i] <= RO._L2R_MAX_GAP
                    and abs(t[j] - t[i]) <= RO._L2R_TOP_ALIGN
                    and yfrac(i, j) >= RO._L2R_Y_OVERLAP):
                r2l[j] = i
        up = {i: [] for i in range(n)}
        dn = {i: [] for i in range(n)}
        for j in range(n):
            if j in r2l:
                up[j].append(r2l[j])
                dn[r2l[j]].append(j)
                continue
            for i in range(n):
                if i == j or not (xov(i, j) and ab(i, j)):
                    continue
                occ = any(w != i and w != j and ab(i, w) and ab(w, j)
                          and xov(w, j) for w in range(n))
                if not occ:
                    up[j].append(i)
                    dn[i].append(j)
        key = lambda i: (t[i], l[i])  # noqa: E731
        for i in range(n):
            dn[i].sort(key=key)
        vis, order = set(), []

        def dfs(i):
            for j in dn[i]:
                if j not in vis and all(k in vis for k in up[j]):
                    vis.add(j)
                    order.append(j)
                    dfs(j)

        for h in sorted((i for i in range(n) if not up[i]), key=key):
            if h not in vis:
                vis.add(h)
                order.append(h)
                dfs(h)
        for i in sorted(range(n), key=key):
            if i not in vis:
                vis.add(i)
                order.append(i)
                dfs(i)
        return [ids[i] for i in order]

    rng = random.Random(3)
    labsets = ["text", "list_item", "table", "picture", "caption"]
    for _ in range(150):
        n = rng.randint(1, 16)
        boxes, labels = [], []
        for _ in range(n):
            l0, t0 = rng.uniform(0, 500), rng.uniform(0, 700)
            boxes.append((l0, t0, l0 + rng.uniform(5, 120),
                          t0 + rng.uniform(5, 80)))
            labels.append(rng.choice(labsets))
        ids = list(range(n))
        assert RO._rb_order(boxes, ids, labels) == rb_naive(boxes, ids, labels)


def test_html_extractor_total_on_arbitrary_input():
    """html_to_spans must be TOTAL: any text input yields a (possibly
    empty) span list, never an exception — web-scale corpora are full of
    malformed markup."""
    from hypothesis import given, settings, strategies as st

    from high_performance_docling_spark.kernels.html_extract import (
        html_to_spans,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=400))
    def run(s):
        spans = html_to_spans(s)
        assert [sp["order"] for sp in spans] == list(range(len(spans)))

    run()


def test_pdf_parser_rejects_or_parses_never_crashes():
    """parse_pdf_pages: ValueError on junk, structured pages otherwise —
    no other exception class escapes on fuzzed PDF-ish bytes."""
    from hypothesis import given, settings, strategies as st

    from high_performance_docling_spark.kernels.pdf_parse import (
        parse_pdf_pages,
    )

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=300))
    def run(data):
        for payload in (data, b"%PDF-1.4\n" + data):
            try:
                pages = parse_pdf_pages(payload)
                assert isinstance(pages, list) and pages
            except ValueError:
                pass

    run()


def test_html_extractor_tag_soup_and_strip_mode_always_exits():
    """Structured tag-soup fuzz for the end-tag matcher: random nesting
    with omitted/stray end tags, void tags, and boilerplate subtrees —
    the extractor must stay total, keep orders sequential, and content
    AFTER any boilerplate region must always survive (the r3 strip-mode
    wedge class)."""
    from hypothesis import given, settings, strategies as st

    from high_performance_docling_spark.kernels.html_extract import (
        html_to_spans,
    )

    # no strip-capable tags in the soup: an UNCLOSED <nav>/<form>
    # correctly swallows the remainder (browser semantics), which is not
    # the wedge class under test (voids + omitted ends inside balanced
    # boilerplate)
    tag = st.sampled_from(
        ["p", "div", "li", "ul", "span", "td", "tr", "table", "h2",
         "br", "img", "input", "hr", "a"]
    )
    piece = st.one_of(
        tag.map(lambda t: f"<{t}>"),
        tag.map(lambda t: f"</{t}>"),
        tag.map(lambda t: f"<{t}/>"),
        st.text(alphabet="abc xyz", min_size=1, max_size=12),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(piece, max_size=30))
    def run(pieces):
        soup = "".join(pieces)
        html = f"<nav>junk{soup}</nav>{soup}<p>sentinel survives here</p>"
        spans = html_to_spans(html)
        assert [sp["order"] for sp in spans] == list(range(len(spans)))
        assert any("sentinel survives here" in sp["text"] for sp in spans), \
            soup

    run()
