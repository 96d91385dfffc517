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
