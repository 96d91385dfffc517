"""Vectorized bounding-box geometry kernels (NumPy).

Boxes are (l, t, r, b) in TOP-LEFT-origin page coordinates, stored as
float64 arrays of shape (N, 4). These are the primitives behind every
spatial "join" in the pipeline (reference kernels:
fork/layout/layout_postprocessor.py:224-277, fork/table/tf_cell_matcher.py:56-81,
page_word_index.py:80-126) rewritten as clean array ops.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "area",
    "intersection_area",
    "iou_matrix",
    "ios_matrix",
    "pairwise_overlap_mask",
    "envelope",
    "union_find_groups",
    "cxcywh_to_xyxy",
    "xyxy_to_cxcywh",
    "merge_bboxes_cxcywh",
]


def area(boxes: np.ndarray) -> np.ndarray:
    """Areas of an (N,4) box array; negative extents clip to 0."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    w = np.clip(boxes[:, 2] - boxes[:, 0], 0.0, None)
    h = np.clip(boxes[:, 3] - boxes[:, 1], 0.0, None)
    return w * h


def intersection_area(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise intersection areas: (N,4) x (M,4) -> (N,M)."""
    a = np.asarray(a, dtype=np.float64).reshape(-1, 4)
    b = np.asarray(b, dtype=np.float64).reshape(-1, 4)
    l = np.maximum(a[:, None, 0], b[None, :, 0])
    t = np.maximum(a[:, None, 1], b[None, :, 1])
    r = np.minimum(a[:, None, 2], b[None, :, 2])
    bt = np.minimum(a[:, None, 3], b[None, :, 3])
    return np.clip(r - l, 0.0, None) * np.clip(bt - t, 0.0, None)


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,M) intersection-over-union; 0 where the union is empty."""
    inter = intersection_area(a, b)
    ua = area(a)[:, None] + area(b)[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(ua > 0.0, inter / np.maximum(ua, 1e-300), 0.0)
    return out


def ios_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,M) intersection-over-self(a): inter(a_i, b_j) / area(a_i)."""
    inter = intersection_area(a, b)
    aa = area(a)[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(aa > 0.0, inter / np.maximum(aa, 1e-300), 0.0)
    return out


def pairwise_overlap_mask(
    boxes: np.ndarray,
    overlap_threshold: float = 0.8,
    containment_threshold: float = 0.8,
    epsilon: float = 0.0,
) -> np.ndarray:
    """Symmetric (N,N) bool mask: True where boxes i, j "overlap enough".

    Matches the reference's check (layout_postprocessor.py:98-122, 685-697):
    IoU >= overlap_threshold - eps, or either-way containment
    (intersection-over-self) >= containment_threshold - eps. Zero-area
    boxes never overlap; the diagonal is False.
    """
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    l, t, r, b = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # fused intersection_area(boxes, boxes): reuse iw as the inter buffer
    iw = np.minimum(r[:, None], r[None, :]) - np.maximum(l[:, None], l[None, :])
    ih = np.minimum(b[:, None], b[None, :]) - np.maximum(t[:, None], t[None, :])
    np.clip(iw, 0.0, None, out=iw)
    np.clip(ih, 0.0, None, out=ih)
    inter = iw
    inter *= ih
    ar = np.clip(r - l, 0.0, None) * np.clip(b - t, 0.0, None)
    ovlp_thr = overlap_threshold - epsilon
    cont_thr = containment_threshold - epsilon
    # Denominators are clamped to >= 1e-300, so the divisions are exact
    # where area > 0 and never raise; zero-area lanes compute garbage-free
    # zeros (inter is 0 there) and are masked out below anyway — identical
    # results to the guarded np.where form, without the errstate overhead.
    cont_a = inter / np.maximum(ar[:, None], 1e-300)
    cont_b = inter / np.maximum(ar[None, :], 1e-300)
    iou = inter / np.maximum(ar[:, None] + ar[None, :] - inter, 1e-300)
    mask = (iou >= ovlp_thr) | (cont_a >= cont_thr) | (cont_b >= cont_thr)
    pos = ar > 0.0
    mask &= pos[:, None] & pos[None, :]
    np.fill_diagonal(mask, False)
    return mask


def envelope(boxes: np.ndarray) -> tuple[float, float, float, float]:
    """Bounding envelope (min l, min t, max r, max b) of an (N,4) array."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    return (
        float(boxes[:, 0].min()),
        float(boxes[:, 1].min()),
        float(boxes[:, 2].max()),
        float(boxes[:, 3].max()),
    )


def union_find_groups(n: int, edges: np.ndarray) -> list[list[int]]:
    """Connected components over n nodes given (E,2) edge pairs.

    Returns groups ordered by the smallest member index, members in index
    order — matching the reference UnionFind's insertion-ordered group
    output (layout_postprocessor.py:22-52) when elements are processed in
    input order.
    """
    parent = list(range(n))

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    # plain-int iteration: numpy row iteration pays an array-scalar box
    # per element; lists of pairs pass through unchanged
    if not isinstance(edges, list):
        edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2).tolist()
    for i, j in edges:
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return [groups[k] for k in sorted(groups)]


def cxcywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    """Center format → corner format (tablemodel04_rs.py:277-289);
    vectorized over [..., 4]."""
    b = np.asarray(b, dtype=np.float64)
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        (cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h), axis=-1
    )


def xyxy_to_cxcywh(b: np.ndarray) -> np.ndarray:
    """Corner format → center format with the reference's 1e-6 min-extent
    clamp (tablemodel04_rs.py:291-303)."""
    b = np.asarray(b, dtype=np.float64)
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    w = np.maximum(x2 - x1, 1e-6)
    h = np.maximum(y2 - y1, 1e-6)
    return np.stack((x1 + 0.5 * w, y1 + 0.5 * h, w, h), axis=-1)


def merge_bboxes_cxcywh(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """Order-agnostic union of cxcywh box pairs, batched — the bbox merge
    the AR decoder applies to lcel spans (tablemodel04_rs.py:305-339
    mergebboxes / mergebboxes_batch)."""
    a = cxcywh_to_xyxy(b1)
    b = cxcywh_to_xyxy(b2)
    merged = np.stack(
        (
            np.minimum(a[..., 0], b[..., 0]),
            np.minimum(a[..., 1], b[..., 1]),
            np.maximum(a[..., 2], b[..., 2]),
            np.maximum(a[..., 3], b[..., 3]),
        ),
        axis=-1,
    )
    return xyxy_to_cxcywh(merged)
