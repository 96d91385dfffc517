"""Real-math neural stand-ins for the GPU models (no torch/GPU in this
sandbox — everything here is genuine tensor math in NumPy float32).

Three modules, matching the reference's three model contracts:

1. ``ConvLayoutDetector`` — RT-DETR-shaped (fork/layout/
   layout_predictor_gpu.py:92-137, 267-292): consumes REAL float32 NCHW
   batches, runs a real 3x3 convolution forward (shifted-multiply
   accumulation — the same arithmetic as im2col), and a deterministic
   ``post_process`` that thresholds the feature maps and emits
   {label, l, t, r, b, confidence} dicts. The input raster encodes the
   page deterministically (exact-area-coverage plane + label/parity
   id planes — the sandbox's synthetic "page image"), which lets the
   post-process recover boxes to ~1e-6 pt from pixel coverage alone, so
   END-TO-END SPANS STAY EXACT when this model replaces
   synth_detections. Weights for the forward are fixed constants
   (identity + Sobel taps); nothing about the page reaches the output
   except through the tensor.

2. ``TinyRTDETR`` — random fixed-seed weights (the verdict's "(a)"
   contract): conv s2 → ReLU → conv s2 → ReLU → 1x1 head emitting
   per-cell (logits, boxes); ``post_process`` sigmoids + thresholds.
   Used to pin dtype/NCHW/pad-slice plumbing with weights that are
   genuinely random (its detections are meaningless by design).

3. ``ToyARDecoder`` — TableFormer-shaped autoregressive decoder
   (fork/table/transformer_rs.py:43-385, batched_decoder.py:61-370):
   pre-LN single-layer transformer with 2-head causal self-attention,
   greedy decode ONE TOKEN PER STEP with an actual KV-cache append.
   The reference's own gate (test_kv_cache_math.py:12-80) is
   reproduced: a KV-cached stepwise pass must equal the full-attention
   recompute to atol 1e-6.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .. import labels as L

# ---------------------------------------------------------------------------
# shared real conv math
# ---------------------------------------------------------------------------


def conv2d_3x3(x: np.ndarray, w: np.ndarray, stride: int = 1) -> np.ndarray:
    """Real 2-D convolution, NCHW x [O,C,3,3] -> NCHW (same padding).

    Implemented as nine shifted multiplies accumulated in float32 — the
    identical arithmetic an im2col GEMM performs, without materializing
    the 9x patch tensor."""
    b, c, h, wd = x.shape
    o = w.shape[0]
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = np.zeros((b, o, h, wd), dtype=np.float32)
    for i in range(3):
        for j in range(3):
            patch = xp[:, :, i:i + h, j:j + wd]
            out += np.einsum(
                "bchw,oc->bohw", patch, w[:, :, i, j], optimize=True
            ).astype(np.float32)
    if stride > 1:
        out = out[:, :, ::stride, ::stride]
    return np.ascontiguousarray(out)


# ---------------------------------------------------------------------------
# 1. ConvLayoutDetector — exact detection from real tensors
# ---------------------------------------------------------------------------

CANVAS_H, CANVAS_W = 800, 640  # fits US-Letter 612x792 at scale 1


def render_detect_input(
    width: float, height: float, elements: list[dict[str, Any]]
) -> np.ndarray:
    """Page -> float32 CHW raster (the engine's deterministic "page
    image" for detection):

      ch0  exact area coverage of every element rect (float64 math,
           cast to float32) — carries sub-pixel edge positions;
      ch1  label-id plane, pixel-center fill, value (label_idx+1)/32
           (exact in float32);
      ch2  instance-parity plane, value ((elem_ix % 5)+1)/8 — separates
           ADJACENT same-label rects into distinct masks even when they
           touch at pixel granularity.
    """
    img = np.zeros((3, CANVAS_H, CANVAS_W), dtype=np.float32)
    for ix, el in enumerate(elements):
        l, t = float(el["l"]), float(el["t"])
        r, b = float(el["r"]), float(el["b"])
        if r <= l or b <= t:
            continue
        # exact per-axis pixel coverage of [l,r) x [t,b)
        x0, x1 = int(np.floor(l)), min(int(np.ceil(r)), CANVAS_W)
        y0, y1 = int(np.floor(t)), min(int(np.ceil(b)), CANVAS_H)
        xs = np.arange(x0, x1, dtype=np.float64)
        ys = np.arange(y0, y1, dtype=np.float64)
        cov_x = np.clip(np.minimum(xs + 1, r) - np.maximum(xs, l), 0, 1)
        cov_y = np.clip(np.minimum(ys + 1, b) - np.maximum(ys, t), 0, 1)
        img[0, y0:y1, x0:x1] += np.outer(cov_y, cov_x).astype(np.float32)
        # center-fill planes
        cxs = np.nonzero((xs + 0.5 >= l) & (xs + 0.5 < r))[0]
        cys = np.nonzero((ys + 0.5 >= t) & (ys + 0.5 < b))[0]
        if len(cxs) and len(cys):
            label_ix = L.ALL_LABELS.index(el["label"])
            yy = ys[cys].astype(int)[:, None]
            xx = xs[cxs].astype(int)[None, :]
            img[1, yy, xx] = np.float32((label_ix + 1) / 32.0)
            img[2, yy, xx] = np.float32(((ix % 5) + 1) / 8.0)
    return img


def _rects_from_mask(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Disjoint axis-aligned rects from a binary mask via recursive
    XY-cut (split on empty rows, then empty cols); BFS flood fill is the
    fallback for pinwheel configurations no cut can separate."""
    out: list[tuple[int, int, int, int]] = []

    def rec(y0: int, x0: int, m: np.ndarray) -> None:
        rows = m.any(axis=1)
        cols = m.any(axis=0)
        ry = np.nonzero(rows)[0]
        rx = np.nonzero(cols)[0]
        if len(ry) == 0:
            return
        ya, yb, xa, xb = ry[0], ry[-1] + 1, rx[0], rx[-1] + 1
        m = m[ya:yb, xa:xb]
        y0, x0 = y0 + ya, x0 + xa
        gaps_y = np.nonzero(~m.any(axis=1))[0]
        if len(gaps_y):
            g = gaps_y[0]
            rec(y0, x0, m[:g])
            rec(y0 + g + 1, x0, m[g + 1:])
            return
        gaps_x = np.nonzero(~m.any(axis=0))[0]
        if len(gaps_x):
            g = gaps_x[0]
            rec(y0, x0, m[:, :g])
            rec(y0, x0 + g + 1, m[:, g + 1:])
            return
        if m.all():  # solid rect
            out.append((y0, x0, y0 + m.shape[0], x0 + m.shape[1]))
            return
        # fallback: flood fill (rects sharing every cut line)
        m = m.copy()
        while m.any():
            seed = np.argwhere(m)[0]
            comp = np.zeros_like(m)
            stack = [tuple(seed)]
            comp[tuple(seed)] = True
            m[tuple(seed)] = False
            while stack:
                cy, cx = stack.pop()
                for ny, nx in ((cy - 1, cx), (cy + 1, cx), (cy, cx - 1),
                               (cy, cx + 1)):
                    if (0 <= ny < m.shape[0] and 0 <= nx < m.shape[1]
                            and m[ny, nx]):
                        m[ny, nx] = False
                        comp[ny, nx] = True
                        stack.append((ny, nx))
            ys, xs = np.nonzero(comp)
            out.append((y0 + ys.min(), x0 + xs.min(),
                        y0 + ys.max() + 1, x0 + xs.max() + 1))

    rec(0, 0, mask)
    return out


class ConvLayoutDetector:
    """Executor-local singleton detector. ``predict_batch`` is ONE real
    batched conv forward over a float32 NCHW tensor followed by a
    deterministic post-process — the RT-DETR slot of
    layout_predictor_gpu.py:236-315."""

    def __init__(self) -> None:
        # fixed conv weights: identity taps for each input plane plus a
        # Sobel-x edge tap on the coverage plane (computed, available to
        # the post-process; the recovery itself reads the identity maps)
        w = np.zeros((4, 3, 3, 3), dtype=np.float32)
        w[0, 0, 1, 1] = 1.0  # coverage identity
        w[1, 1, 1, 1] = 1.0  # label-plane identity
        w[2, 2, 1, 1] = 1.0  # parity-plane identity
        w[3, 0] = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
                           dtype=np.float32)  # Sobel-x
        self.weights = w
        self.n_forward_calls = 0

    # -- the model forward --------------------------------------------------
    def forward(self, batch: np.ndarray) -> np.ndarray:
        assert batch.dtype == np.float32 and batch.ndim == 4, (
            "NCHW float32 contract", batch.dtype, batch.shape)
        return conv2d_3x3(batch, self.weights)

    # -- RT-DETR-style post-process ------------------------------------------
    @staticmethod
    def post_process(feat: np.ndarray) -> list[dict[str, Any]]:
        """One image's feature maps [4,H,W] -> detection dicts. Thresholds
        the label plane, extracts per-(label,parity) rect components, and
        recovers sub-pixel edges from the coverage plane."""
        cov, lab, par = feat[0], feat[1], feat[2]
        dets: list[dict[str, Any]] = []
        keys = np.unique(
            np.stack([lab[lab > 0], par[lab > 0]]), axis=1
        ) if (lab > 0).any() else np.zeros((2, 0))
        for v_lab, v_par in keys.T:
            mask = (lab == v_lab) & (par == v_par)
            label = L.ALL_LABELS[int(round(float(v_lab) * 32)) - 1]
            for y0, x0, y1, x1 in _rects_from_mask(mask):
                # pad ±1 px: partial-coverage boundary pixels sit just
                # outside the center-fill mask
                ya, xa = max(y0 - 1, 0), max(x0 - 1, 0)
                yb = min(y1 + 1, cov.shape[0])
                xb = min(x1 + 1, cov.shape[1])
                win = cov[ya:yb, xa:xb].astype(np.float64)
                ymid, xmid = (yb - ya) // 2, (xb - xa) // 2
                rowm, colm = win[ymid], win[:, xmid]
                nzx, nzy = np.nonzero(rowm)[0], np.nonzero(colm)[0]
                lx, rx = nzx[0], nzx[-1]
                ty, by = nzy[0], nzy[-1]
                el = xa + lx + (1.0 - rowm[lx] if rowm[lx] < 1.0 else 0.0)
                er = xa + rx + (rowm[rx] if rowm[rx] < 1.0 else 1.0)
                et = ya + ty + (1.0 - colm[ty] if colm[ty] < 1.0 else 0.0)
                eb = ya + by + (colm[by] if colm[by] < 1.0 else 1.0)
                dets.append({"label": label, "l": float(el), "t": float(et),
                             "r": float(er), "b": float(eb),
                             "confidence": 0.98})
        dets.sort(key=lambda d: (d["t"], d["l"], d["r"], d["b"], d["label"]))
        for i, d in enumerate(dets):
            d["id"] = i
        return dets

    def predict_batch(self, images: list[np.ndarray]) -> list[list[dict]]:
        self.n_forward_calls += 1
        batch = np.stack(images).astype(np.float32, copy=False)  # NCHW
        feats = self.forward(batch)
        return [self.post_process(feats[i]) for i in range(feats.shape[0])]


# ---------------------------------------------------------------------------
# 2. TinyRTDETR — random fixed-seed weights, contract-only
# ---------------------------------------------------------------------------


class TinyRTDETR:
    """Random-weight RT-DETR-shaped net: backbone conv(3->8, s2) + ReLU +
    conv(8->16, s2) + ReLU, then a 1x1 head emitting per-cell
    (num_labels logits + 4 box params); ``post_process`` sigmoids and
    thresholds. Detections are meaningless (untrained) — this class
    exists to pin the tensor contract (dtype, NCHW, static batch,
    pad-slice, determinism) with genuinely random weights."""

    def __init__(self, seed: int = 17, num_labels: int = 5):
        rng = np.random.default_rng(seed)
        self.w1 = (rng.standard_normal((8, 3, 3, 3)) * 0.2).astype(np.float32)
        self.w2 = (rng.standard_normal((16, 8, 3, 3)) * 0.2).astype(np.float32)
        self.head = (rng.standard_normal((num_labels + 4, 16)) * 0.2).astype(
            np.float32)
        self.num_labels = num_labels
        self.n_forward_calls = 0

    def forward(self, x: np.ndarray) -> np.ndarray:
        assert x.dtype == np.float32 and x.ndim == 4
        h = np.maximum(conv2d_3x3(x, self.w1, stride=2), 0.0)
        h = np.maximum(conv2d_3x3(h, self.w2, stride=2), 0.0)
        # 1x1 head: [B,16,H,W] -> [B,num_labels+4,H,W]
        return np.einsum("bchw,oc->bohw", h, self.head,
                         optimize=True).astype(np.float32)

    def post_process(self, feat: np.ndarray, threshold: float = 0.6
                     ) -> list[dict[str, Any]]:
        """Per-cell sigmoid over logits; cells whose best class clears the
        threshold emit a normalized cxcywh box (RT-DETR post_process
        shape: score threshold + box decode)."""
        logits, boxes = feat[: self.num_labels], feat[self.num_labels:]
        probs = 1.0 / (1.0 + np.exp(-logits))
        best = probs.max(axis=0)
        cls = probs.argmax(axis=0)
        ys, xs = np.nonzero(best > threshold)
        out = []
        for y, x in zip(ys, xs):
            bx = 1.0 / (1.0 + np.exp(-boxes[:, y, x]))
            out.append({"label": int(cls[y, x]),
                        "confidence": float(best[y, x]),
                        "box_cxcywh": [float(v) for v in bx]})
        return out

    def predict_batch(self, images: list[np.ndarray]) -> list[list[dict]]:
        self.n_forward_calls += 1
        batch = np.stack(images).astype(np.float32, copy=False)
        feats = self.forward(batch)
        return [self.post_process(feats[i]) for i in range(feats.shape[0])]


# ---------------------------------------------------------------------------
# 3. ToyARDecoder — KV-cached autoregressive decode
# ---------------------------------------------------------------------------


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return g * (x - mu) / np.sqrt(var + 1e-5) + b


class ToyARDecoder:
    """TableFormer-shaped single-layer transformer decoder (pre-LN,
    2-head causal self-attention, FFN, weight-tied logits) with a REAL
    KV cache: ``decode_step`` appends this step's K,V and attends over
    the whole cache — transformer_rs.py:100-285's incremental path —
    while ``full_forward`` recomputes the causal full-attention stack.
    The two must agree to atol 1e-6 (test_kv_cache_math.py:12-80)."""

    def __init__(self, seed: int = 5, vocab: int = 12, d: int = 16,
                 heads: int = 2, max_len: int = 32):
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(d)

        def mat(*shape):
            return (rng.standard_normal(shape) * s).astype(np.float32)

        self.E = mat(vocab, d)
        self.pos = mat(max_len, d)
        self.wq, self.wk, self.wv, self.wo = (mat(d, d) for _ in range(4))
        self.w1, self.w2 = mat(d, 4 * d), mat(4 * d, d)
        self.g1, self.b1 = np.ones(d, np.float32), np.zeros(d, np.float32)
        self.g2, self.b2 = np.ones(d, np.float32), np.zeros(d, np.float32)
        self.vocab, self.d, self.heads = vocab, d, heads

    # -- shared block math ---------------------------------------------------
    def _qkv(self, h: np.ndarray):
        return h @ self.wq, h @ self.wk, h @ self.wv

    def _heads(self, x: np.ndarray) -> np.ndarray:
        t = x.shape[0]
        return x.reshape(t, self.heads, self.d // self.heads).swapaxes(0, 1)

    def _attn_out(self, q, k, v) -> np.ndarray:
        """q: [H,1|T,dh]; k,v: [H,T,dh] — softmax(qk/sqrt)v, merged."""
        dh = self.d // self.heads
        scores = q @ k.swapaxes(1, 2) / np.sqrt(dh)
        if q.shape[1] > 1:  # full pass: causal mask
            t = q.shape[1]
            scores = np.where(
                np.tril(np.ones((t, t), bool))[None], scores, -1e9)
        scores = scores - scores.max(axis=-1, keepdims=True)
        w = np.exp(scores)
        w = w / w.sum(axis=-1, keepdims=True)
        out = w @ v  # [H, ., dh]
        return out.swapaxes(0, 1).reshape(-1, self.d)

    def _block(self, h: np.ndarray, k_all, v_all, q_rows) -> np.ndarray:
        """One decoder block given precomputed K/V for all positions and
        the query rows to produce (1 for a step, T for full)."""
        a = self._attn_out(self._heads(q_rows), self._heads(k_all),
                           self._heads(v_all)) @ self.wo
        x = h + a
        f = _layer_norm(x, self.g2, self.b2)
        return x + np.maximum(f @ self.w1, 0.0) @ self.w2

    # -- full (recompute) path ----------------------------------------------
    def full_forward(self, tokens: list[int]) -> np.ndarray:
        """[T] tokens -> [T,d] hidden states, full causal attention.

        Math accumulates in float64 (the NumPy stand-in for a GPU GEMM's
        fp32-accumulate) so the stepwise-vs-full gate measures the KV
        CONTRACT, not BLAS summation-order noise; I/O stays float32."""
        h = (self.E[tokens] + self.pos[: len(tokens)]).astype(np.float64)
        n = _layer_norm(h, self.g1, self.b1)
        q, k, v = self._qkv(n)
        return self._block(h, k, v, q).astype(np.float32)

    # -- KV-cached stepwise path ----------------------------------------------
    def new_cache(self) -> dict:
        return {"k": np.zeros((0, self.d), np.float64),
                "v": np.zeros((0, self.d), np.float64)}

    def decode_step(self, tok: int, cache: dict) -> np.ndarray:
        """One token in, [d] hidden out; APPENDS this step's K,V to the
        cache (the actual KV-cache contract)."""
        t = cache["k"].shape[0]
        h = (self.E[tok] + self.pos[t]).astype(np.float64)[None]
        n = _layer_norm(h, self.g1, self.b1)
        q, k, v = self._qkv(n)
        cache["k"] = np.concatenate([cache["k"], k])
        cache["v"] = np.concatenate([cache["v"], v])
        return self._block(h, cache["k"], cache["v"], q)[0].astype(np.float32)

    def greedy_decode(self, start: int, n_steps: int) -> list[int]:
        """Greedy AR decode via the cached path (weight-tied logits)."""
        cache = self.new_cache()
        toks = [start]
        for _ in range(n_steps):
            hid = self.decode_step(toks[-1], cache)
            toks.append(int((hid @ self.E.T).argmax()))
        return toks
