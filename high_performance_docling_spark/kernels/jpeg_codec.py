"""Pure-Python/NumPy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

JPEG is the image format real figure crops and crawl images actually
arrive in (reference analogue: figure-crop consumption,
/root/reference/document_assembler.py:62-90), so the multimodal decode
surface needs a real decoder next to the PNG/WAV/APNG ones. Implemented
from the public spec in the png_codec style — no external imaging libs:

  decode_jpeg: baseline sequential DCT (SOF0), 8-bit precision,
    Huffman entropy coding (DHT), 8/16-bit quant tables (DQT), restart
    intervals (DRI/RSTn), grayscale or YCbCr with any h/v sampling
    factors up to 4 (4:4:4, 4:2:2, 4:2:0 covered by tests), JFIF/EXIF
    APPn segments skipped. Progressive (SOF2), arithmetic coding and
    12-bit precision raise ValueError — they are extensions, not
    baseline.
  encode_jpeg: baseline encoder (4:4:4 or grayscale, Annex-K example
    tables scaled by the IJG quality formula) used for deterministic
    fixtures and round-trip property tests.

Everything raises ValueError on malformed input (the multimodal
operators' per-row error contract).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8-point DCT-II basis: A[k, n] = c(k) cos((2n+1)kπ/16),
# IDCT(block) = A.T @ block @ A  (T.81 §A.3.3 up to the 1/4·C(u)C(v)
# normalization folded into the orthonormal scaling)
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.5) if _k == 0 else 1.0
    for _n in range(8):
        _A[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _HuffTable:
    """Canonical Huffman table (T.81 Annex C): (length, code) → symbol."""

    def __init__(self, bits: list[int], values: bytes):
        if sum(bits) != len(values):
            raise ValueError("DHT: BITS/HUFFVAL length mismatch")
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over unstuffed scan bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG scan data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start`` until the next non-RST marker:
    unstuff 0xFF00, split on RST0-7 (restart boundaries). Returns
    (segments, offset of the terminating marker's 0xFF)."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("JPEG truncated inside scan")
        m = data[i + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:
            return [bytes(s) for s in segs], i
    raise ValueError("JPEG scan missing terminating marker")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) uint8 RGB (grayscale replicates
    into 3 channels). Raises ValueError on malformed or non-baseline
    input."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (H, W, [(cid, h, v, tq), ...])
    i = 2
    n = len(data)
    planes: dict[int, np.ndarray] | None = None
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = data[i + 1] if i + 1 < n else None
        if marker is None:
            raise ValueError("JPEG truncated at marker")
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if i + 2 > n:
            raise ValueError("JPEG truncated in segment length")
        seg_len = int.from_bytes(data[i:i + 2], "big")
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("bad JPEG segment length")
        seg = data[i + 2:i + seg_len]
        i += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                if len(tbl) != 64:
                    raise ValueError("truncated DQT table")
                z = np.zeros(64, dtype=np.int32)
                z[_ZIGZAG] = tbl.astype(np.int32)
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                if len(bits) != 16:
                    raise ValueError("truncated DHT")
                cnt = sum(bits)
                vals = seg[p + 17:p + 17 + cnt]
                if len(vals) != cnt:
                    raise ValueError("truncated DHT values")
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                p += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision is baseline")
            h_img = int.from_bytes(seg[1:3], "big")
            w_img = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if not h_img or not w_img or ncomp not in (1, 3):
                raise ValueError("unsupported SOF0 geometry")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError("bad sampling factors")
                comps.append((cid, h, v, tq))
            frame = (h_img, w_img, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic/"
                             "extended) is not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid = seg[1 + 2 * c]
                tsel = seg[2 + 2 * c]
                sel[cid] = (tsel >> 4, tsel & 0x0F)
            segments, i = _split_scan(data, i)
            planes = _decode_scan(frame, sel, qt, huff_dc, huff_ac,
                                  segments, restart_interval)
        # APPn (E0-EF), COM (FE) and anything else: skipped
    if frame is None or planes is None:
        raise ValueError("JPEG missing SOF0/SOS")
    return _to_rgb(frame, planes)


def _decode_scan(frame, sel, qt, huff_dc, huff_ac, segments,
                 restart_interval) -> dict[int, np.ndarray]:
    h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    total_mcus = mcus_x * mcus_y
    planes = {}
    for cid, h, v, _tq in comps:
        planes[cid] = np.zeros((mcus_y * v * 8, mcus_x * h * 8),
                               dtype=np.float64)
    pred = {cid: 0 for cid, *_ in comps}
    seg_ix = 0
    reader = _BitReader(segments[0])
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_ix += 1
            if seg_ix >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segments[seg_ix])
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcus_x)
        for cid, h, v, tq in comps:
            if cid not in sel:
                raise ValueError("SOS lacks a frame component")
            dc_t, ac_t = sel[cid]
            if dc_t not in huff_dc or ac_t not in huff_ac or tq not in qt:
                raise ValueError("JPEG references an undefined table")
            for by in range(v):
                for bx in range(h):
                    coeff = np.zeros(64, dtype=np.int32)
                    t = reader.decode(huff_dc[dc_t])
                    if t > 11:
                        raise ValueError("bad DC category")
                    diff = _extend(reader.read_bits(t), t)
                    pred[cid] += diff
                    coeff[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.decode(huff_ac[ac_t])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coeff[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.int32)
                    block[_ZIGZAG] = coeff
                    px = _idct2(block.reshape(8, 8) * qt[tq]) + 128.0
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    planes[cid][y0:y0 + 8, x0:x0 + 8] = px
    return planes


def _to_rgb(frame, planes) -> np.ndarray:
    h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, h, v, _tq in comps:
        p = planes[cid]
        if h != hmax or v != vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (fixtures + round-trip property tests)
# --------------------------------------------------------------------------

# T.81 Annex K.1 example quantization tables (the de-facto standard)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# T.81 Annex K.3 example Huffman tables
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = bytes(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = bytes(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → the Annex-K table verbatim."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (T.81 F.1.2.3)
        return bytes(self.out)


def _enc_table(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    t = _HuffTable(bits, values)
    return {sym: (code, length) for (length, code), sym in t.lookup.items()}


def _mag_bits(v: int) -> tuple[int, int]:
    """signed value → (category t, t magnitude bits per T.81 F.1.2.1)."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t, (v if v >= 0 else v + (1 << t) - 1)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) or (H, W) uint8 → baseline JPEG bytes (4:4:4 / gray)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W) or (H, W, 3)")
    h_img, w_img = img.shape[:2]
    if gray:
        comps_px = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps_px = [y, cb, cr]
    ql = _scale_q(_Q_LUMA, quality)
    qc = _scale_q(_Q_CHROMA, quality)
    qtabs = [ql] + ([qc, qc] if not gray else [])
    dc_enc = [_enc_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _enc_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_enc = [_enc_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _enc_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    for tq, q in enumerate([ql] if gray else [ql, qc]):
        seg(0xDB, bytes([tq]) + bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big") \
        + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    seg(0xC0, sof)
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
              (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                   (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tid, bits, vals in tables:
        seg(0xC4, bytes([tid]) + bytes(bits) + vals)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    w = _BitWriter()
    pred = [0] * ncomp
    bh = -(-h_img // 8)
    bw = -(-w_img // 8)
    padded = []
    for px in comps_px:
        p = np.empty((bh * 8, bw * 8))
        p[:h_img, :w_img] = px
        p[h_img:, :w_img] = px[-1:, :]          # edge-replicate padding
        p[:, w_img:] = p[:, w_img - 1:w_img]
        padded.append(p)
    for by in range(bh):
        for bx in range(bw):
            for c in range(ncomp):
                ti = 0 if c == 0 else 1
                block = padded[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = np.round(_dct2(block) / qtabs[c]).astype(np.int32)
                zz = coef.reshape(-1)[_ZIGZAG]
                t, mag = _mag_bits(int(zz[0]) - pred[c])
                pred[c] = int(zz[0])
                code, length = dc_enc[ti][t]
                w.write(code, length)
                if t:
                    w.write(mag, t)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_enc[ti][0xF0]  # ZRL
                        w.write(code, length)
                        run -= 16
                    t, mag = _mag_bits(v)
                    code, length = ac_enc[ti][(run << 4) | t]
                    w.write(code, length)
                    w.write(mag, t)
                    run = 0
                if last_nz < 63:
                    code, length = ac_enc[ti][0x00]  # EOB
                    w.write(code, length)
    out.extend(w.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
