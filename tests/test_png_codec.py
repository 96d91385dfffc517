"""Pure-Python PNG codec: encode/decode round-trip, full filter-type
decode coverage, and corruption detection."""

import struct
import zlib

import numpy as np
import pytest

from high_performance_docling_spark.kernels.png_codec import (
    _chunk,
    decode_png,
    encode_png,
)


def _rng_img(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_roundtrip_grey_and_rgb():
    for shape in [(1, 1), (3, 5), (40, 17), (16, 16, 3), (31, 9, 3)]:
        img = _rng_img(shape)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape and (out == img).all(), shape


def test_encode_is_deterministic():
    img = _rng_img((20, 30))
    assert encode_png(img) == encode_png(img)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types,
    via an independent scalar-loop filter implementation (RFC 2083)."""
    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * channels).astype(np.int32)
    stride, bpp = w * channels, channels
    raw = bytearray()
    recon = np.zeros((h, stride), dtype=np.int32)
    recon[:] = flat
    for y, ft in enumerate(ftypes):
        raw.append(ft)
        for x in range(stride):
            cur = int(flat[y, x])
            left = int(recon[y, x - bpp]) if x >= bpp else 0
            up = int(recon[y - 1, x]) if y else 0
            ul = int(recon[y - 1, x - bpp]) if (y and x >= bpp) else 0
            if ft == 0:
                v = cur
            elif ft == 1:
                v = cur - left
            elif ft == 2:
                v = cur - up
            elif ft == 3:
                v = cur - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                v = cur - pred
            raw.append(v & 0xFF)
    color = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_decode_all_five_filter_types():
    img = _rng_img((10, 7), seed=3)
    rgb = _rng_img((8, 6, 3), seed=4)
    for arr in (img, rgb):
        h = arr.shape[0]
        # every filter type appears, including on the first scanline
        ftypes = [(y * 2 + 3) % 5 for y in range(h)]
        ftypes[0], ftypes[1] = 4, 1
        out = decode_png(_png_with_filters(arr, ftypes))
        assert (out == arr).all()


def test_corruption_detected():
    data = bytearray(encode_png(_rng_img((5, 5))))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" + bytes(data[1:]))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_unsupported_flavors_rejected():
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 4), dtype=np.uint8))
    # 16-bit depth PNG header rejected by decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)
