"""Baseline JPEG codec (kernels/jpeg_codec.py, ITU-T T.81): analytic
decode fixtures built byte-by-byte (independent of the encoder),
round-trip property tests, subsampling/restart/error paths, and the
multimodal routing. JPEG is the format real figure crops arrive in —
reference analogue: /root/reference/document_assembler.py:62-90."""

import numpy as np
import pytest

from high_performance_docling_spark.kernels.jpeg_codec import (
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _BitWriter,
    _enc_table,
    _mag_bits,
    decode_jpeg,
    encode_jpeg,
)

DC_ENC = _enc_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
AC_ENC = _enc_table(_AC_LUMA_BITS, _AC_LUMA_VALS)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def _dqt_flat(q: int, tq: int = 0) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes([q] * 64))


def _dht_luma() -> bytes:
    return (_seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + _DC_LUMA_VALS)
            + _seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + _AC_LUMA_VALS))


def _write_dc_only_block(w: _BitWriter, dc_diff: int) -> None:
    t, mag = _mag_bits(dc_diff)
    code, length = DC_ENC[t]
    w.write(code, length)
    if t:
        w.write(mag, t)
    code, length = AC_ENC[0x00]  # EOB
    w.write(code, length)


def test_decode_hand_built_dc_only_matches_analytic_pixels():
    """A JPEG built byte-by-byte in the test (NOT via encode_jpeg): one
    8x8 grayscale block, flat quant table q=8, DC coefficient 16 — the
    IDCT of a DC-only block is uniform dc*q/8, so every decoded pixel
    must be exactly 16*8/8 + 128 = 144."""
    w = _BitWriter()
    _write_dc_only_block(w, 16)
    scan = w.flush()
    data = (b"\xff\xd8" + _dqt_flat(8) + _seg(
        0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _dht_luma()
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan + b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 3)
    assert np.all(out == 144)


def test_decode_dc_prediction_across_blocks():
    """DC is differentially coded: two blocks with diffs (+16, -8) must
    decode to uniform values 144 and 136 (q=8)."""
    w = _BitWriter()
    _write_dc_only_block(w, 16)
    _write_dc_only_block(w, -8)
    data = (b"\xff\xd8" + _dqt_flat(8) + _seg(
        0xC0, bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0]))
        + _dht_luma()
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + w.flush() + b"\xff\xd9")
    out = decode_jpeg(data)
    assert np.all(out[:, :8] == 144) and np.all(out[:, 8:] == 136)


def test_decode_restart_interval_resets_dc_predictor():
    """With DRI=1 and an RST0 between two MCUs, the second block's DC
    diff is against 0 again, and the bit stream re-aligns at the byte
    boundary — both uniform 144 (same diff, +16, twice)."""
    w1 = _BitWriter()
    _write_dc_only_block(w1, 16)
    w2 = _BitWriter()
    _write_dc_only_block(w2, 16)
    data = (b"\xff\xd8" + _dqt_flat(8) + _seg(0xDD, (1).to_bytes(2, "big"))
            + _seg(0xC0, bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0]))
            + _dht_luma()
            + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + w1.flush() + b"\xff\xd0" + w2.flush() + b"\xff\xd9")
    out = decode_jpeg(data)
    assert np.all(out == 144)


def test_decode_420_subsampled_color():
    """Hand-built 16x16 4:2:0 JPEG (one MCU: 4 Y + 1 Cb + 1 Cr DC-only
    blocks) decodes to the analytically-converted flat RGB."""
    # Y=144 (dc 16), Cb=136 (dc 8), Cr=120 (dc -8), all q=8
    w = _BitWriter()
    for diff in (16, 0, 0, 0):  # 4 luma blocks, differential DC
        _write_dc_only_block(w, diff)
    _write_dc_only_block(w, 8)    # Cb
    _write_dc_only_block(w, -8)   # Cr
    sof = bytes([8, 0, 16, 0, 16, 3,
                 1, 0x22, 0,   # Y: h=2 v=2
                 2, 0x11, 0,   # Cb
                 3, 0x11, 0])  # Cr
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    data = (b"\xff\xd8" + _dqt_flat(8) + _seg(0xC0, sof) + _dht_luma()
            + _seg(0xDA, sos) + w.flush() + b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    y, cb, cr = 144.0, 136.0, 120.0
    want = np.clip(np.round([
        y + 1.402 * (cr - 128.0),
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
        y + 1.772 * (cb - 128.0),
    ]), 0, 255).astype(np.uint8)
    assert np.all(out == want.reshape(1, 1, 3))


@pytest.mark.parametrize("quality,tol", [(95, 4), (75, 10)])
def test_roundtrip_smooth_image(quality, tol):
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([np.clip(xx * 3, 0, 255), np.clip(yy * 4, 0, 255),
                    np.clip(xx + yy, 0, 255)], -1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol


def test_roundtrip_odd_dimensions_and_grayscale():
    yy, xx = np.mgrid[0:37, 0:51]
    img = np.stack([np.clip(xx * 4, 0, 255)] * 3, -1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (37, 51, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
    g = np.clip(yy * 5, 0, 255).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=95))
    assert dg.shape == (37, 51, 3)
    assert np.array_equal(dg[..., 0], dg[..., 1])
    assert np.abs(dg[..., 0].astype(int) - g.astype(int)).max() <= 1


def test_roundtrip_property_random_smooth_fields():
    """Random low-frequency fields (hypothesis-style seeds, deterministic)
    survive encode→decode within a quantization-scaled tolerance."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        h = int(rng.integers(8, 49))
        w = int(rng.integers(8, 49))
        base = rng.integers(0, 256, size=(3, 3, 3))
        # bilinear-upsampled 3x3 grid → smooth field
        img = np.clip(np.array([
            np.round(_bilinear(base[..., c], h, w)) for c in range(3)
        ]).transpose(1, 2, 0), 0, 255).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def _bilinear(grid, h, w):
    gy = np.linspace(0, grid.shape[0] - 1, h)
    gx = np.linspace(0, grid.shape[1] - 1, w)
    y0 = np.floor(gy).astype(int)
    x0 = np.floor(gx).astype(int)
    y1 = np.minimum(y0 + 1, grid.shape[0] - 1)
    x1 = np.minimum(x0 + 1, grid.shape[1] - 1)
    fy = (gy - y0)[:, None]
    fx = (gx - x0)[None, :]
    g = grid.astype(float)
    return ((g[y0][:, x0] * (1 - fy) + g[y1][:, x0] * fy) * (1 - fx)
            + (g[y0][:, x1] * (1 - fy) + g[y1][:, x1] * fy) * fx)


def test_malformed_inputs_raise_valueerror():
    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    good = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(good[:20])  # truncated before scan
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4])  # truncated scan (no EOI/marker)
    # progressive SOF2 is explicitly unsupported, not silently wrong
    prog = bytearray(good)
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))


def test_fuzz_mutations_never_raise_foreign_exceptions():
    from hypothesis import given, settings, strategies as st

    yy, xx = np.mgrid[0:24, 0:24]
    base = encode_jpeg(
        np.stack([np.clip(xx * 9, 0, 255)] * 3, -1).astype(np.uint8), 85)

    @settings(max_examples=120, deadline=None)
    @given(start=st.integers(0, len(base) - 1),
           payload=st.binary(min_size=1, max_size=16),
           truncate=st.integers(8, len(base)))
    def run(start, payload, truncate):
        mutated = (base[:start] + payload + base[start + len(payload):])[:truncate]
        try:
            out = decode_jpeg(mutated)
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass

    run()


def test_media_features_route_jpeg_payload(spark):
    """decode_media_batch(real_codecs=True) sniffs JPEG payloads in the
    image branch and computes features over DECODED pixels: a solid
    137-gray JPEG must yield byte_mean exactly 137.0 and n_bytes =
    H*W*3 (independent of the compressed size)."""
    from high_performance_docling_spark.operators.multimodal import (
        decode_media_batch,
    )

    payload = encode_jpeg(np.full((16, 24, 3), 137, dtype=np.uint8), 95)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), {"n_frames": 0})],
        "media_id long, media_type string, payload binary, meta map<string,int>",
    )
    row = decode_media_batch(df, real_codecs=True).collect()[0]
    assert row["n_bytes"] == 16 * 24 * 3
    assert row["byte_mean"] == 137.0
    assert row["byte_entropy"] == 0.0
