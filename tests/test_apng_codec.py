"""APNG video codec round-trip + real-video feature path (closes the
video half of the multimodal codec seam; foreign containers keep the
ffmpeg NotImplementedError seam)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from high_performance_docling_spark.kernels.apng_codec import (
    decode_apng,
    encode_apng,
)
from high_performance_docling_spark.kernels.png_codec import (
    decode_png,
    encode_png,
)


def _frames(n, h=24, w=32, seed=0, rgb=False):
    rng = np.random.default_rng(seed)
    shape = (n, h, w, 3) if rgb else (n, h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def test_roundtrip_grey():
    fr = _frames(7)
    out, dd = decode_apng(encode_apng(fr, delay_den=25))
    assert dd == 25 and out.shape == fr.shape
    assert np.array_equal(out, fr)


def test_roundtrip_rgb_and_single_frame():
    fr = _frames(1, rgb=True)
    out, _ = decode_apng(encode_apng(fr))
    assert out.shape == fr.shape and np.array_equal(out, fr)


def test_encode_deterministic():
    fr = _frames(3, seed=5)
    assert encode_apng(fr) == encode_apng(fr)


def test_rejects_plain_png_and_garbage():
    png = encode_png(_frames(1)[0])
    with pytest.raises(ValueError):  # no acTL → not an animation
        decode_apng(png)
    with pytest.raises(ValueError):
        decode_apng(b"\x89PNG\r\n\x1a\nnot really")
    with pytest.raises(ValueError):
        decode_apng(b"RIFF....WAVE")
    # still-image codec is unaffected by the shared unfilter refactor
    img = _frames(1, h=9, w=13)[0]
    assert np.array_equal(decode_png(png), _frames(1)[0])
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_corrupt_crc_rejected():
    data = bytearray(encode_apng(_frames(2)))
    # flip a byte inside the first fdAT payload region
    idx = bytes(data).find(b"fdAT") + 8
    data[idx] ^= 0xFF
    with pytest.raises(ValueError):
        decode_apng(bytes(data))


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 12),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    rgb=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(n, h, w, rgb, seed):
    fr = _frames(n, h=h, w=w, seed=seed, rgb=rgb)
    out, _ = decode_apng(encode_apng(fr))
    assert np.array_equal(out, fr)


def test_video_features_over_real_apng_bytes(spark):
    """synth_apng_media emits real APNG payloads; the real-codec feature
    path decodes them — n_bytes equals the decoded pixel count and
    frame_indexes samples the DECODED frame count."""
    from high_performance_docling_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(2,), (5,), (92,)], ["doc_id"])
    media = MM.synth_apng_media(docs)
    rows = {r["media_id"]: r for r in
            MM.decode_media_batch(media, real_codecs=True).collect()}
    for did, row in rows.items():
        n = did % 90 + 10
        assert row["media_type"] == "video"
        assert row["n_bytes"] == n * 24 * 32
        assert row["frame_indexes"] == ",".join(
            str(i) for i in range(0, n, 10))
    # and the payloads decode to the exact generative frames
    for r in media.collect():
        did = r["media_id"]
        n = did % 90 + 10
        yy, xx = np.mgrid[0:24, 0:32]
        want = np.stack([
            ((xx * 3 + yy * 7 + did + 11 * f) % 251).astype(np.uint8)
            for f in range(n)
        ])
        got, _ = decode_apng(bytes(r["payload"]))
        assert np.array_equal(got, want)


def test_foreign_video_container_keeps_ffmpeg_seam(spark):
    """Non-APNG video payloads still surface NotImplementedError — the
    documented production ffmpeg seam."""
    from high_performance_docling_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(2, "alpha"), (5, "beta")],
                                 ["doc_id", "text"])
    video = MM.synth_media(docs).filter("media_type = 'video'")
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        MM.decode_media_batch(video, real_codecs=True).collect()
