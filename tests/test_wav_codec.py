"""WAV codec round-trip + audio feature path over REAL WAV bytes
(VERDICT r4 #6: close the audio half of the multimodal codec seam)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from high_performance_docling_spark.kernels.wav_codec import (
    decode_wav,
    encode_wav,
)


def test_roundtrip_mono():
    rng = np.random.default_rng(7)
    pcm = rng.integers(-32768, 32768, size=1234, dtype=np.int16)
    out, sr = decode_wav(encode_wav(pcm, 16000))
    assert sr == 16000
    assert out.dtype == np.int16 and out.shape == (1234,)
    assert np.array_equal(out, pcm)


def test_roundtrip_stereo():
    rng = np.random.default_rng(8)
    pcm = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    out, sr = decode_wav(encode_wav(pcm, 44100))
    assert sr == 44100 and out.shape == (500, 2)
    assert np.array_equal(out, pcm)


def test_encode_is_deterministic_and_riff():
    pcm = np.arange(-100, 100, dtype=np.int16)
    a, b = encode_wav(pcm, 8000), encode_wav(pcm, 8000)
    assert a == b
    assert a[:4] == b"RIFF" and a[8:12] == b"WAVE"


def test_rejects_garbage_and_wrong_dtype():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    with pytest.raises(ValueError):
        encode_wav(np.zeros(4, dtype=np.float32), 8000)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(0, 400),
    sr=st.sampled_from([8000, 16000, 44100]),
    ch=st.integers(1, 4),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(n, sr, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (n,) if ch == 1 else (n, ch)
    pcm = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
    out, got_sr = decode_wav(encode_wav(pcm, sr))
    assert got_sr == sr
    assert np.array_equal(np.atleast_1d(out).reshape(shape), pcm)


def test_audio_features_over_real_wav_bytes(spark):
    """synth_wav_media emits real RIFF bytes; audio_feature_batch's
    aggregates equal a direct NumPy computation from the formula —
    i.e. the feature path genuinely decodes the container."""
    from high_performance_docling_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(i,) for i in [0, 1, 2, 17, 399]],
                                 ["doc_id"])
    media = MM.synth_wav_media(docs)
    payloads = {r["media_id"]: bytes(r["payload"])
                for r in media.collect()}
    for did, payload in payloads.items():
        assert payload[:4] == b"RIFF"
        s, sr = decode_wav(payload)
        n = did % 400 + 160
        i = np.arange(n, dtype=np.int64)
        want = ((did * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
        assert sr == 8000 + (did % 3) * 4000
        assert np.array_equal(s, want)

    feats = {r["media_id"]: r for r in
             MM.audio_feature_batch(media).collect()}
    for did in payloads:
        n = did % 400 + 160
        i = np.arange(n, dtype=np.int64)
        s = (did * 7919 + i * 104729) % 65536 - 32768
        row = feats[did]
        assert row["n_samples"] == n
        assert row["sum_abs"] == int(np.abs(s).sum())
        assert row["sum_sq"] == int((s * s).sum())
        neg = s < 0
        assert row["zero_crossings"] == int((neg[:-1] != neg[1:]).sum())


def test_decode_media_batch_real_codec_audio(spark):
    """real_codecs=True now decodes audio payloads (byte stats over raw
    PCM bytes) — only video remains behind NotImplementedError."""
    from high_performance_docling_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(3,), (4,)], ["doc_id"])
    media = MM.synth_wav_media(docs)
    rows = {r["media_id"]: r for r in
            MM.decode_media_batch(media, real_codecs=True).collect()}
    for did, row in rows.items():
        n = did % 400 + 160
        assert row["n_bytes"] == 2 * n  # int16 LE sample bytes, not file bytes
