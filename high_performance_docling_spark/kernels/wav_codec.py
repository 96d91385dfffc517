"""Pure-stdlib WAV/PCM codec (``wave`` + numpy only — no ffmpeg in this
sandbox).

Closes the audio half of the multimodal codec seam the same way
png_codec.py closed images: real, portable RIFF/WAVE bytes in and out,
so the audio feature path operates on DECODED samples of an actual audio
container rather than opaque synthetic bytes. Scope is 16-bit
little-endian integer PCM (the canonical WAV payload), mono or
interleaved multi-channel, via the stdlib ``wave`` module over BytesIO —
the encoder's 44-byte canonical header + raw frames are deterministic
across runs and hosts.

Out of scope (raise ValueError): float/8-bit/24-bit PCM, compressed
codecs (ADPCM/mp3-in-RIFF), and video — the remaining
``decode_media_batch`` NotImplementedError seam.

Reference analogue: the reference's media handling is image-only (figure
crops, document_assembler.py:62-90); audio is part of this engine's
training-data-pipeline extension surface.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array, shape (n,) mono or (n, ch) interleaved → WAV bytes.

    Deterministic: stdlib ``wave`` emits the canonical 44-byte header
    (RIFF/fmt/data) followed by the little-endian frames.
    """
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {arr.dtype}")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, ch), got {arr.shape}")
    if not 1 <= arr.shape[1] <= 16:
        raise ValueError(f"unreasonable channel count {arr.shape[1]}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.ascontiguousarray(arr.astype("<i2")).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples shape (n,) mono / (n, ch) multi,
    sample_rate). Raises ValueError on non-WAV input or unsupported PCM
    width (only 16-bit integer PCM is in scope)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a readable WAV file: {e}") from e
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got sampwidth={width}")
    arr = np.frombuffer(frames, dtype="<i2")
    if n_ch > 1:
        arr = arr.reshape(-1, n_ch)
    return arr, rate
