"""Pure-Python APNG (animated PNG) codec — the video half of the
multimodal codec seam, closed the same way png_codec.py closed stills.

APNG is the public animated-PNG extension (W3C PNG 3rd edition §4 /
the Mozilla APNG spec): an ``acTL`` animation-control chunk, one
``fcTL`` frame-control chunk per frame, and ``fdAT`` frame-data chunks
that carry the same filtered-scanline zlib streams as IDAT prefixed by a
sequence number. This module implements the subset the engine needs for
real, portable video bytes: full-frame updates (x/y offset 0, frame size
== canvas), dispose_op 0 (none), blend_op 0 (source), 8-bit grey or RGB,
non-interlaced. The ENCODER emits filter-0 scanlines with a fixed zlib
level so bytes are deterministic; the DECODER reuses png_codec's
five-filter unfilter routine, so externally produced APNGs of this
shape decode too.

Real-world video containers (H.264/VP9/AV1 in mp4/webm) still require
ffmpeg — ``decode_media_batch`` keeps its NotImplementedError seam for
payloads that are not APNG.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .png_codec import _SIGNATURE, _chunk, _unfilter


def encode_apng(frames: np.ndarray, delay_den: int = 30) -> bytes:
    """uint8 array (N,H,W) grey or (N,H,W,3) RGB → APNG bytes.

    Frame 0 rides the default-image IDAT (its fcTL precedes IDAT, so the
    default image IS the first animation frame); frames 1.. are
    fcTL+fdAT pairs. Deterministic: filter-0 scanlines, zlib level 6,
    delay 1/delay_den per frame.
    """
    arr = np.ascontiguousarray(frames)
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_apng needs uint8, got {arr.dtype}")
    if arr.ndim == 3:
        color_type, channels = 0, 1
    elif arr.ndim == 4 and arr.shape[3] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    n, h, w = arr.shape[:3]
    if n < 1:
        raise ValueError("need at least one frame")

    def scanlines(img: np.ndarray) -> bytes:
        flat = img.reshape(h, w * channels)
        raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = flat
        return zlib.compress(raw.tobytes(), 6)

    def fctl(seq: int) -> bytes:
        return _chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, 1, delay_den, 0, 0),
        )

    out = _SIGNATURE
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", n, 0))  # loop forever
    seq = 0
    out += fctl(seq)
    seq += 1
    out += _chunk(b"IDAT", scanlines(arr[0]))
    for f in range(1, n):
        out += fctl(seq)
        seq += 1
        out += _chunk(b"fdAT", struct.pack(">I", seq) + scanlines(arr[f]))
        seq += 1
    out += _chunk(b"IEND", b"")
    return out


def decode_apng(data: bytes) -> tuple[np.ndarray, int]:
    """APNG bytes → (uint8 frames (N,H,W) grey / (N,H,W,3) RGB,
    delay_den). Raises ValueError on non-APNG input (including plain
    single-image PNGs — no acTL), CRC errors, or out-of-subset features
    (partial-frame updates, blend_op OVER, non-8-bit)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, actl = 8, None, None
    delay_den = 0
    # streams[i] = concatenated zlib payload of animation frame i
    streams: list[bytes] = []
    have_fctl_before_idat = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"acTL":
            actl = struct.unpack(">II", body)
        elif tag == b"fcTL":
            (_seq, fw, fh, xo, yo, _dn, dd, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", body
            )
            if ihdr is None:
                raise ValueError("fcTL before IHDR")
            if (fw, fh, xo, yo) != (ihdr[0], ihdr[1], 0, 0) or blend != 0:
                raise ValueError(
                    "unsupported APNG feature (partial frame / blend OVER)"
                )
            delay_den = dd
            if not streams:
                have_fctl_before_idat = True
            streams.append(b"")
        elif tag == b"IDAT":
            if not have_fctl_before_idat:
                # default image is NOT part of the animation — out of
                # this subset (encoder always animates frame 0)
                raise ValueError("IDAT outside the animation (no leading fcTL)")
            streams[0] += body
        elif tag == b"fdAT":
            if len(body) < 4 or not streams:
                raise ValueError("malformed fdAT")
            streams[-1] += body[4:]  # skip sequence number
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or actl is None:
        raise ValueError("not an APNG (missing IHDR/acTL)")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported APNG: depth={depth} color={color_type} "
            f"interlace={interlace}"
        )
    if len(streams) != actl[0]:
        raise ValueError(
            f"frame count mismatch: acTL says {actl[0]}, found {len(streams)}"
        )
    channels = 1 if color_type == 0 else 3
    stride = w * channels
    frames = []
    for s in streams:
        try:
            raw = np.frombuffer(zlib.decompress(s), dtype=np.uint8)
        except zlib.error as e:
            raise ValueError(f"corrupt frame stream: {e}") from e
        if raw.size != h * (1 + stride):
            raise ValueError("frame data size mismatch")
        img = _unfilter(raw.reshape(h, 1 + stride), h, stride, channels)
        frames.append(img.reshape(h, w, channels))
    out = np.stack(frames)
    return (out[:, :, :, 0] if channels == 1 else out), delay_den
