"""Real media codecs implementable with stdlib + numpy only.

Two genuinely standard formats get full encode/decode here — no external
codec libraries required:

  - PPM (P6, Netpbm binary RGB): the classic uncompressed image
    interchange format; header is ASCII (magic, width, height, maxval,
    ``#`` comments allowed), payload is raw ``H*W*3`` bytes.
  - WAV (RIFF, 16-bit PCM mono): encoded/decoded through the stdlib
    ``wave`` module; samples are little-endian int16.

These make the multimodal pipeline's decode step REAL for the formats a
container without PIL/ffmpeg can still handle; compressed formats
(JPEG/PNG/MP4/Opus) stay behind the gated NotImplementedError in
operators/multimodal.py with the same call shape, so swapping in a real
library is a one-function change.

Reference parity note: the reference engine has no media path at all —
this is part of the "beyond the reference" training-data surface
(COVERAGE.md, last section).
"""

from __future__ import annotations

import io
import wave

import numpy as np

# ------------------------------------------------------------------ PPM


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an ``(H, W, 3) uint8`` array as a binary PPM (P6) image."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got shape {pixels.shape}")
    if pixels.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {pixels.dtype}")
    h, w, _ = pixels.shape
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + pixels.tobytes()


def _read_ppm_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Read one whitespace-delimited header token, skipping ``#`` comments
    (which run to end-of-line, per the Netpbm spec)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < n and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace() and buf[pos : pos + 1] != b"#":
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) image to an ``(H, W, 3) uint8`` array.

    Handles arbitrary header whitespace and ``#`` comments; only
    maxval=255 (single-byte samples) is supported, matching the common
    case and keeping the sample layout unambiguous.
    """
    magic, pos = _read_ppm_token(payload, 0)
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (P6) image: magic={magic!r}")
    w_tok, pos = _read_ppm_token(payload, pos)
    h_tok, pos = _read_ppm_token(payload, pos)
    max_tok, pos = _read_ppm_token(payload, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(max_tok)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    pos += 1  # exactly one whitespace byte separates header from raster
    need = h * w * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"truncated PPM raster: need {need}, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode an int16 sample array as a mono 16-bit PCM WAV file."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit PCM WAV file to ``(rate, int16 array)``."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
            raise ValueError(
                f"only mono 16-bit PCM supported, got channels="
                f"{wf.getnchannels()} width={wf.getsampwidth()}"
            )
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return rate, np.frombuffer(frames, dtype=np.int16)
