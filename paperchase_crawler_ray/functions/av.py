"""Stdlib-only audio/video codecs for the multimodal stages.

Audio is RIFF/WAVE PCM via the stdlib ``wave`` module (8/16/32-bit,
any channel count) — pure public format, zero new dependencies.

Video is motion-JPEG: a plain concatenation of baseline JFIF frames,
decoded by the engine's own baseline-JPEG codec (``functions/jpeg.py``).
Frame boundaries are recovered by scanning SOI/EOI marker pairs — valid
for baseline JPEG because entropy-coded data byte-stuffs FF as FF00
(and restart markers are FFD0-D7), so the FFD9 EOI byte pair cannot
occur inside a scan.
"""

from __future__ import annotations

import io
import wave

import numpy as np

from .codec import UnsupportedFormatError
from .jpeg import jpeg_decode, jpeg_encode

__all__ = ["wav_encode", "wav_decode", "mjpeg_encode", "mjpeg_split",
           "sniff_av_format"]

_SOI = b"\xff\xd8"
_EOI = b"\xff\xd9"


def sniff_av_format(data: bytes) -> str:
    """'wav' / 'mjpeg' / '' by magic bytes."""
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:2] == _SOI:
        return "mjpeg"
    return ""


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, ch) float in [-1, 1] (or int16) -> 16-bit PCM WAV."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype != np.int16:
        s = np.clip(np.round(s.astype(np.float64) * 32767.0),
                    -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.ascontiguousarray(s, "<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 samples (n, ch) in [-1, 1], sample_rate).

    8-bit PCM is unsigned (centered at 128), 16/32-bit signed
    little-endian — the RIFF/WAVE spec's PCM layouts."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            ch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise UnsupportedFormatError(f"not a PCM WAV payload: {e}") from e
    if sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise UnsupportedFormatError(f"unsupported PCM sample width {sw}")
    return x.reshape(-1, ch), rate


def mjpeg_encode(frames: list[np.ndarray], quality: int = 90) -> bytes:
    """Concatenate baseline-JPEG-encoded frames into an MJPEG stream."""
    return b"".join(jpeg_encode(f, quality=quality) for f in frames)


def mjpeg_split(data: bytes) -> list[bytes]:
    """Split an MJPEG stream into per-frame JPEG byte spans (no pixel
    decode — marker scan only, so sampling skips unsampled frames for
    free)."""
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_SOI, pos)
        if start < 0:
            break
        end = data.find(_EOI, start + 2)
        if end < 0:
            raise UnsupportedFormatError(
                "truncated MJPEG stream: SOI without EOI")
        frames.append(data[start:end + 2])
        pos = end + 2
    if not frames:
        raise UnsupportedFormatError("no JPEG frames in payload")
    return frames


def mjpeg_decode_frame(frame: bytes) -> np.ndarray:
    """Decode one frame via the engine's own baseline-JPEG codec."""
    return jpeg_decode(frame)
