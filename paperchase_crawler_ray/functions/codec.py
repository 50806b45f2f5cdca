"""Image codecs (SURVEY.md M8/M9) — stdlib/numpy-only PNG / BMP / RAW /
baseline JPEG, plus PSNR.

The sandbox has no Pillow and no network, so the engine carries its own
codecs: PNG (zlib + filter reconstruction), 24-bit BMP, a trivial RAW
container, and a pure-numpy baseline JPEG (``functions/jpeg.py``) — the
lossy path behind the BASELINE PSNR>=40dB per-row invariant. Using our
own JPEG on both encode and decode keeps goldens deterministic across
environments (no libjpeg version drift).

All images are RGB uint8 arrays of shape (h, w, 3). These functions are
pure (no Ray) and shared by the distributed stages, the fixture generator
and the oracle crawler, so goldens are consistent by construction.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - Pillow absent in the sandbox
    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _PILImage = None
    _HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_RAW_MAGIC = b"PRW0"


class UnsupportedFormatError(ValueError):
    pass


# --------------------------------------------------------------------------
# format sniffing (M8)
# --------------------------------------------------------------------------

def sniff_format(data: bytes) -> str:
    """Magic-byte detection -> 'png' | 'bmp' | 'jpeg' | 'gif' | 'raw' | ''."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if data.startswith(b"GIF87a") or data.startswith(b"GIF89a"):
        return "gif"
    if data.startswith(_RAW_MAGIC):
        return "raw"
    return ""


# --------------------------------------------------------------------------
# RAW container: magic + <II (w, h) little-endian + RGB bytes
# --------------------------------------------------------------------------

def raw_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return _RAW_MAGIC + struct.pack("<II", w, h) + np.ascontiguousarray(img, np.uint8).tobytes()


def raw_decode(data: bytes) -> np.ndarray:
    if not data.startswith(_RAW_MAGIC):
        raise UnsupportedFormatError("not a RAW container")
    w, h = struct.unpack_from("<II", data, 4)
    arr = np.frombuffer(data, np.uint8, count=w * h * 3, offset=12)
    return arr.reshape(h, w, 3).copy()


# --------------------------------------------------------------------------
# PNG (8-bit, color types 0=gray / 2=RGB / 6=RGBA; filters 0-4)
# --------------------------------------------------------------------------

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(img: np.ndarray, level: int = 1) -> bytes:
    """Encode an RGB uint8 image as PNG (filter type 0 per scanline).

    Default deflate level 1: PNG is lossless at every level, so the
    only trade is CPU vs payload size — and at crawl scale the encode
    sits on the hot fetch/decode path (level 6 was ~4x the compress
    CPU for ~10% smaller noisy-fixture payloads). Callers that archive
    cold data can pass level=6+."""
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    body = np.ascontiguousarray(img, np.uint8)
    # prepend filter byte 0 to each scanline, vectorized
    scan = np.zeros((h, 1 + w * 3), np.uint8)
    scan[:, 1:] = body.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), level)
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def _png_wavefront(C: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Exact vectorized PNG filter reconstruction over all 5 filter
    types: C is (h, w_px, bpp) filtered bytes, filters the per-row
    codes. Cells are computed along anti-diagonals (pixel coords), each
    step a masked numpy formula over the diagonal's rows — sequential
    only in (h + w) wavefront steps."""
    h, w, bpp = C.shape
    O = np.zeros((h, w, bpp), np.uint8)
    Ci = C.astype(np.int16)
    for d in range(h + w - 1):
        ys = np.arange(max(0, d - w + 1), min(h, d + 1))
        js = d - ys
        has_left = (js > 0)[:, None]
        has_up = (ys > 0)[:, None]
        left = np.where(has_left, O[ys, np.maximum(js - 1, 0)],
                        0).astype(np.int16)
        up = np.where(has_up, O[np.maximum(ys - 1, 0), js],
                      0).astype(np.int16)
        ul = np.where(has_left & has_up,
                      O[np.maximum(ys - 1, 0), np.maximum(js - 1, 0)],
                      0).astype(np.int16)
        p = left + up - ul
        pa_, pb_, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        paeth = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                         np.where(pb_ <= pc_, up, ul))
        f = filters[ys][:, None]
        pred = np.select([f == 1, f == 2, f == 3, f == 4],
                         [left, up, (left + up) >> 1, paeth], 0)
        O[ys, js] = ((Ci[ys, js] + pred) & 0xFF).astype(np.uint8)
    return O


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to an RGB uint8 array (gray/RGBA converted)."""
    if not data.startswith(_PNG_SIG):
        raise UnsupportedFormatError("not a PNG")
    pos, n = 8, len(data)
    w = h = None
    color = bit = interlace = 0
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None or bit != 8 or interlace != 0:
        raise UnsupportedFormatError("unsupported PNG variant")
    nch = {0: 1, 2: 3, 6: 4}.get(color)
    if nch is None:
        raise UnsupportedFormatError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise UnsupportedFormatError("corrupt PNG data")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    if not filters.any():
        # fast path: every scanline filter is 0/None (what png_encode
        # emits) — one vectorized slice instead of a per-row loop
        img = np.ascontiguousarray(rows[:, 1:]).reshape(h, w, nch)
        if nch == 1:
            img = np.repeat(img, 3, axis=2)
        elif nch == 4:
            img = img[:, :, :3].copy()
        return img
    if filters.max() > 4:
        raise UnsupportedFormatError(f"bad PNG filter {int(filters.max())}")
    bpp = nch
    if filters.max() <= 2:
        # per-row vectorized path: None/Sub/Up have no left+up coupling
        out = np.zeros((h, stride), np.uint8)
        for y in range(h):
            ft = filters[y]
            cur = rows[y, 1:]
            if ft == 0:
                out[y] = cur
            elif ft == 1:  # Sub: channel-wise prefix sum mod 256
                out[y] = (np.cumsum(cur.reshape(-1, bpp), axis=0,
                                    dtype=np.uint64) & 0xFF) \
                    .astype(np.uint8).reshape(stride)
            else:          # Up: uint8 wraps mod 256, which is the spec
                out[y] = cur + (out[y - 1] if y > 0
                                else np.zeros(stride, np.uint8))
        img = out.reshape(h, w, nch)
    else:
        # Average/Paeth present: EXACT anti-diagonal wavefront. A cell
        # (row y, pixel j) depends only on (y, j-1), (y-1, j) and
        # (y-1, j-1), so every anti-diagonal y+j=d computes at once —
        # h+w-1 vectorized numpy steps instead of h*w Python-int steps
        # (the last per-pixel loop on the payload path, VERDICT r2 #6).
        img = _png_wavefront(rows[:, 1:].reshape(h, w, bpp), filters)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    elif nch == 4:
        img = img[:, :, :3].copy()
    return img


# --------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB, bottom-up)
# --------------------------------------------------------------------------

def bmp_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    pad = (4 - (w * 3) % 4) % 4
    rowbytes = w * 3 + pad
    datasize = rowbytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + datasize, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, datasize, 2835, 2835, 0, 0)
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], np.uint8)  # bottom-up, BGR
    rows = np.zeros((h, rowbytes), np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    if not data.startswith(b"BM"):
        raise UnsupportedFormatError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h_raw, _planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise UnsupportedFormatError("unsupported BMP variant")
    flip = h_raw > 0
    h = abs(h_raw)
    pad = (4 - (w * 3) % 4) % 4
    rowbytes = w * 3 + pad
    rows = np.frombuffer(data, np.uint8, count=rowbytes * h, offset=offset).reshape(h, rowbytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    img = bgr[:, :, ::-1]
    if flip:
        img = img[::-1]
    return img.copy()


# --------------------------------------------------------------------------
# dispatch + PSNR
# --------------------------------------------------------------------------

# JPEG default quality: 98 keeps the encode->decode roundtrip above the
# BASELINE 40 dB PSNR bound even on the noisiest fixture pixels (noise is
# JPEG's worst case; smooth content sits at ~50 dB) — see
# tests/test_codec_phash.py::test_jpeg_roundtrip_psnr.
JPEG_QUALITY = 98


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "bmp":
        return bmp_encode(img)
    if fmt == "raw":
        return raw_encode(img)
    if fmt == "jpeg":
        from .jpeg import JpegFormatError, jpeg_encode

        try:
            return jpeg_encode(img, JPEG_QUALITY)
        except JpegFormatError as e:
            raise UnsupportedFormatError(str(e)) from e
    raise UnsupportedFormatError(f"cannot encode fmt={fmt!r}")


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    fmt = fmt or sniff_format(data)
    if fmt == "png":
        return png_decode(data)
    if fmt == "bmp":
        return bmp_decode(data)
    if fmt == "raw":
        return raw_decode(data)
    if fmt == "jpeg":
        from .jpeg import JpegFormatError, jpeg_decode

        try:
            return jpeg_decode(data)
        except JpegFormatError as e:
            raise UnsupportedFormatError(str(e)) from e
    raise UnsupportedFormatError(f"cannot decode fmt={fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))
