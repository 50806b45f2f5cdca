"""Baseline JPEG (JFIF) encoder / decoder in pure numpy — the lossy
path of SURVEY.md M9 and the BASELINE.json PSNR>=40dB per-row invariant,
with no Pillow in the sandbox.

Scope (documented, checked, raised on violation):
  * baseline sequential DCT, 8-bit, 3 components, 4:4:4 (no chroma
    subsampling) — what the encoder emits and the decoder accepts;
    progressive / subsampled streams raise ``UnsupportedFormatError``
    so the caller's format gate can skip them.
  * quantization: Annex K example tables scaled by the libjpeg quality
    convention (public knowledge).
  * entropy coding: canonical Huffman tables DECLARED IN THE STREAM
    (DHT) and parsed back on decode, so files are self-describing and
    standard-decodable. The encoder's tables are flat-length canonical
    codes (12 DC symbols x 4 bits, 162 AC symbols x 8 bits): a valid
    prefix code covering every (run, size) baseline symbol, chosen for
    implementation clarity over bitrate — entropy coding is lossless,
    so PSNR is identical to the Annex K optimized tables.

Everything block-parallel is vectorized (color transform, level shift,
DCT/IDCT as batched matmul contractions against the orthonormal basis,
quantization, zigzag). The entropy coder is vectorized too: the encoder
derives every (codeword, bitlength) field of the scan as numpy arrays
(DC diffs by component stride, AC run-lengths from np.nonzero gaps,
ZRL/EOB by mask) ordered by a per-block sort key, then bit-packs with
np.packbits and byte-stuffs with a cumsum scatter; the decoder
byte-unstuffs vectorized and walks a 16-bit sliding-window Huffman LUT
so each symbol costs O(1) list indexing rather than a per-length dict
probe.

Spec references: ITU-T T.81 (JPEG), JFIF 1.02 — public documents.
"""

from __future__ import annotations

import struct
from functools import lru_cache as _lru_cache

import numpy as np

__all__ = ["jpeg_encode", "jpeg_decode", "JpegFormatError"]


class JpegFormatError(ValueError):
    pass


# --------------------------------------------------------------------------
# constants: zigzag, quant tables, DCT basis
# --------------------------------------------------------------------------

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.float64)

_QCHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.float64)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    out = []
    for base in (_QLUM, _QCHROM):
        t = np.floor((base * scale + 50.0) / 100.0)
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _dct_basis() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.full(8, 0.5)
    c[0] = np.sqrt(1.0 / 8.0)
    return c[:, None] * np.cos((2 * x + 1) * u * np.pi / 16.0)


_C = _dct_basis()          # orthonormal: JPEG FDCT == _C @ b @ _C.T


# --------------------------------------------------------------------------
# Huffman tables (flat-length canonical; see module docstring)
# --------------------------------------------------------------------------

def _flat_table(symbols: list[int], length: int):
    """BITS/HUFFVAL spec + symbol->(code, len) map for a canonical code
    assigning every symbol the same ``length``."""
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {s: (i, length) for i, s in enumerate(symbols)}
    return bits, symbols, codes


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]

_DC_BITS, _DC_VALS, _DC_CODES = _flat_table(_DC_SYMBOLS, 4)
_AC_BITS, _AC_VALS, _AC_CODES = _flat_table(_AC_SYMBOLS, 8)


def _canonical_lut(bits: tuple[int, ...], vals: tuple[int, ...]
                   ) -> tuple[list, list]:
    """DHT (BITS, HUFFVAL) -> 16-bit-window lookup tables per T.81 C.2.

    ``sym[w]``/``ln[w]`` give the decoded symbol and its code length for
    any 16-bit stream window ``w`` whose prefix is a valid code;
    ``ln[w] == 0`` marks an invalid prefix. Python lists: the decode
    loop indexes them per symbol, and list indexing is the fastest O(1)
    lookup available without C extensions. Cached — every stream from
    our own encoder declares the same two tables, and building the 64K
    LUT would otherwise dominate small-image decode.
    """
    return _canonical_lut_cached(tuple(bits), tuple(vals))


@_lru_cache(maxsize=32)
def _canonical_lut_cached(bits: tuple[int, ...], vals: tuple[int, ...]
                          ) -> tuple[list, list]:
    sym = np.zeros(1 << 16, np.int32)
    ln = np.zeros(1 << 16, np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    # positions 0/1 are the Python walk's list LUTs; 2/3 are the same
    # tables as contiguous numpy planes for the optional C kernel
    return (sym.tolist(), ln.tolist(),
            sym.astype(np.int16), ln.astype(np.uint8))


# --------------------------------------------------------------------------
# bit-level helpers (vectorized)
# --------------------------------------------------------------------------

_POW2 = np.left_shift(np.int64(1), np.arange(16, dtype=np.int64))


def _bit_sizes(mag: np.ndarray) -> np.ndarray:
    """Vectorized T.81 magnitude category: bit_length of |v| (int64)."""
    return np.digitize(mag, _POW2)


def _pack_fields(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate variable-length bit fields (MSB-first), pad with 1s
    to a byte boundary per T.81 F.1.2.3, and byte-stuff 0xFF -> FF 00.

    Byte-granular scatter (no per-BIT temporaries): each field
    (len <= 16, start-bit offset <= 7) is left-aligned into a 40-bit
    window anchored at its first output byte, the window's five bytes
    accumulate with ``np.add.at`` — fields never share BITS, so
    byte-wise add IS bitwise or — and trailing pad bits of the final
    byte are forced to 1. ~3.5x the throughput of the per-bit
    expansion this replaces, O(5n) memory instead of O(total_bits)."""
    n = len(lens)
    if not n:
        return b""
    offs = np.cumsum(lens) - lens
    total = int(offs[-1] + lens[-1])
    nbytes = (total + 7) // 8
    sh = offs & 7
    w = codes.astype(np.int64) << (40 - lens - sh)
    byte0 = offs >> 3
    acc = np.zeros(nbytes + 5, np.int64)
    for j, shift in enumerate((32, 24, 16, 8, 0)):
        np.add.at(acc, byte0 + j, (w >> shift) & 0xFF)
    packed = acc[:nbytes].astype(np.uint8)
    pad = (-total) % 8
    if pad:
        packed[-1] |= (1 << pad) - 1
    counts = 1 + (packed == 0xFF).astype(np.int64)
    offs = np.cumsum(counts) - counts
    out = np.zeros(int(counts.sum()), np.uint8)  # gap bytes are the 0x00 stuffing
    out[offs] = packed
    return out.tobytes()


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane -> (nblocks, 8, 8), row-major MCU order."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)


def _encode_plane_coeffs(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    blocks = _to_blocks(plane) - 128.0
    coeffs = _C @ blocks @ _C.T   # batched BLAS matmul, same contraction
    quant = np.round(coeffs.reshape(-1, 64) / qtab[None, :]).astype(np.int64)
    return quant[:, _ZIGZAG]


def _encode_scan(coeffs: list[np.ndarray]) -> bytes:
    """Entropy-code interleaved 4:4:4 MCUs, fully vectorized.

    Every bit field of the scan (DC size symbol, DC amplitude, ZRL, AC
    run/size symbol, AC amplitude, EOB) becomes one row in flat
    (code, length, sortkey) arrays; a stable argsort by
    (block, position-in-block) recovers exact stream order. Uses the
    module's flat-length tables: DC codeword == size category (4 bits),
    AC codeword == index in _AC_SYMBOLS (8 bits).
    """
    nb = coeffs[0].shape[0]
    ncomp = len(coeffs)
    A = np.empty((nb * ncomp, 64), np.int64)
    for c in range(ncomp):
        A[c::ncomp] = coeffs[c]
    n = nb * ncomp

    from .cwalk import get_pack, run_pack
    pk = get_pack()
    if pk is not None:
        # compiled twin of the vectorized emission below — tests assert
        # byte-identical streams (same flat-length tables, same
        # padding/stuffing rules)
        return run_pack(pk, A, ncomp)

    # DC: differential by component (stride ncomp in scan order)
    dc = A[:, 0]
    diff = dc.copy()
    diff[ncomp:] = dc[ncomp:] - dc[:-ncomp]
    dsize = _bit_sizes(np.abs(diff))
    damp = np.where(diff >= 0, diff,
                    diff + np.left_shift(np.int64(1), dsize) - 1)

    # AC: run-lengths from gaps between nonzeros, per block
    ac = A[:, 1:]
    bi, ki = np.nonzero(ac)
    v = ac[bi, ki]
    if len(bi):
        first = np.empty(len(bi), bool)
        first[0] = True
        first[1:] = bi[1:] != bi[:-1]
        prev_k = np.empty_like(ki)
        prev_k[1:] = ki[:-1]
        prev_k[first] = -1
    else:
        prev_k = ki
    run = ki - prev_k - 1
    nzrl = run >> 4                          # ZRL count before this coeff (<=3)
    rem = run & 15
    asize = _bit_sizes(np.abs(v))
    acode = 2 + rem * 10 + (asize - 1)       # index of (rem<<4)|size in _AC_SYMBOLS
    aamp = np.where(v >= 0, v, v + np.left_shift(np.int64(1), asize) - 1)

    last_k = np.full(n, -1, np.int64)
    last_k[bi] = ki                          # row-major: last write == max ki
    eob_blocks = np.flatnonzero(last_k < 62)

    # field sort keys: block*1024 + local; local = 0/1 for DC sym/amp,
    # (ki+1)*8 + {0,1,2: ZRL, 3: sym, 4: amp} for AC, 65*8 for EOB.
    keys = [np.arange(n, dtype=np.int64) * 1024,
            np.flatnonzero(dsize > 0) * 1024 + 1]
    codes = [dsize, damp[dsize > 0]]
    lens = [np.full(n, 4, np.int64), dsize[dsize > 0]]
    for t in range(3):                       # run <= 62 -> at most 3 ZRLs
        zi = np.flatnonzero(nzrl > t)
        if len(zi):
            keys.append(bi[zi] * 1024 + (ki[zi] + 1) * 8 + t)
            codes.append(np.full(len(zi), 1, np.int64))   # ZRL index in _AC_SYMBOLS
            lens.append(np.full(len(zi), 8, np.int64))
    keys += [bi * 1024 + (ki + 1) * 8 + 3,
             bi * 1024 + (ki + 1) * 8 + 4,
             eob_blocks * 1024 + 65 * 8]
    codes += [acode, aamp, np.zeros(len(eob_blocks), np.int64)]  # EOB index 0
    lens += [np.full(len(bi), 8, np.int64), asize,
             np.full(len(eob_blocks), 8, np.int64)]

    key = np.concatenate(keys)
    code = np.concatenate(codes)
    ln = np.concatenate(lens)
    order = np.argsort(key, kind="stable")
    return _pack_fields(code[order], ln[order])


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(img: np.ndarray, quality: int = 90) -> bytes:
    """RGB uint8 (h, w, 3) -> baseline JFIF bytes (4:4:4)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise JpegFormatError("expected (h, w, 3) uint8")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise JpegFormatError("empty image")
    qlum, qchrom = _quality_tables(quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)

    coeffs = [_encode_plane_coeffs(ycc[..., c], qlum if c == 0 else qchrom)
              for c in range(3)]
    scan = _encode_scan(coeffs)

    out = bytearray()
    out += b"\xff\xd8"                                   # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)               # APP0
    for tid, tab in ((0, qlum), (1, qchrom)):            # DQT (zigzag per spec)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(x) for x in tab[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)   # SOF0
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])                    # 1x1 sampling
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    out += _dht_segment(0, 1, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 1, _AC_BITS, _AC_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)       # SOS
    for cid, tsel in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tsel])
    out += bytes([0, 63, 0])                             # Ss, Se, Ah/Al
    out += scan
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _entropy_segments(data: bytes, pos: int) -> list[np.ndarray]:
    """Entropy-coded bytes from ``pos``: strip FF00 stuffing, split at
    RSTn markers (DC predictors reset per segment), stop at the first
    real marker. All vectorized."""
    arr = np.frombuffer(data, np.uint8)[pos:]
    ff = np.flatnonzero(arr[:-1] == 0xFF)
    nxt = arr[ff + 1]
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    term = np.flatnonzero(~is_stuff & ~is_rst)
    end = int(ff[term[0]]) if len(term) else len(arr)
    bounds = [0]
    for p in ff[is_rst]:
        if p >= end:
            break
        bounds += [int(p), int(p) + 2]       # drop the 2-byte RST marker
    bounds.append(end)
    segs = []
    for a, b in zip(bounds[::2], bounds[1::2]):
        seg = arr[a:b]
        stuffed = np.flatnonzero((seg[:-1] == 0xFF) & (seg[1:] == 0x00)) + 1
        segs.append(np.delete(seg, stuffed) if len(stuffed) else seg)
    return segs


def _trips24(seg: np.ndarray) -> list:
    """Byte array -> per-BYTE 24-bit windows (a Python list for fast
    scalar indexing; 10 bytes of spec 1-padding so an amplitude read
    just beyond a truncated tail stays in bounds). The 16-bit window at
    BIT offset p is ``(trips[p >> 3] >> (8 - (p & 7))) & 0xFFFF`` —
    extracted lazily at the ~2 reads per symbol the Huffman walk
    actually performs, instead of materializing all 8 windows per byte
    up front (~10x more windows than reads on real scans)."""
    byts = np.concatenate([seg, np.full(10, 0xFF, np.uint8)])
    u = byts.astype(np.int64)
    return ((u[:-2] << 16) | (u[1:-1] << 8) | u[2:]).tolist()


_HALF = [0] + [1 << (s - 1) for s in range(1, 16)]
_FULL = [(1 << s) - 1 for s in range(16)]

_STACK_CACHE: dict = {}


def _stacked_tabs(tabs: list) -> tuple:
    """Per-component LUT tuples -> contiguous (sym, len) planes + index
    vectors for the C walk. Cached on the LUT objects' identity — they
    come from the lru-cached canonical builder, so every stream from
    the same encoder reuses one stacked copy instead of re-concatenating
    ~0.5 MB per decode. The cache holds references to its key tables,
    so ids stay valid for the cache's lifetime."""
    key = tuple(id(t) for pair in tabs for t in pair)
    hit = _STACK_CACHE.get(key)
    if hit is not None:
        return hit[1]
    tab_ids: dict[int, int] = {}
    planes_s, planes_l = [], []
    for d, a in tabs:
        for t in (d, a):
            if id(t) not in tab_ids:
                tab_ids[id(t)] = len(planes_s)
                planes_s.append(t[2])
                planes_l.append(t[3])
    out = (np.ascontiguousarray(np.concatenate(planes_s)),
           np.ascontiguousarray(np.concatenate(planes_l)),
           np.array([tab_ids[id(d)] for d, _ in tabs], np.int32),
           np.array([tab_ids[id(a)] for _, a in tabs], np.int32))
    if len(_STACK_CACHE) > 32:
        _STACK_CACHE.clear()
    _STACK_CACHE[key] = (list(tabs), out)
    return out


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB uint8. 3-component 4:4:4 sequential
    only; anything else raises JpegFormatError."""
    if not data.startswith(b"\xff\xd8"):
        raise JpegFormatError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []   # (cid, sampling, tq)
    scan_sel: list[tuple[int, int, int]] = []  # (cid, td, ta)
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        body_start = pos + seglen
        pos = body_start
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                pq, tid = seg[o] >> 4, seg[o] & 0x0F
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                qtabs[tid] = np.frombuffer(seg[o + 1: o + 65], np.uint8) \
                    .astype(np.int64)
                o += 65
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1: o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17: o + 17 + nv])
                htabs[(tc, th)] = _canonical_lut(bits, vals)
                o += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc != 3:
                raise JpegFormatError("only 8-bit 3-component baseline")
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i: 9 + 3 * i]
                if samp != 0x11:
                    raise JpegFormatError("chroma subsampling unsupported")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            for i in range(ns):
                cid, sel = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_sel.append((cid, sel >> 4, sel & 0x0F))
            break
    if h is None or not scan_sel:
        raise JpegFormatError("missing SOF/SOS")

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nb = (ph // 8) * (pw // 8)
    ncomp = len(comps)
    sel_by_cid = {cid: (td, ta) for cid, td, ta in scan_sel}
    tabs = []                       # per component: DC/AC (sym, len) LUTs
    for cid, _, _tq in comps:
        td, ta = sel_by_cid[cid]
        try:
            tabs.append((htabs[(0, td)], htabs[(1, ta)]))
        except KeyError:
            raise JpegFormatError("scan references undeclared DHT") from None

    # Sequential Huffman walk. Preferred path: the compiled C twin
    # (functions/cwalk.py) — the walk is the engine's one genuinely
    # non-vectorizable kernel, and C runs it ~2 orders of magnitude
    # faster. Falls back to the pure-Python loop below (the behavioral
    # spec; tests assert both paths bit-identical) when no toolchain
    # is available or PC_NO_CKERNEL=1.
    from .cwalk import get_walk, run_walk
    cfn = get_walk()
    if cfn is not None:
        sym_tabs, len_tabs, comp_dc, comp_ac = _stacked_tabs(tabs)
        idx_parts, val_parts = [], []
        b = 0
        for seg in _entropy_segments(data, pos):
            if b >= nb:
                break
            seg_p = np.concatenate([np.ascontiguousarray(seg),
                                    np.full(10, 0xFF, np.uint8)])
            cap = (nb - b) * ncomp * 64
            out_idx = np.empty(cap, np.int64)
            out_val = np.empty(cap, np.int64)
            n, b = run_walk(cfn, seg_p, len(seg) * 8, nb, b, ncomp,
                            sym_tabs, len_tabs, comp_dc, comp_ac,
                            out_idx, out_val)
            idx_parts.append(out_idx[:n])
            val_parts.append(out_val[:n])
        zz_all = np.zeros(nb * ncomp * 64, np.int64)
        if idx_parts:
            zz_all[np.concatenate(idx_parts)] = np.concatenate(val_parts)
        return _idct_planes(zz_all, nb, ncomp, comps, qtabs, ph, pw, h, w)

    # Pure-Python walk: O(1) LUT lookups per symbol; coefficient
    # writes are buffered flat and scattered into the planes in one
    # vectorized pass afterwards. Hot-loop locals (bound appends,
    # flattened table tuples, local half/full) measurably matter here —
    # this is the single hottest kernel in the crawl's image branch.
    flat_idx: list[int] = []
    flat_val: list[int] = []
    fi_app, fv_app = flat_idx.append, flat_val.append
    half, full = _HALF, _FULL
    tabs_flat = [(d[0], d[1], a[0], a[1]) for d, a in tabs]
    rng_ncomp = range(ncomp)
    b = 0
    for seg in _entropy_segments(data, pos):
        trips = _trips24(seg)
        nbits = len(seg) * 8
        p = 0
        prev = [0] * ncomp
        while b < nb and p < nbits:
            for ci in rng_ncomp:
                dsym, dlen, asym, alen = tabs_flat[ci]
                t = (trips[p >> 3] >> (8 - (p & 7))) & 0xFFFF
                s = dsym[t]
                L = dlen[t]
                if L == 0:
                    raise JpegFormatError("invalid Huffman code")
                p += L
                if s:
                    if p >= nbits:
                        break
                    a = (trips[p >> 3] >> (24 - s - (p & 7))) & full[s]
                    p += s
                    if a < half[s]:
                        a -= full[s]
                    prev[ci] += a
                base = (b * ncomp + ci) << 6
                fi_app(base)
                fv_app(prev[ci])
                k = 1
                while k < 64:
                    if p >= nbits:
                        break
                    t = (trips[p >> 3] >> (8 - (p & 7))) & 0xFFFF
                    sym = asym[t]
                    L = alen[t]
                    if L == 0:
                        raise JpegFormatError("invalid Huffman code")
                    p += L
                    if sym == 0x00:              # EOB
                        break
                    if sym == 0xF0:              # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    s = sym & 0x0F
                    if k >= 64:
                        raise JpegFormatError("AC run overflow")
                    a = (trips[p >> 3] >> (24 - s - (p & 7))) & full[s]
                    p += s
                    if a < half[s]:
                        a -= full[s]
                    fi_app(base | k)
                    fv_app(a)
                    k += 1
            b += 1

    zz_all = np.zeros(nb * ncomp * 64, np.int64)
    zz_all[np.array(flat_idx, np.int64)] = np.array(flat_val, np.int64)
    return _idct_planes(zz_all, nb, ncomp, comps, qtabs, ph, pw, h, w)


def _idct_planes(zz_all: np.ndarray, nb: int, ncomp: int, comps: list,
                 qtabs: dict, ph: int, pw: int, h: int, w: int
                 ) -> np.ndarray:
    """Flat zigzag coefficients -> RGB: dequantize, batched IDCT,
    color convert (shared tail of the C and Python walk paths)."""
    zz_all = zz_all.reshape(nb, ncomp, 64)
    planes = [zz_all[:, ci, :] for ci in range(ncomp)]

    out_planes = []
    for ci, (cid, _, tq) in enumerate(comps):
        q = qtabs[tq]          # DQT is zigzag-serialized, like the coeffs
        deq = (planes[ci] * q[None, :])[:, _UNZIGZAG].reshape(-1, 8, 8) \
            .astype(np.float64)
        # batched BLAS matmul (C.T @ X @ C) beats einsum on 8x8 tiles
        spatial = _C.T @ deq @ _C + 128.0
        plane = spatial.reshape(ph // 8, pw // 8, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(ph, pw)
        out_planes.append(plane)
    ycc = np.stack(out_planes, axis=-1)[:h, :w]
    return _ycbcr_to_rgb(ycc)
