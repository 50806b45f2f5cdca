"""Optional compiled kernel for the JPEG Huffman walk.

The sequential entropy-decode walk is the one kernel in the engine that
numpy cannot vectorize (every step's bit offset depends on the previous
symbol), so it is offered as a tiny C routine compiled ON DEMAND with
the system toolchain (no third-party package, no network). The pure
Python walk in jpeg.py remains the behavioral spec and the fallback:
``get_walk()`` returns None whenever no toolchain is available or
``PC_NO_CKERNEL=1``, and tests assert the two paths are bit-identical.

The shared object is cached under /tmp keyed by the source hash, so the
first worker process pays one ~100 ms compile and every other process
(and every later run of the same source) just dlopens it. The build is
race-safe across Ray workers: compile to a unique temp name, then
atomically rename into place.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_jpegwalk.c")
# per-uid, mode-0700 cache dir: a shared /tmp/pc_ckernels would let any
# local user pre-plant a .so at the predictable name and have every Ray
# worker dlopen it
_CACHE_DIR = os.path.join(tempfile.gettempdir(),
                          f"pc_ckernels_{os.getuid()}")

_walk = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    if os.environ.get("PC_NO_CKERNEL") == "1":
        return None
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.blake2b(src, digest_size=12).hexdigest()
        so = os.path.join(_CACHE_DIR, f"jpegwalk_{tag}.so")
        if not os.path.exists(so):
            os.makedirs(_CACHE_DIR, mode=0o700, exist_ok=True)
            if os.stat(_CACHE_DIR).st_uid != os.getuid():
                return None  # someone else owns the cache dir: refuse
            tmp = f"{so}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)  # atomic: concurrent builders all win
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so)
        fn = lib.pc_jpeg_walk
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        pk = lib.pc_jpeg_pack
        pk.restype = ctypes.c_int64
        pk.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                       ctypes.c_void_p, ctypes.c_int64]
        return fn, pk
    except Exception:
        return None


def _libfns():
    global _walk, _tried
    if not _tried:
        _walk = _build()
        _tried = True
    return _walk


def get_walk():
    """The compiled walk entry point, or None (use the Python path)."""
    fns = _libfns()
    return fns[0] if fns else None


def get_pack():
    """The compiled encode-scan entry point, or None."""
    fns = _libfns()
    return fns[1] if fns else None


def run_pack(pk, A: np.ndarray, ncomp: int) -> bytes:
    """Entropy-encode the interleaved (n, 64) zigzag coefficient table
    with the compiled kernel; returns the stuffed scan bytes.

    Capacity is a PROVEN worst case: per 64-coeff row the unstuffed
    stream is at most 4+11 DC bits + 63*(8+10) AC bits = 1149 bits
    (~144 bytes); FF00 stuffing at most doubles it and padding adds one
    byte, so 320 bytes/row strictly dominates. The kernel still takes
    the capacity and returns -3 rather than write past it."""
    n = A.shape[0]
    out = np.empty(max(64, n * 320 + 8), np.uint8)
    w = pk(A.ctypes.data, n, ncomp, out.ctypes.data, out.size)
    if w < 0:
        raise RuntimeError(f"pc_jpeg_pack failed ({w})")
    return out[:w].tobytes()


def run_walk(fn, seg_padded: np.ndarray, nbits: int, nb: int, b0: int,
             ncomp: int, sym_tabs: np.ndarray, len_tabs: np.ndarray,
             comp_dc: np.ndarray, comp_ac: np.ndarray,
             out_idx: np.ndarray, out_val: np.ndarray) -> tuple[int, int]:
    """ctypes shim: returns (n_coeffs_written, next_block). Raises the
    same JpegFormatError classes as the Python walk on bad streams."""
    out_b = np.zeros(1, np.int64)
    n = fn(seg_padded.ctypes.data, nbits, nb, b0, ncomp,
           sym_tabs.ctypes.data, len_tabs.ctypes.data,
           comp_dc.ctypes.data, comp_ac.ctypes.data,
           out_idx.ctypes.data, out_val.ctypes.data, out_b.ctypes.data)
    if n == -1:
        from .jpeg import JpegFormatError
        raise JpegFormatError("invalid Huffman code")
    if n == -2:
        from .jpeg import JpegFormatError
        raise JpegFormatError("AC run overflow")
    return int(n), int(out_b[0])
