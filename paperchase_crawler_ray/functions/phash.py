"""64-bit DCT perceptual hash (SURVEY.md M10) — pure numpy, no Ray.

Algorithm (classic pHash): RGB -> luma -> area-resample to 32x32 ->
2D DCT-II (matrix form) -> top-left 8x8 low-frequency block -> bit per
coefficient above the median of the 63 non-DC coefficients -> packed
big-endian into a signed int64.

Shared by the fixture generator (goldens), the Ray image stage and the
oracle crawler so one implementation defines the spec.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

import numpy as np

_N = 32
_LUMA = np.array([0.299, 0.587, 0.114])


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    mat = np.cos(np.pi / n * (k[:, None] + 0.5) * k[None, :]).T  # (freq, sample)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat * np.sqrt(2.0 / n)


_DCT = _dct_matrix(_N)


def area_resample(gray: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Deterministic area-binning resample of a 2-D float array.

    Implemented with ``np.bincount`` (both it and the previous
    ``np.add.at`` accumulate in flat element order, so sums are
    bit-identical, ~5-10x faster on large images)."""
    h, w = gray.shape
    idx, cnt = _bin_geometry(h, w, oh, ow)
    out = np.bincount(idx, weights=gray.ravel(), minlength=oh * ow)
    return (out / cnt).reshape(oh, ow)


@_lru_cache(maxsize=64)
def _bin_geometry(h: int, w: int, oh: int, ow: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(flat bin index, per-bin count) — pure function of the
    geometry; cached because the crawl hashes millions of images from
    a handful of size classes."""
    ys = (np.arange(h) * oh) // h
    xs = (np.arange(w) * ow) // w
    idx = (ys[:, None] * ow + xs[None, :]).ravel()
    cnt = np.bincount(idx, minlength=oh * ow).astype(np.float64)
    cnt[cnt == 0] = 1.0
    return idx, cnt


def phash64(img: np.ndarray) -> int:
    """Perceptual hash of an RGB uint8 (h, w, 3) image -> signed int64."""
    gray = img.astype(np.float64) @ _LUMA
    g = area_resample(gray, _N, _N)
    d = _DCT @ g @ _DCT.T
    block = d[:8, :8].ravel()
    med = np.median(block[1:])
    bits = block > med
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between int64 hash arrays."""
    x = (np.asarray(a).astype(np.int64).view(np.uint64)
         ^ np.asarray(b).astype(np.int64).view(np.uint64))
    bytes_ = x.view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(bytes_, axis=-1).sum(axis=-1).astype(np.int64)
