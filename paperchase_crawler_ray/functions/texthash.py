"""Text hashing / similarity primitives for large-scale dedup.

Pure numpy/stdlib building blocks used by the dedup and similarity stages
(stages/dedup.py, stages/ann.py): stable 64-bit string hashing, word/char
shingles, MinHash signatures, SimHash, n-gram Jaccard, and a rolling-hash
document fingerprint. Deterministic across processes (blake2b-seeded, no
Python ``hash``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# Mersenne prime used for universal hashing of minhash permutations.
_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64((1 << 61) - 1)


def stable_hash64(s: str | bytes) -> int:
    """Stable signed-int64 blake2b hash of a string (cross-process safe)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    v = int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def tokens(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


_SHINGLE_COEF = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                          0x165667B19E3779F9, 0x27D4EB2F165667C5,
                          0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD],
                         np.uint64)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of word k-shingles.

    One blake2b per TOKEN, then a vectorized wrapping-uint64 linear
    combination per k-window — ~k x fewer cryptographic hashes than
    hashing each joined shingle string.
    """
    toks = tokens(text)
    if len(toks) < k:
        base = " ".join(toks) if toks else ""
        return np.array([np.uint64(stable_hash64(base) & ((1 << 61) - 1))],
                        np.uint64)
    th = np.array([stable_hash64(t) for t in toks], np.int64).view(np.uint64)
    n_out = len(toks) - k + 1
    acc = np.zeros(n_out, np.uint64)
    for j in range(k):
        acc = acc + th[j:j + n_out] * _SHINGLE_COEF[j % len(_SHINGLE_COEF)]
    return acc & np.uint64((1 << 61) - 1)


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficients for `num_perm` universal-hash permutations."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle-hash set."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MAXH, np.uint64)
    # (a*x + b) mod p, vectorized over (num_perm, n_shingles)
    x = shingle_hashes[None, :].astype(np.object_)  # python ints avoid overflow
    vals = (a[:, None].astype(np.object_) * x + b[:, None].astype(np.object_)) % _MERSENNE
    return np.min(vals, axis=1).astype(np.uint64)


def minhash_signature_fast(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Overflow-safe fast path: arithmetic in uint64 with 61-bit inputs.

    (a*x + b) mod 2^61-1 computed via 128-bit emulation using float64 is
    error-prone; instead use modular multiply via Python ints only when
    needed. Here we use the well-known trick: since a, x < 2^61, split x
    into hi/lo 31-bit halves and reduce mod the Mersenne prime with
    shifts. All ops stay in uint64.
    """
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MAXH, np.uint64)
    p = np.uint64(_MERSENNE)
    x = shingle_hashes.astype(np.uint64)
    lo_mask = np.uint64((1 << 31) - 1)
    sigs = np.empty(len(a), np.uint64)
    xl = x & lo_mask
    xh = x >> np.uint64(31)
    for i in range(len(a)):
        ai = a[i]
        al = ai & lo_mask
        ah = ai >> np.uint64(31)
        # a*x = (ah*xh)<<62 + (ah*xl + al*xh)<<31 + al*xl  (mod 2^61-1)
        # use: 2^61 ≡ 1 (mod p)  =>  (v << s) mod p folds via rotation
        def fold(v: np.ndarray, shift: int) -> np.ndarray:
            # v * 2^shift mod p, with v < 2^62, shift <= 62
            total = shift
            out = v % p
            while total > 0:
                s = min(total, 3)
                out = (out << np.uint64(s)) % p
                total -= s
            return out

        term = (fold(ah * xh, 62) + fold(ah * xl + al * xh, 31) + (al * xl) % p) % p
        term = (term + b[i]) % p
        sigs[i] = term.min()
    return sigs


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (unit weights) -> signed int64."""
    toks = tokens(text)
    if not toks:
        return 0
    hs = np.array([stable_hash64(t) for t in toks], np.int64).view(np.uint64)
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    v = 0
    for bit in (acc > 0).astype(np.int64):
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def ngram_set(text: str, n: int = 5) -> set[int]:
    """Character n-gram hash set (for exact Jaccard verification)."""
    s = " ".join(tokens(text))
    if len(s) < n:
        return {stable_hash64(s)} if s else set()
    return {stable_hash64(s[i : i + n]) for i in range(len(s) - n + 1)}


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> int:
    """Winnowing-style document fingerprint: XOR of selected rolling hashes.

    Rolls a polynomial hash over token stream windows and keeps hashes
    ≡ 0 (mod keep_mod); XOR-folds the kept set into one signed int64.
    Robust to local edits outside kept windows; deterministic.
    """
    toks = tokens(text)
    if not toks:
        return 0
    hs = [stable_hash64(t) & ((1 << 61) - 1) for t in toks]
    acc = 0
    B = 1099511628211  # FNV-ish base
    mod = (1 << 61) - 1
    cur = 0
    pw = pow(B, window - 1, mod) if len(hs) >= window else 0
    if len(hs) < window:
        for h in hs:
            cur = (cur * B + h) % mod
        acc = cur
    else:
        for i, h in enumerate(hs):
            if i < window:
                cur = (cur * B + h) % mod
                if i == window - 1 and cur % keep_mod == 0:
                    acc ^= cur
            else:
                cur = ((cur - hs[i - window] * pw) * B + h) % mod
                if cur % keep_mod == 0:
                    acc ^= cur
        if acc == 0:
            acc = cur  # guarantee a nonzero-ish fallback fingerprint
    return acc - (1 << 64) if acc >= (1 << 63) else acc
