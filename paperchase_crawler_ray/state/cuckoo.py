"""Sharded URL-seen set: cuckoo filter with bloom/exact cold-shard path.

The north rule (BASELINE.json:6,14) mandates a "sharded cuckoo-filter URL-
seen set (bloom fallback for cold shards) keyed by canonicalized URL hash".

Design (public cuckoo-filter literature — Fan et al., CoNEXT 2014):
  * buckets of 4 x 16-bit fingerprints in a flat numpy uint16 array
  * partial-key cuckoo hashing: i2 = i1 XOR h(fp); delete-capable
  * no false negatives; FP rate ~ 2^-13 per lookup at 4-way buckets
  * lookups fully vectorized (numpy gather over both candidate buckets);
    inserts loop only over the *novel* rows of a batch
  * cold shards (below ``promote_at`` entries) keep an exact uint64 array
    plus a tiny bloom bitset for O(1) prefilters — "bloom fallback" —
    and are promoted to a cuckoo table on warm-up (the exact array makes
    promotion lossless; a bloom alone cannot be enumerated).

``ShardFilter.checkpoint()`` / ``restore()`` round-trip the full state so
a killed run resumes with an identical seen set (BASELINE.json:14).
"""

from __future__ import annotations

import numpy as np

_FP_MASK = np.uint64(0xFFFF)
_KICKS = 500


def _as_u64(h: np.ndarray) -> np.ndarray:
    """Coerce int64/uint64 key arrays to uint64 (two's-complement view)."""
    h = np.ascontiguousarray(h)
    if h.dtype == np.uint64:
        return h
    if h.dtype == np.int64:
        return h.view(np.uint64)
    return h.astype(np.uint64)


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from uint64 hashes."""
    fp = ((h >> np.uint64(44)) & _FP_MASK).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _fp_hash(fp: np.ndarray) -> np.ndarray:
    """Mixing hash of a fingerprint for the partial-key alternate bucket."""
    return (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) ^ np.uint64(0x9E3779B97F4A7C15)


class CuckooFilter:
    """4-way-bucket, 16-bit-fingerprint cuckoo filter over uint64 keys."""

    def __init__(self, capacity: int, seed: int = 42):
        nb = 16
        while nb * 4 * 0.95 < capacity:
            nb <<= 1
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, 4), np.uint16)
        self.size = 0
        self._rng = np.random.Generator(np.random.PCG64(seed))

    # -- vectorized membership ------------------------------------------------
    def contains_many(self, h: np.ndarray) -> np.ndarray:
        h = _as_u64(h)
        fp = _fingerprints(h)
        i1 = (h & self.mask).astype(np.int64)
        i2 = ((h & self.mask) ^ (_fp_hash(fp) & self.mask)).astype(np.int64)
        b1 = self.table[i1]  # (n, 4)
        b2 = self.table[i2]
        fpc = fp[:, None]
        return ((b1 == fpc).any(axis=1)) | ((b2 == fpc).any(axis=1))

    # -- scalar insert with eviction ------------------------------------------
    def _insert_one(self, i1: int, fp: int) -> bool:
        i2 = int((np.uint64(i1) ^ (_fp_hash(np.uint16(fp)) & self.mask)))
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        # evict
        idx = i1 if self._rng.integers(2) == 0 else i2
        cur = np.uint16(fp)
        for _ in range(_KICKS):
            slot = int(self._rng.integers(4))
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(np.uint64(idx) ^ (_fp_hash(cur) & self.mask))
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.size += 1
                return True
        raise RuntimeError("cuckoo filter full (resize shard count)")

    def insert_many(self, h: np.ndarray) -> None:
        h = _as_u64(h)
        fp = _fingerprints(h)
        i1 = (h & self.mask).astype(np.int64)
        for k in range(len(h)):
            self._insert_one(int(i1[k]), int(fp[k]))

    def delete_many(self, h: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns removed count."""
        h = _as_u64(h)
        fp = _fingerprints(h)
        i1 = (h & self.mask).astype(np.int64)
        i2 = ((h & self.mask) ^ (_fp_hash(fp) & self.mask)).astype(np.int64)
        removed = 0
        for k in range(len(h)):
            done = False
            for idx in (int(i1[k]), int(i2[k])):
                row = self.table[idx]
                hit = np.nonzero(row == fp[k])[0]
                if len(hit):
                    row[hit[0]] = 0
                    self.size -= 1
                    removed += 1
                    done = True
                    break
            if done:
                continue
        return removed

    def state(self) -> dict:
        return {"kind": "cuckoo", "table": self.table.copy(), "size": self.size}


class BloomFilter:
    """Flat bloom bitset over uint64 keys (k derived double hashing)."""

    def __init__(self, nbits: int = 1 << 16, k: int = 7):
        self.nbits = nbits
        self.k = k
        self.bits = np.zeros(nbits // 8, np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h % np.uint64(self.nbits)
        h2 = (h >> np.uint64(17)) % np.uint64(self.nbits - 1) + np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + ks * h2[None, :]) % np.uint64(self.nbits)).astype(np.int64)

    def add_many(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0).astype(bool)


class ShardFilter:
    """One shard of the seen set: exact+bloom while cold, cuckoo when warm."""

    def __init__(self, capacity: int = 1 << 20, promote_at: int = 4096, seed: int = 42):
        self.capacity = capacity
        self.promote_at = promote_at
        self.seed = seed
        self.mode = "cold"
        self._exact: np.ndarray = np.empty(0, np.uint64)
        self._bloom = BloomFilter()
        self._cuckoo: CuckooFilter | None = None

    @property
    def count(self) -> int:
        return len(self._exact) if self.mode == "cold" else self._cuckoo.size

    def _promote(self) -> None:
        cf = CuckooFilter(max(self.capacity, len(self._exact) * 2), seed=self.seed)
        cf.insert_many(self._exact)
        self._cuckoo = cf
        self._exact = np.empty(0, np.uint64)
        self.mode = "cuckoo"

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(h, np.uint64)
        if self.mode == "cuckoo":
            return self._cuckoo.contains_many(h)
        maybe = self._bloom.contains_many(h)
        out = np.zeros(len(h), bool)
        if maybe.any():
            out[maybe] = np.isin(h[maybe], self._exact)
        return out

    def check_and_insert(self, h: np.ndarray) -> np.ndarray:
        """Return mask of rows that are the FIRST global sighting of their
        key (per-batch duplicates keep only the first occurrence), and
        insert those keys. No false negatives; serial per shard actor.
        """
        h = np.ascontiguousarray(h, np.uint64)
        n = len(h)
        if n == 0:
            return np.zeros(0, bool)
        uniq, inv = np.unique(h, return_inverse=True)
        first_idx = np.full(len(uniq), n, np.int64)
        np.minimum.at(first_idx, inv, np.arange(n))
        novel_uniq = ~self.contains_many(uniq)
        mask = novel_uniq[inv] & (np.arange(n) == first_idx[inv])
        to_insert = uniq[novel_uniq]
        if len(to_insert):
            if self.mode == "cold":
                self._exact = np.concatenate([self._exact, to_insert])
                self._bloom.add_many(to_insert)
                if len(self._exact) >= self.promote_at:
                    self._promote()
            else:
                self._cuckoo.insert_many(to_insert)
        return mask

    # -- checkpoint / restore --------------------------------------------------
    def checkpoint(self) -> dict:
        if self.mode == "cold":
            return {"mode": "cold", "exact": self._exact.copy(),
                    "capacity": self.capacity, "promote_at": self.promote_at}
        return {"mode": "cuckoo", "table": self._cuckoo.table.copy(),
                "size": self._cuckoo.size, "capacity": self.capacity,
                "promote_at": self.promote_at}

    @classmethod
    def restore(cls, state: dict, seed: int = 42) -> "ShardFilter":
        sf = cls(capacity=state["capacity"], promote_at=state["promote_at"], seed=seed)
        if state["mode"] == "cold":
            if len(state["exact"]):
                sf._exact = np.asarray(state["exact"], np.uint64).copy()
                sf._bloom.add_many(sf._exact)
        else:
            sf.mode = "cuckoo"
            cf = CuckooFilter(state["capacity"], seed=seed)
            cf.table = np.asarray(state["table"], np.uint16).copy()
            # table size must match what capacity produced
            cf.nbuckets = cf.table.shape[0]
            cf.mask = np.uint64(cf.nbuckets - 1)
            cf.size = int(state["size"])
            sf._cuckoo = cf
        return sf
