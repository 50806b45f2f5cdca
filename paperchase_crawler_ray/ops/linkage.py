"""Record linkage: exact edit-distance similarity join over a Ray Dataset.

``edit_distance_join`` finds ALL unordered pairs of rows whose strings are
within Levenshtein distance ``max_dist`` — exactly, never all-pairs — via
PassJoin-style segment signatures (Li, Deng & Feng, VLDB 2011 — public
algorithm, re-derived here):

  * partition every string of length ``l`` into ``k = max_dist + 1``
    balanced segments.  If ``lev(s, t) <= d`` then by pigeonhole at least
    one of s's ``d + 1`` segments is untouched by the edit script, so it
    appears in ``t`` verbatim, starting within ``d`` positions of where it
    starts in ``s`` (each edit shifts positions by at most one).
  * every row therefore emits INDEX keys ``(slot, len(s), segment)`` and
    PROBE keys ``(slot, l, substring)`` for every candidate partner length
    ``l`` in ``[len(t)-d, len(t)+d]`` and every allowed start position —
    hashed to one int64 key space.  Hash collisions only ADD candidates
    (verification is exact), so hashing is lossless.
  * keys feed the same bucket-pair machinery LSH dedup uses
    (``lsh_candidate_pairs``): small key tables pair up on the driver,
    large ones hash-shuffle by key and pair per block — one keyed
    all-to-all over (id, key) rows, never over texts.
  * candidates are verified with a banded Levenshtein DP (O(d·len)
    per pair, early cutoff) with texts attached by broadcast below
    ``broadcast_max_docs`` and by two keyed ``Dataset.join``s above it
    (nothing corpus-sized on the driver at scale).

Scale note: a segment shared by many strings (a stopword-like token at
the same slot) is a hot bucket; candidate generation is quadratic in
bucket membership.  That skew is inherent to signature joins — mitigate
upstream by deduping identical strings first (cheap exact dedup), which
also bounds the d=0 blowup.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _broadcast_texts, lsh_candidate_pairs


def _seg_bounds(length: int, k: int) -> list[tuple[int, int]]:
    """Balanced (start, len) partition of [0, length) into k segments;
    the first ``length % k`` segments take the extra character."""
    base, rem = divmod(length, k)
    out, start = [], 0
    for i in range(k):
        ln = base + (1 if i < rem else 0)
        out.append((start, ln))
        start += ln
    return out


def _seg_key(slot: int, length: int, seg: str) -> int:
    """Signed-int64 hash of a (slot, partner-length, segment) signature."""
    d = hashlib.blake2b(f"{slot}|{length}|".encode() + seg.encode(),
                        digest_size=8).digest()
    v = int.from_bytes(d, "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def _row_keys(text: str, max_dist: int) -> set[int]:
    """All signature keys for one string: its own segments (index side)
    plus the substring probes for every partner length within
    ``max_dist``.  Index keys are a subset of probe keys at l = len(t),
    p = segment start, so one emission covers both sides."""
    k = max_dist + 1
    m = len(text)
    keys: set[int] = set()
    for l in range(max(m - max_dist, 0), m + max_dist + 1):
        for slot, (st, ln) in enumerate(_seg_bounds(l, k)):
            if ln == 0:
                keys.add(_seg_key(slot, l, ""))
                continue
            lo = max(st - max_dist, 0)
            hi = min(st + max_dist, m - ln)
            for p in range(lo, hi + 1):
                keys.add(_seg_key(slot, l, text[p:p + ln]))
    return keys


def _emit_keys(batch: pa.Table, id_col: str, text_col: str,
               max_dist: int) -> pa.Table:
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    out_id, out_key = [], []
    for i, t in enumerate(texts):
        ks = _row_keys(t or "", max_dist)
        out_id.extend([ids[i]] * len(ks))
        out_key.extend(ks)
    return pa.table({id_col: pa.array(out_id, pa.int64()),
                     "band_key": pa.array(out_key, pa.int64())})


def lev_banded(a: str, b: str, d: int) -> int:
    """Levenshtein distance if <= d, else d + 1 (banded DP, early exit).
    O(min(len) * (2d+1)) cells — strings in linkage joins are short;
    for long-string workloads swap in Myers' bit-parallel kernel."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > d:
        return d + 1
    big = d + 1
    prev = [j if j <= d else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo = max(1, i - d)
        hi = min(lb, i + d)
        cur = [big] * (lb + 1)
        if i - d <= 0:
            cur[0] = i
        ca = a[i - 1]
        best = big
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = prev[j - 1] + cost
            if prev[j] + 1 < v:
                v = prev[j] + 1
            if cur[j - 1] + 1 < v:
                v = cur[j - 1] + 1
            cur[j] = v if v <= d else big
            if cur[j] < best:
                best = cur[j]
        if best >= big:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= d else big


class _VerifyLev:
    """map_batches actor: (id_a, id_b) + broadcast texts -> exact
    distance rows (pairs over threshold are dropped here)."""

    def __init__(self, texts_ref, max_dist: int, with_texts: bool):
        self.texts = ray.get(texts_ref)
        self.d = max_dist
        self.with_texts = with_texts

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        rows = []
        for a, b in zip(ia, ib):
            # null texts were keyed as "" in _row_keys; verify the same
            ta, tb = self.texts[a] or "", self.texts[b] or ""
            dist = lev_banded(ta, tb, self.d)
            if dist <= self.d:
                rows.append((a, b, dist, ta, tb))
        cols = {
            "id_a": pa.array([r[0] for r in rows], pa.int64()),
            "id_b": pa.array([r[1] for r in rows], pa.int64()),
            "dist": pa.array([r[2] for r in rows], pa.int64())}
        if self.with_texts:
            cols["text_a"] = pa.array([r[3] for r in rows], pa.string())
            cols["text_b"] = pa.array([r[4] for r in rows], pa.string())
        return pa.table(cols)


def _verify_lev_join(pairs: "ray.data.Dataset | pa.Table", ds: ray.data.Dataset, id_col: str,
                     text_col: str, max_dist: int, with_texts: bool,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """Scale path: attach both texts with the shared two-keyed-join
    helper (pairs are the small probe side), then the banded-DP verify
    per batch."""
    from .dedup import attach_pair_texts, pair_text_cols
    j2 = attach_pair_texts(pairs, ds, id_col, text_col, num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        ta_col, tb_col = pair_text_cols(batch, text_col)
        ta = batch.column(ta_col).to_pylist()
        tb = batch.column(tb_col).to_pylist()
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        rows = [(a, b, dist, sa, sb)
                for a, b, sa, sb in ((a, b, x or "", y or "")
                                     for a, b, x, y in zip(ia, ib, ta, tb))
                if (dist := lev_banded(sa, sb, max_dist)) <= max_dist]
        cols = {
            "id_a": pa.array([r[0] for r in rows], pa.int64()),
            "id_b": pa.array([r[1] for r in rows], pa.int64()),
            "dist": pa.array([r[2] for r in rows], pa.int64())}
        if with_texts:
            cols["text_a"] = pa.array([r[3] for r in rows], pa.string())
            cols["text_b"] = pa.array([r[4] for r in rows], pa.string())
        return pa.table(cols)

    return j2.map_batches(verify, batch_format="pyarrow")


def edit_distance_join(ds: ray.data.Dataset, id_col: str, text_col: str,
                       max_dist: int = 1,
                       broadcast_max_docs: int = 2_000_000,
                       with_texts: bool = False) -> ray.data.Dataset:
    """All unordered pairs (id_a < id_b) with ``lev(text_a, text_b) <=
    max_dist`` — EXACT (the segment filter has no false negatives; the
    banded DP removes false positives).  Returns (id_a, id_b, dist),
    plus text_a/text_b when ``with_texts``.

    ``id_col`` must be int64 and unique per row."""
    n_docs = ds.count()
    keys = ds.map_batches(
        lambda b: _emit_keys(b, id_col, text_col, max_dist),
        batch_format="pyarrow")
    # bucket_cap=None: capping would break exactness; hot segments are
    # the caller's skew to pre-dedupe (module docstring).
    # est_rows: (2d+1) lengths x (d+1) slots x <=(2d+1) positions per
    # doc — an upper bound, so the driver-vs-shuffle switch never
    # underestimates; avoids executing the key stage twice for count().
    est = n_docs * (2 * max_dist + 1) ** 2 * (max_dist + 1)
    pairs = lsh_candidate_pairs(keys, id_col, bucket_cap=None,
                                est_rows=est)
    if n_docs <= broadcast_max_docs:
        texts_ref = _broadcast_texts(ds, id_col, text_col)
        return pairs.map_batches(
            _VerifyLev, fn_constructor_args=(texts_ref, max_dist, with_texts),
            batch_format="pyarrow", concurrency=(1, 4))
    return _verify_lev_join(pairs, ds, id_col, text_col, max_dist,
                            with_texts)
