"""Near-duplicate document / embedding dedup at training-data scale.

Semantics shared by every variant (deterministic, order-free):
a candidate pair (i, j) with id_i < id_j whose verified similarity passes
the threshold marks the LARGER id as a duplicate; kept rows are those
never marked. ("dominated-by-smaller-id" — simpler and more reproducible
than connected components, and each variant's pure-Python naive twin in
tests/test_dedup_ops.py mirrors it exactly.)

Scale design:
  * signatures (minhash / simhash / hyperplane-LSH) are computed in
    stateful ``map_batches`` actor stages — permutation tables built once
    per actor in ``__init__``;
  * candidate generation is a ``groupby`` on the bucket key — the ONLY
    all-to-all shuffle, and it moves (id, signature) pairs, never texts;
  * verification joins candidate pairs back to payloads via broadcast at
    sandbox scale; at 100 TB swap for ``Dataset.join`` on doc_id — noted
    inline;
  * the final "drop set" of duplicate ids is collected to the driver and
    broadcast via ``ray.put`` — it is at most the number of verified
    duplicates, which for real corpora is ≪ corpus size. This is the
    standard MinHash-LSH dedup layout (one pass, no iteration).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.texthash import (jaccard, ngram_set, simhash64, tokens,
                                  word_shingles)
from ..functions.phash import hamming64

_P32 = np.uint64(4294967311)  # prime > 2^32: (a*x+b) mod p stays in uint64


def minhash_params32(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_sig32(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized minhash over 32-bit shingle hashes; uint64-safe."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint32).max, np.uint32)
    x = (shingles & np.uint64(0xFFFFFFFF))[None, :]
    vals = (a[:, None] * x + b[:, None]) % _P32
    return vals.min(axis=1).astype(np.uint32)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Signed-int64 bucket key per band: blake2b of (band, band slice)."""
    r = len(sig) // bands
    out = []
    for bi in range(bands):
        d = hashlib.blake2b(bytes([bi]) + sig[bi * r:(bi + 1) * r].tobytes(),
                            digest_size=8).digest()
        v = int.from_bytes(d, "big")
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return out


class MinHashSignatures:
    """map_batches actor: text -> minhash signature + per-band bucket rows.

    Emits EXPLODED rows (id, band_key) — one row per band — ready for the
    bucket groupby, plus the signature bytes for verification-free
    estimated-jaccard paths.
    """

    def __init__(self, id_col: str, text_col: str, num_perm: int = 128,
                 bands: int = 16, shingle_k: int = 3, seed: int = 42):
        self.id_col, self.text_col = id_col, text_col
        self.bands = bands
        self.a, self.b = minhash_params32(num_perm, seed)
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band = [], []
        for i, t in enumerate(texts):
            sig = minhash_sig32(word_shingles(t, self.k), self.a, self.b)
            for bk in band_keys(sig, self.bands):
                out_id.append(ids[i])
                out_band.append(bk)
        return pa.table({
            self.id_col: pa.array(out_id, batch.schema.field(self.id_col).type),
            "band_key": pa.array(out_band, pa.int64()),
        })


def _bucket_pairs(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """All (smaller, larger) id pairs within one bucket (groups are tiny
    for sane band widths; hot buckets are capped to bound worst case)."""
    ids = np.unique(g[id_col].to_numpy())[:64]  # cap pathological buckets
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []}).astype({"id_a": ids.dtype if len(ids) else np.int64, "id_b": ids.dtype if len(ids) else np.int64})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def lsh_candidate_pairs(ds_bands: ray.data.Dataset, id_col: str) -> ray.data.Dataset:
    """groupby(band_key) -> unique candidate pairs (the LSH shuffle)."""
    pairs = ds_bands.groupby("band_key").map_groups(
        lambda g: _bucket_pairs(g, id_col), batch_format="pandas")
    # dedup identical pairs discovered in multiple bands
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.iloc[:1], batch_format="pandas")


class VerifyJaccard:
    """map_batches actor over candidate pairs: exact n-gram/word-shingle
    jaccard against a broadcast id->text lookup (sandbox scale; at 100 TB
    replace the broadcast with two Dataset.join's on id)."""

    def __init__(self, texts_ref, shingle_k: int = 3, char_ngram: int | None = None):
        lookup: dict = ray.get(texts_ref)
        self._texts = lookup
        self.k = shingle_k
        self.char_ngram = char_ngram

    def _set(self, text: str) -> set:
        if self.char_ngram:
            return ngram_set(text, self.char_ngram)
        toks = tokens(text)
        if len(toks) < self.k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + self.k]) for i in range(len(toks) - self.k + 1)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_pylist()
        ib = batch.column("id_b").to_pylist()
        sims = np.array([jaccard(self._set(self._texts[a]), self._set(self._texts[b]))
                         for a, b in zip(ia, ib)], np.float64)
        return batch.append_column("sim", pa.array(sims, pa.float64()))


def _drop_set(verified: ray.data.Dataset, threshold: float) -> set:
    """Collect the duplicate ids (larger of each passing pair). Small."""
    drops: set = set()
    for b in verified.iter_batches(batch_format="pyarrow", batch_size=65536):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        sims = t.column("sim").to_numpy(zero_copy_only=False)
        ids = t.column("id_b").to_numpy(zero_copy_only=False)
        drops.update(ids[sims >= threshold].tolist())
    return drops


def _filter_dropped(ds: ray.data.Dataset, id_col: str, drops: set) -> ray.data.Dataset:
    arr = np.array(sorted(drops), np.int64) if drops else np.empty(0, np.int64)
    ref = ray.put(arr)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, d)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _broadcast_texts(ds: ray.data.Dataset, id_col: str, text_col: str):
    lookup = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        lookup.update(zip(t.column(id_col).to_pylist(),
                          t.column(text_col).to_pylist()))
    return ray.put(lookup)


def minhash_lsh_dedup(ds: ray.data.Dataset, id_col: str, text_col: str,
                      threshold: float = 0.6, num_perm: int = 128,
                      bands: int = 16, shingle_k: int = 3) -> ray.data.Dataset:
    """MinHash+LSH near-dup dedup: shingle -> minhash -> band buckets ->
    candidate pairs -> exact-jaccard verify -> drop larger ids."""
    bands_ds = ds.map_batches(
        MinHashSignatures, fn_constructor_args=(id_col, text_col, num_perm, bands, shingle_k),
        batch_format="pyarrow", concurrency=(1, 4))
    pairs = lsh_candidate_pairs(bands_ds, id_col)
    texts_ref = _broadcast_texts(ds, id_col, text_col)
    verified = pairs.map_batches(VerifyJaccard, fn_constructor_args=(texts_ref, shingle_k),
                                 batch_format="pyarrow", concurrency=(1, 4))
    return _filter_dropped(ds, id_col, _drop_set(verified, threshold))


def ngram_jaccard_dedup(ds: ray.data.Dataset, id_col: str, text_col: str,
                        threshold: float = 0.8, char_ngram: int = 5,
                        num_perm: int = 128, bands: int = 32) -> ray.data.Dataset:
    """Character-n-gram Jaccard dedup: LSH candidates over char-shingle
    minhash, exact char-n-gram jaccard verify."""

    class CharSignatures(MinHashSignatures):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
            texts = batch.column(self.text_col).to_pylist()
            out_id, out_band = [], []
            for i, t in enumerate(texts):
                sig = minhash_sig32(_ngram_hashes(t, char_ngram), self.a, self.b)
                for bk in band_keys(sig, self.bands):
                    out_id.append(ids[i])
                    out_band.append(bk)
            return pa.table({
                self.id_col: pa.array(out_id, batch.schema.field(self.id_col).type),
                "band_key": pa.array(out_band, pa.int64()),
            })

    bands_ds = ds.map_batches(
        CharSignatures, fn_constructor_args=(id_col, text_col, num_perm, bands),
        batch_format="pyarrow", concurrency=(1, 4))
    pairs = lsh_candidate_pairs(bands_ds, id_col)
    texts_ref = _broadcast_texts(ds, id_col, text_col)
    verified = pairs.map_batches(
        VerifyJaccard, fn_constructor_args=(texts_ref, 3, char_ngram),
        batch_format="pyarrow", concurrency=(1, 4))
    return _filter_dropped(ds, id_col, _drop_set(verified, threshold))


def _ngram_hashes(text: str, n: int) -> np.ndarray:
    return np.array(sorted(np.uint64(h & ((1 << 64) - 1)) for h in ngram_set(text, n)),
                    np.uint64)


class SimHashBuckets:
    """map_batches fn: simhash + 4x16-bit band buckets (a pair within
    hamming<=3 of 64 bits shares at least one exact 16-bit band)."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_sig = [], [], []
        for i, t in enumerate(texts):
            s = simhash64(t)
            u = np.int64(s).view(np.uint64)
            for bi in range(4):
                band_val = int((u >> np.uint64(16 * bi)) & np.uint64(0xFFFF))
                out_id.append(ids[i])
                out_band.append((bi << 16) | band_val)
                out_sig.append(s)
        return pa.table({
            self.id_col: pa.array(out_id, batch.schema.field(self.id_col).type),
            "band_key": pa.array(out_band, pa.int64()),
            "simhash": pa.array(out_sig, pa.int64()),
        })


def simhash_dedup(ds: ray.data.Dataset, id_col: str, text_col: str,
                  hamming_max: int = 3) -> ray.data.Dataset:
    """SimHash near-dup dedup: 16-bit band buckets -> within-bucket
    hamming<=hamming_max -> drop larger ids. Verification needs only the
    signatures (they ride along the shuffle), so no text join at all."""
    bands_ds = ds.map_batches(SimHashBuckets, fn_constructor_args=(id_col, text_col),
                              batch_format="pyarrow", concurrency=(1, 4))

    def bucket_drops(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates(id_col).sort_values(id_col)
        ids = sub[id_col].to_numpy()
        sigs = sub["simhash"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"drop_id": np.empty(0, ids.dtype)})
        dm = hamming64(sigs[:, None], sigs[None, :])
        close = (dm <= hamming_max)
        np.fill_diagonal(close, False)
        dominated = np.triu(close, k=1).any(axis=0)  # some smaller id is close
        return pd.DataFrame({"drop_id": ids[dominated]})

    drops_ds = bands_ds.groupby("band_key").map_groups(bucket_drops,
                                                       batch_format="pandas")
    drops: set = set()
    for b in drops_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        drops.update(t.column("drop_id").to_pylist())
    return _filter_dropped(ds, id_col, drops)


class EmbeddingNearDupExact:
    """map_batches actor: drop rows dominated by a smaller-id vector with
    cosine >= threshold, against a broadcast normalized matrix.

    Exact semantics == the SQL ``NOT EXISTS (b.vec_id < a.vec_id AND
    cos(a,b) >= t)`` oracle. The broadcast full matrix is the sandbox
    path; the scale path is ``embedding_lsh_dedup`` below.
    """

    def __init__(self, mat_ref, ids_ref, threshold: float):
        self.M = ray.get(mat_ref)          # (n, d) float64, L2-normalized
        self.ids = ray.get(ids_ref)        # (n,) int64 sorted ascending
        self.t = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))
        emb = emb.astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-30)
        sims = emb @ self.M.T                       # (b, n)
        smaller = self.ids[None, :] < ids[:, None]  # only smaller ids dominate
        dominated = ((sims >= self.t) & smaller).any(axis=1)
        return batch.filter(pa.array(~dominated))


def embedding_neardup_dedup(ds: ray.data.Dataset, threshold: float = 0.35
                            ) -> ray.data.Dataset:
    """Embedding-cosine near-dup dedup, exact dominated-by-smaller-id.

    Broadcasts the normalized matrix once (``ray.put``); every batch does
    one float64 matmul against it — vectorized, zero-copy in.
    """
    ids, vecs = [], []
    for b in ds.select_columns(["vec_id", "embedding"]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        ids.append(t.column("vec_id").to_numpy(zero_copy_only=False))
        vecs.append(np.stack(t.column("embedding").to_numpy(zero_copy_only=False)))
    all_ids = np.concatenate(ids)
    M = np.concatenate(vecs).astype(np.float64)
    order = np.argsort(all_ids)
    all_ids, M = all_ids[order], M[order]
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    mat_ref, ids_ref = ray.put(M), ray.put(all_ids)
    return ds.map_batches(EmbeddingNearDupExact,
                          fn_constructor_args=(mat_ref, ids_ref, threshold),
                          batch_format="pyarrow", concurrency=(1, 4))


class HyperplaneLSH:
    """map_batches actor: sign-bit LSH bucket key for embeddings (the
    scale path for embedding near-dup: only same-bucket pairs compared)."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 42):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.H = rng.standard_normal((dim, nbits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)
                       ).astype(np.float64)
        bits = (emb @ self.H) > 0
        key = np.zeros(len(emb), np.int64)
        for j in range(bits.shape[1]):
            key = (key << 1) | bits[:, j].astype(np.int64)
        return batch.append_column("lsh_bucket", pa.array(key, pa.int64()))


def embedding_lsh_dedup(ds: ray.data.Dataset, dim: int, threshold: float = 0.35,
                        nbits: int = 8) -> ray.data.Dataset:
    """Approximate embedding near-dup: hyperplane-LSH bucket groupby, exact
    cosine within bucket only. Misses cross-bucket pairs by design
    (recall measured in tests); shuffle key is the bucket."""
    bucketed = ds.map_batches(HyperplaneLSH, fn_constructor_args=(dim, nbits),
                              batch_format="pyarrow", concurrency=(1, 4))

    def bucket_drops(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy()
        E = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        sims = E @ E.T
        close = np.triu(sims >= threshold, k=1)
        return pd.DataFrame({"drop_id": ids[close.any(axis=0)]})

    drops_ds = bucketed.groupby("lsh_bucket").map_groups(bucket_drops,
                                                         batch_format="pandas")
    drops: set = set()
    for b in drops_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        drops.update(t.column("drop_id").to_pylist())
    return _filter_dropped(ds, "vec_id", drops)
