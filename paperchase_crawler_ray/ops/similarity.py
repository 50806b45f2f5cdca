"""Similarity search over an embedding column (list<float>).

``brute_force_topk`` is the exact baseline: every batch computes one
numpy matmul against a broadcast query matrix (``ray.put`` once, read in
every actor's ``__init__`` — never re-shipped per batch) and emits only
its per-batch top-k rows, so the final per-query reduce moves
O(num_blocks * k) rows, not the corpus.

``ivf_topk`` is the scale path: k-means-lite centroids (sampled, a few
Lloyd iterations, seeded), per-row nearest-centroid assignment inside
``map_batches``, then probing only the ``nprobe`` closest clusters per
query. Recall vs the brute-force baseline is measured in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


class BatchTopK:
    """map_batches actor: cosine scores vs broadcast queries, per-batch
    top-k partial results (query_id, vec_id, sim)."""

    def __init__(self, queries_ref, qids_ref, k: int):
        self.Q = ray.get(queries_ref)        # (q, d) normalized float64
        self.qids = ray.get(qids_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        E = _normalize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        sims = self.Q @ E.T                  # (q, b)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # partial top-k with deterministic (sim desc, vec_id asc) order
            part = np.argpartition(-row, k - 1)[:k]
            order = part[np.lexsort((ids[part], -row[part]))]
            out_q.extend([self.qids[qi]] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })


def _final_topk(partials: ray.data.Dataset, k: int) -> ray.data.Dataset:
    def topk(g: pd.DataFrame) -> pd.DataFrame:
        idx = np.lexsort((g["vec_id"].to_numpy(), -g["sim"].to_numpy()))[:k]
        out = g.iloc[idx].reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return partials.groupby("query_id").map_groups(topk, batch_format="pandas")


def load_queries(ds: ray.data.Dataset, query_ids: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side: pull the query vectors (tiny) out of the dataset."""
    qids = np.array(sorted(query_ids), np.int64)
    rows = {}
    for b in ds.select_columns(["vec_id", "embedding"]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        hit = np.isin(ids, qids)
        if hit.any():
            emb = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)[hit])
            for i, v in zip(ids[hit], emb):
                rows[int(i)] = v
    Q = _normalize(np.stack([rows[int(i)] for i in qids]))
    return qids, Q


def brute_force_topk(ds: ray.data.Dataset, query_ids: list[int], k: int = 5
                     ) -> ray.data.Dataset:
    """Exact cosine top-k for each query id; ties broken by vec_id asc.

    Output: (query_id, vec_id, rank) — floats kept out of the contract
    so the DuckDB oracle compares exactly.
    """
    qids, Q = load_queries(ds, query_ids)
    qref, iref = ray.put(Q), ray.put(qids)
    partials = ds.map_batches(BatchTopK, fn_constructor_args=(qref, iref, k),
                              batch_format="pyarrow", concurrency=(1, 4))
    return _final_topk(partials, k).select_columns(["query_id", "vec_id", "rank"])


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate variant
# ---------------------------------------------------------------------------

def kmeans_lite(sample: np.ndarray, ncell: int, iters: int = 8,
                seed: int = 42) -> np.ndarray:
    """Seeded Lloyd iterations on a driver-side sample -> normalized centroids."""
    rng = np.random.Generator(np.random.PCG64(seed))
    X = _normalize(sample)
    C = X[rng.choice(len(X), size=min(ncell, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def kmeans_distributed(ds: ray.data.Dataset, ncell: int, iters: int = 8,
                       seed: int = 42, init_sample: int = 4096) -> np.ndarray:
    """Distributed Lloyd iterations: per-block partial (sum, count) per
    cell via ``map_batches``, reduced ON THE DRIVER in sorted-block
    order, so for a FIXED input block layout the accumulation order —
    and therefore the centroids — are reproducible run-to-run. (A
    different block layout regroups the float partial sums, so results
    are layout-stable, not layout-independent.) The per-iteration
    exchange is ncell x dim floats per block, never the corpus.
    """
    # materialize once: each Lloyd iteration re-executes `ds`, which for
    # a lazy upstream pipeline would otherwise recompute it iters times
    ds = ds.materialize()
    init = np.stack(ds.limit(init_sample).to_pandas()["embedding"].to_numpy())
    C = kmeans_lite(init, ncell, iters=0, seed=seed)  # shared seeding only
    dim = C.shape[1]
    for _ in range(iters):
        cref = ray.put(C)

        def partials(batch: pa.Table) -> pa.Table:
            empty = pa.table({
                "block_key": pa.array([], pa.int64()),
                "sums": pa.array([], pa.list_(pa.float64())),
                "counts": pa.array([], pa.list_(pa.int64())),
            })
            if batch.num_rows == 0:
                return empty
            Cc = ray.get(cref)
            E = _normalize(np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)))
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            assign = (E @ Cc.T).argmax(axis=1)
            cnts = np.bincount(assign, minlength=len(Cc)).astype(np.int64)
            sums = np.zeros((len(Cc), E.shape[1]))
            np.add.at(sums, assign, E)
            return pa.table({
                "block_key": pa.array([int(ids.min())], pa.int64()),
                "sums": pa.array([sums.ravel().tolist()],
                                 pa.list_(pa.float64())),
                "counts": pa.array([cnts.tolist()], pa.list_(pa.int64())),
            })

        parts = []
        for b in ds.map_batches(partials, batch_format="pyarrow",
                                batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            t = b if isinstance(b, pa.Table) else pa.table(b)
            if t.num_rows == 0:
                continue
            keys = t.column("block_key").to_numpy(zero_copy_only=False)
            sums = t.column("sums").combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).reshape(-1, len(C), dim)
            cnts = t.column("counts").combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).reshape(-1, len(C))
            for r in range(t.num_rows):
                parts.append((int(keys[r]), sums[r], cnts[r]))
        parts.sort(key=lambda p: p[0])          # reproducible reduce order
        total_s = np.zeros_like(C)
        total_c = np.zeros(len(C), np.int64)
        for _, s, c in parts:
            total_s += s
            total_c += c
        nz = total_c > 0
        C = C.copy()
        C[nz] = total_s[nz] / total_c[nz, None]
        C = _normalize(C)
    return C


class IVFAssign:
    """map_batches actor: append nearest-centroid cell id."""

    def __init__(self, cent_ref):
        self.C = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _normalize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        cell = (E @ self.C.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))


def ivf_topk(ds: ray.data.Dataset, query_ids: list[int], k: int = 5,
             ncell: int = 16, nprobe: int = 4, sample_n: int = 4096,
             distributed_kmeans: bool = False) -> ray.data.Dataset:
    """IVF top-k: restrict scoring to rows in the nprobe cells closest to
    each query. One extra narrow column rides along; no extra shuffle —
    the probe filter happens inside the same scoring stage."""
    if distributed_kmeans:
        C = kmeans_distributed(ds, ncell, init_sample=sample_n)
    else:
        sample = np.stack(
            ds.limit(sample_n).to_pandas()["embedding"].to_numpy())
        C = kmeans_lite(sample, ncell)
    cref = ray.put(C)
    qids, Q = load_queries(ds, query_ids)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    qref, iref, pref = ray.put(Q), ray.put(qids), ray.put(probe)

    class ProbedTopK(BatchTopK):
        def __init__(self, queries_ref, qids_ref, k, cent_ref, probe_ref):
            super().__init__(queries_ref, qids_ref, k)
            self.C = ray.get(cent_ref)
            self.probe = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            E = _normalize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
            cell = (E @ self.C.T).argmax(axis=1)
            sims = self.Q @ E.T
            out_q, out_v, out_s = [], [], []
            for qi in range(sims.shape[0]):
                mask = np.isin(cell, self.probe[qi])
                if not mask.any():
                    continue
                row = sims[qi][mask]
                sub_ids = ids[mask]
                kk = min(self.k, len(row))
                part = np.argpartition(-row, kk - 1)[:kk]
                order = part[np.lexsort((sub_ids[part], -row[part]))]
                out_q.extend([self.qids[qi]] * len(order))
                out_v.extend(sub_ids[order].tolist())
                out_s.extend(row[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    partials = ds.map_batches(
        ProbedTopK, fn_constructor_args=(qref, iref, k, cref, pref),
        batch_format="pyarrow", concurrency=(1, 4))
    return _final_topk(partials, k).select_columns(["query_id", "vec_id", "rank"])
