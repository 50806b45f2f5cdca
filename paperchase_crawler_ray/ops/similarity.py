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


def _deref(x):
    """Accept an ObjectRef or a plain value: task-based stages pass
    small state directly in the closure; actor-pool stages still pass
    ``ray.put`` refs resolved once per actor."""
    return ray.get(x) if isinstance(x, ray.ObjectRef) else x


class BatchTopK:
    """map_batches TASK-based stage (instance shipped in the closure —
    the query matrix is KBs): cosine scores vs the queries, per-batch
    top-k partial results (query_id, vec_id, sim)."""

    def __init__(self, queries, qids, k: int):
        self.Q = _deref(queries)             # (q, d) normalized float64
        self.qids = _deref(qids)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        E = _normalize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        sims = self.Q @ E.T                  # (q, b)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # partial top-k under the TOTAL order (sim desc, vec_id asc):
            # an argpartition cut by sim alone keeps an arbitrary subset
            # of boundary TIES, making survivors depend on block layout;
            # selection under a total order is associative, so
            # partial-then-final equals global for any partitioning
            order = np.lexsort((ids, -row))[:k]
            out_q.extend([self.qids[qi]] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })


def _final_topk(partials: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Global per-query top-k over the per-block partials (already only
    O(num_blocks * k) rows): per-group ROW_NUMBER on the stitched-sort
    kernel under the same total order as the partials (sim desc,
    vec_id asc), then a vectorized rank<=k filter — no per-group pandas
    ``map_groups`` anywhere on the reduce."""
    import pyarrow.compute as pc

    from .relational import grouped_rank
    ranked = grouped_rank(partials, "query_id",
                          [("sim", True), ("vec_id", False)],
                          out_col="rank")

    def take(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less_equal(b.column("rank"), pa.scalar(k)))
        i = t.schema.get_field_index("rank")
        return t.set_column(i, "rank", pc.cast(t.column("rank"), pa.int64()))

    return ranked.map_batches(take, batch_format="pyarrow")


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
    # task-based instance: the query matrix is KBs, so shipping it in
    # the task closure beats paying actor-pool spin-up (measured ~3-5s
    # of the sweep's per-query wall on a small corpus)
    partials = ds.map_batches(BatchTopK(Q, qids, k),
                              batch_format="pyarrow")
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


def seeded_vector_sample(ds: ray.data.Dataset, n: int, seed: int = 42,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> np.ndarray:
    """Layout-INDEPENDENT training sample: the ``n`` rows whose seeded
    hash of ``id_col`` is smallest, returned as a (n, dim) matrix in
    ascending-id order. Unlike ``limit(n)`` (which picks whichever rows
    the current block layout streams first), the selected row SET is a
    pure function of (ids, seed) — identical across any repartitioning
    of the same data, so IVF / PQ / k-means training that starts from
    it is reproducible across layouts.

    Scale shape: per-batch prune to the n smallest hashes (the
    ``global_topk`` prune pattern), then one small sort+limit over the
    pruned plane — ≤ n rows per block cross the exchange, never the
    corpus."""
    from .sketch import _mix64

    smix = _mix64(np.array([np.int64(seed)], np.int64).view(np.uint64))[0]

    def prune(b: pa.Table) -> pa.Table:
        t = b.select([id_col, vec_col])
        if b.num_rows == 0:
            return t.append_column("_pri", pa.array([], pa.int64()))
        ids = b.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pri = _mix64(ids.view(np.uint64) ^ smix).view(np.int64)
        if len(pri) > n:
            idx = np.argpartition(pri, n - 1)[:n]
        else:
            idx = np.arange(len(pri))
        idx = idx[np.argsort(pri[idx], kind="stable")]
        return t.take(pa.array(idx)).append_column(
            "_pri", pa.array(pri[idx], pa.int64()))

    top = ds.map_batches(prune, batch_format="pyarrow") \
        .sort("_pri").limit(n).to_pandas().sort_values(id_col)
    return np.stack(top[vec_col].to_numpy())


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
    init = seeded_vector_sample(ds, init_sample, seed=seed)
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
    """map_batches stage: append nearest-centroid cell id (ref or
    plain centroids; see `_deref`)."""

    def __init__(self, cent):
        self.C = _deref(cent)

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
        C = kmeans_lite(seeded_vector_sample(ds, sample_n), ncell)
    qids, Q = load_queries(ds, query_ids)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)

    class ProbedTopK(BatchTopK):
        def __init__(self, queries_ref, qids_ref, k, cent_ref, probe_ref):
            super().__init__(queries_ref, qids_ref, k)
            self.C = _deref(cent_ref)
            self.probe = _deref(probe_ref)

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
                # total-order selection — see BatchTopK tie note
                order = np.lexsort((sub_ids, -row))[:kk]
                out_q.extend([self.qids[qi]] * len(order))
                out_v.extend(sub_ids[order].tolist())
                out_s.extend(row[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    partials = ds.map_batches(ProbedTopK(Q, qids, k, C, probe),
                              batch_format="pyarrow")
    return _final_topk(partials, k).select_columns(["query_id", "vec_id", "rank"])


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale path: vectors become m
# uint8 codes (64x compression at d=64/m=8), queries score via ADC
# table lookups instead of full-precision matmuls. Completes the ANN
# ladder: brute force (exact) -> IVF (prune cells) -> PQ (compress
# residency); IVF-PQ composes the two.
# ---------------------------------------------------------------------------

def pq_train(ds: ray.data.Dataset, m: int = 8, ksub: int = 16,
             sample_n: int = 4096, iters: int = 8, seed: int = 42
             ) -> np.ndarray:
    """Per-subspace Lloyd k-means codebooks (m, ksub, d/m) from a
    driver-side sample (same sample policy as IVF's centroid fit;
    deterministic seeded init per subspace). Vectors are L2-normalized
    first so ADC inner products approximate cosine."""
    # seeded hash-sample: the training row SET and its order are a
    # function of (vec_id, seed) only — layout-independent
    X = _normalize(seeded_vector_sample(ds, sample_n, seed=seed))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), np.float64)
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        rng = np.random.Generator(np.random.PCG64(seed + j))
        C = sub[rng.choice(len(sub), size=min(ksub, len(sub)),
                           replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(len(C)):
                mem = sub[assign == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books[j] = C
    return books


class PQEncode:
    """map_batches stage: vector -> m uint8 codes (one fixed-size
    binary column). Accepts codebooks as a ref (actor-pool path,
    resolved once per actor) or plain (task path)."""

    def __init__(self, books):
        self.books = _deref(books)

    def codes(self, E: np.ndarray) -> np.ndarray:
        m, ksub, dsub = self.books.shape
        out = np.empty((len(E), m), np.uint8)
        for j in range(m):
            sub = E[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - self.books[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _normalize(np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False)))
        codes = self.codes(E)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "pq_code": pa.array([c.tobytes() for c in codes], pa.binary())})


def pq_encode(ds: ray.data.Dataset, books: np.ndarray,
              concurrency: int = 4) -> ray.data.Dataset:
    bref = ray.put(books)
    return ds.map_batches(PQEncode, fn_constructor_args=(bref,),
                          batch_format="pyarrow",
                          concurrency=(1, concurrency))


def pq_topk(ds: ray.data.Dataset, query_ids: list[int], k: int = 5,
            m: int = 8, ksub: int = 16, sample_n: int = 4096,
            rerank_factor: int = 4) -> ray.data.Dataset:
    """Approximate cosine top-k via asymmetric distance computation
    with exact shortlist refinement: each query precomputes an
    (m, ksub) inner-product table against the codebooks, every block
    row is scored with m uint8 lookups + a sum, and only the ADC top
    ``rerank_factor * k`` per block get full-precision dot products
    (FAISS-style refine). Same partial-topk -> _final_topk reduce shape
    as brute force (O(blocks x k) exchange)."""
    books = pq_train(ds, m=m, ksub=ksub, sample_n=sample_n)
    qids, Q = load_queries(ds, query_ids)
    # ADC tables: table[q, j, c] = <Q[q]_subj, books[j, c]>
    mq, d = Q.shape
    dsub = d // m
    tables = np.einsum("qjd,jcd->qjc",
                       Q.reshape(mq, m, dsub), books)
    class ADCTopK(PQEncode):
        def __init__(self, books_ref, tables_ref, qids_ref, q_ref, k,
                     rerank):
            super().__init__(books_ref)
            self.tables = _deref(tables_ref)
            self.qids = _deref(qids_ref)
            self.Q = _deref(q_ref)
            self.k = k
            self.rerank = rerank

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            E = _normalize(np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)))
            codes = self.codes(E)                      # (b, m)
            out_q, out_v, out_s = [], [], []
            kk = min(self.k, len(ids))
            short = min(self.k * self.rerank, len(ids))
            for qi in range(self.tables.shape[0]):
                # ADC prune: sim ~= sum_j table[qi, j, codes[:, j]] —
                # m byte lookups per vector, no full-precision math.
                # Total-order selection: quantized sims tie CONSTANTLY
                # (equal codes -> equal sim), see BatchTopK tie note.
                sims = self.tables[qi][
                    np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
                cand = np.lexsort((ids, -sims))[:short]
                # exact refine, shortlist only (the standard PQ+refine
                # two-stage): full dot products for rerank*k vectors
                # per block instead of every row
                exact = self.Q[qi] @ E[cand].T
                sel = np.lexsort((ids[cand], -exact))[:kk]
                order = cand[sel]
                refined = exact[sel]
                out_q.extend([self.qids[qi]] * len(order))
                out_v.extend(ids[order].tolist())
                out_s.extend(refined.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(
        ADCTopK(books, tables, qids, Q, k, rerank_factor),
        batch_format="pyarrow")
    return _final_topk(partials, k).select_columns(
        ["query_id", "vec_id", "rank"])


def ivfpq_topk(ds: ray.data.Dataset, query_ids: list[int], k: int = 5,
               ncell: int = 16, nprobe: int = 4, m: int = 8,
               ksub: int = 16, sample_n: int = 4096,
               rerank_factor: int = 4) -> ray.data.Dataset:
    """IVF-PQ: the full ANN ladder in one scan — coarse centroids prune
    each query to ``nprobe`` cells, PQ-ADC byte lookups score only the
    surviving rows, and the ADC top ``rerank_factor * k`` per block get
    exact dot products (refine). At 10^9+ vectors this is the
    production shape: the coarse quantizer bounds rows touched, PQ
    bounds bytes per row, refine restores exact ordering on the
    shortlist. Deterministic for a fixed block layout."""
    C = kmeans_lite(_normalize(seeded_vector_sample(ds, sample_n)), ncell)
    books = pq_train(ds, m=m, ksub=ksub, sample_n=sample_n)
    qids, Q = load_queries(ds, query_ids)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    mq, d = Q.shape
    dsub = d // m
    tables = np.einsum("qjd,jcd->qjc", Q.reshape(mq, m, dsub), books)
    class IVFPQTopK(PQEncode):
        def __init__(self, books_ref, cent_ref, tables_ref, qids_ref,
                     q_ref, probe_ref, k, rerank):
            super().__init__(books_ref)
            self.C = _deref(cent_ref)
            self.tables = _deref(tables_ref)
            self.qids = _deref(qids_ref)
            self.Q = _deref(q_ref)
            self.probe = _deref(probe_ref)
            self.k = k
            self.rerank = rerank

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            E = _normalize(np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)))
            cell = (E @ self.C.T).argmax(axis=1)
            codes = self.codes(E)
            out_q, out_v, out_s = [], [], []
            for qi in range(self.tables.shape[0]):
                mask = np.isin(cell, self.probe[qi])
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                sub_codes = codes[mask]
                sims = self.tables[qi][
                    np.arange(sub_codes.shape[1])[None, :],
                    sub_codes].sum(axis=1)
                short = min(self.k * self.rerank, len(sub_ids))
                cand = np.lexsort((sub_ids, -sims))[:short]
                exact = self.Q[qi] @ E[mask][cand].T
                kk = min(self.k, len(cand))
                sel = np.lexsort((sub_ids[cand], -exact))[:kk]
                out_q.extend([self.qids[qi]] * kk)
                out_v.extend(sub_ids[cand[sel]].tolist())
                out_s.extend(exact[sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(
        IVFPQTopK(books, C, tables, qids, Q, probe, k, rerank_factor),
        batch_format="pyarrow")
    return _final_topk(partials, k).select_columns(
        ["query_id", "vec_id", "rank"])


# ---------------------------------------------------------------------------
# PCA / whitening: embedding decorrelation for retrieval + dedup pipelines
# ---------------------------------------------------------------------------

def embedding_moments(ds: ray.data.Dataset, vec_col: str = "embedding"
                      ) -> tuple[int, np.ndarray, np.ndarray]:
    """One streaming pass -> (n, sum, X^T X): the sufficient statistics
    for mean/covariance. Each block emits a (dim + dim^2)-float partial
    regardless of its row count, so the driver reduce is O(blocks *
    dim^2) — 132 KB per block at dim=128. Partials are reduced in
    sorted order to keep the float sum deterministic for a given
    partitioning; a distributed tree-merge would break that determinism
    (float addition does not commute bit-wise), so for very large block
    counts coarsen FIRST with ``ds.repartition(num_blocks=...)`` (one
    unkeyed rebalance) to keep blocks x dim^2 driver-feasible — e.g.
    <= 10^4 blocks at dim 512."""
    def partial(batch: pa.Table) -> pa.Table:
        E = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        s = E.sum(axis=0)
        g = E.T @ E
        return pa.table({
            "n": pa.array([E.shape[0]], pa.int64()),
            "s": pa.array([s.tobytes()], pa.binary()),
            "g": pa.array([g.tobytes()], pa.binary())})

    parts = []
    for b in ds.select_columns([vec_col]) \
            .map_batches(partial, batch_format="pyarrow", batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for i in range(t.num_rows):
            parts.append((t.column("n")[i].as_py(),
                          t.column("s")[i].as_py(), t.column("g")[i].as_py()))
    if not parts:
        raise ValueError("empty dataset")
    parts.sort(key=lambda p: (p[0], p[1]))
    n = sum(p[0] for p in parts)
    dim = len(np.frombuffer(parts[0][1], np.float64))
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for pn, ps, pg in parts:
        s += np.frombuffer(ps, np.float64)
        g += np.frombuffer(pg, np.float64).reshape(dim, dim)
    return n, s, g


def pca_fit(ds: ray.data.Dataset, vec_col: str = "embedding",
            k: int = 8, whiten: bool = False, eps: float = 1e-9
            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA from one distributed moments pass: returns (mean,
    components [k x dim], explained_variance [k]). Components' signs
    are canonicalized (largest-|coef| coordinate positive) so the fit
    is reproducible across runs. ``whiten`` scales components by
    1/sqrt(var) so projected coordinates have unit variance."""
    n, s, g = embedding_moments(ds, vec_col)
    if n < 2:
        raise ValueError("need >= 2 vectors to fit PCA")
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # k x dim
    var = np.clip(vals[order], 0.0, None)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    if whiten:
        comps = comps / np.sqrt(var + eps)[:, None]
    return mu, comps, var


def pca_transform(ds: ray.data.Dataset, mu: np.ndarray, comps: np.ndarray,
                  vec_col: str = "embedding", out_col: str = "pca",
                  round_dp: int | None = None) -> ray.data.Dataset:
    """Project every embedding onto the fitted components: stateless
    vectorized map, fit broadcast once via ``ray.put``."""
    import ray as _ray
    ref = _ray.put((mu.astype(np.float64), comps.astype(np.float64)))

    def project(batch: pa.Table) -> pa.Table:
        bmu, bc = _ray.get(ref)
        E = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        P = (E - bmu) @ bc.T
        if round_dp is not None:
            P = np.round(P, round_dp)
        keep = [c for c in batch.column_names if c != vec_col]
        out = batch.select(keep)
        return out.append_column(out_col,
                                 pa.array(list(P), pa.list_(pa.float64())))

    return ds.map_batches(project, batch_format="pyarrow")
