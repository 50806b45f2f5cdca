"""Mergeable sketches for 100-TB-scale profiling: HyperLogLog
approximate distinct count (Flajolet et al. 2007, with the standard
small-range correction).

Shape: every block folds into ONE fixed 2^p-byte register array inside
``map_batches`` (a combiner — no key shuffle at all), the per-block
registers form a tiny ``num_blocks``-row dataset, and the driver merges
byte-max arrays measured in KB. This is the canonical "aggregate 10^12
rows with zero all-to-all" pattern; the same partial/merge skeleton fits
any mergeable sketch (KMV, theta, count-min).

Deterministic by construction: the value hash is a fixed splitmix64-style
mixer (public constants), so the estimate is reproducible across runs
and cluster sizes — pytest pins both the tolerance AND the exact value.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants): int64/uint64
    column -> well-distributed uint64, fully vectorized."""
    z = x.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= _C1
    z ^= z >> np.uint64(27)
    z *= _C2
    z ^= z >> np.uint64(31)
    return z


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hashes of an Arrow column: numeric columns go through the
    vectorized mixer; strings/binary through blake2b (per distinct-ish
    row, the one unavoidable Python loop for variable-width data)."""
    if pa.types.is_integer(col.type):
        return _mix64(col.to_numpy(zero_copy_only=False).astype(np.int64)
                      .view(np.uint64))
    if pa.types.is_floating(col.type):
        return _mix64(col.to_numpy(zero_copy_only=False)
                      .astype(np.float64).view(np.uint64))
    vals = col.to_pylist()
    out = np.empty(len(vals), np.uint64)
    for i, v in enumerate(vals):
        b = (str(v) if not isinstance(v, bytes) else v)
        if isinstance(b, str):
            b = b.encode("utf-8")
        out[i] = int.from_bytes(
            hashlib.blake2b(b, digest_size=8).digest(), "big")
    return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros over uint64 (6 binary
    halving passes — no float round-off near powers of two)."""
    n = np.zeros(x.shape, np.int64)
    y = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (y >> np.uint64(64 - shift)) == 0
        n[mask] += shift
        y[mask] <<= np.uint64(shift)
    return n


def hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Fold uint64 hashes into a 2^p uint8 register array (max leading
    rank per bucket), fully vectorized."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    # low-p sentinel bits bound clz at 64-p, so rank <= 64-p+1 for free
    rest = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)
    rank = (_clz64(rest) + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


class _HLLPartial:
    """map_batches combiner: one register array per BATCH (rows never
    leave the block; output is 2^p bytes regardless of batch size)."""

    def __init__(self, col: str, p: int):
        self.col, self.p = col, p

    def __call__(self, batch: pa.Table) -> pa.Table:
        regs = hll_registers(_hash_column(batch.column(self.col)), self.p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def approx_distinct(ds: ray.data.Dataset, col: str,
                    p: int = 14) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT col) via HyperLogLog (relative error
    ~= 1.04 / sqrt(2^p); p=14 -> ~0.8%). Returns a one-row Dataset
    ``{column, approx_distinct}``.

    At 100 TB / 128 MB blocks the partials are ~800k x 16 KB; a
    byte-max ``map_batches`` pass first folds each partial-block GROUP
    into one array (distributed), so the driver's final fold sees only
    as many 16 KB arrays as there are merge tasks, not input blocks."""
    partials = ds.map_batches(_HLLPartial, fn_constructor_args=(col, p),
                              batch_format="pyarrow", batch_size=None,
                              concurrency=(1, 8))

    def merge(batch: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, np.uint8)
        for b in batch.column("regs").to_pylist():
            np.maximum(regs, np.frombuffer(b, np.uint8), out=regs)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    # two-level reduce: block partials -> per-task merges -> one array
    merged = partials.map_batches(merge, batch_format="pyarrow",
                                  batch_size=None)
    final = np.zeros(1 << p, np.uint8)
    for b in merged.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.column("regs").to_pylist():
            np.maximum(final, np.frombuffer(r, np.uint8), out=final)
    est = int(round(hll_estimate(final)))
    return ray.data.from_arrow(pa.table({
        "column": pa.array([col], pa.string()),
        "approx_distinct": pa.array([est], pa.int64())}))


class _HLLGroupPartial:
    """map_batches combiner for the GROUPED sketch: one register array
    per (block, group) — rows never leave the block; output is
    |groups-in-block| x 2^p bytes regardless of row count."""

    def __init__(self, group_col: str, col: str, p: int):
        self.group_col, self.col, self.p = group_col, col, p

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = 1 << self.p
        h = _hash_column(batch.column(self.col))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(m - 1)
        rank = (_clz64(rest) + 1).astype(np.uint8)
        gvals, ginv = np.unique(
            np.asarray(batch.column(self.group_col).to_pylist(),
                       dtype=object), return_inverse=True)
        # one flat maximum.at over (group_index * m + register_index)
        regs = np.zeros(len(gvals) * m, np.uint8)
        np.maximum.at(regs, ginv * m + idx, rank)
        gtype = batch.schema.field(self.group_col).type
        return pa.table({
            self.group_col: pa.array(gvals.tolist(), gtype),
            "regs": pa.array([regs[i * m:(i + 1) * m].tobytes()
                              for i in range(len(gvals))], pa.binary())})


def approx_distinct_by(ds: ray.data.Dataset, group_col: str, col: str,
                       p: int = 12,
                       num_partitions: int = 16) -> ray.data.Dataset:
    """Approximate per-group COUNT(DISTINCT col) — HyperLogLog per
    group key (relative error ~= 1.04 / sqrt(2^p); p=12 -> ~1.6%).
    Returns ``{group_col, approx_distinct}`` with one row per group.

    Scale shape (the grouped twin of ``approx_distinct``): every block
    folds its rows into one 2^p-byte register array PER GROUP IN THE
    BLOCK (a combiner — one vectorized ``maximum.at`` over a flattened
    (group x register) plane), so the ONE group-keyed exchange carries
    ``groups-per-block x blocks`` fixed-size rows, never the input
    rows; co-located registers byte-max inside whole blocks. At 10^10
    rows x 10^4 groups that is MBs on the wire where the exact
    distinct would shuffle the corpus. Deterministic across runs and
    cluster sizes (fixed mixer + order-free byte max)."""
    from .dedup import _hash_shuffle
    from .relational import cap_join_partitions

    pre = ds.map_batches(_HLLGroupPartial,
                         fn_constructor_args=(group_col, col, p),
                         batch_format="pyarrow", batch_size=None,
                         concurrency=(1, 8))

    def merge_block(batch: pa.Table) -> pa.Table:
        m = 1 << p
        gvals, ginv = np.unique(
            np.asarray(batch.column(group_col).to_pylist(), dtype=object),
            return_inverse=True)
        regs = np.zeros((len(gvals), m), np.uint8)
        for gi, blob in zip(ginv, batch.column("regs").to_pylist()):
            np.maximum(regs[gi], np.frombuffer(blob, np.uint8),
                       out=regs[gi])
        est = pa.array([int(round(hll_estimate(regs[i])))
                        for i in range(len(gvals))], pa.int64())
        gtype = batch.schema.field(group_col).type
        return pa.table({group_col: pa.array(gvals.tolist(), gtype),
                         "approx_distinct": est})

    with _hash_shuffle(pre):
        return pre.repartition(
            num_blocks=cap_join_partitions(num_partitions),
            keys=[group_col]) \
            .map_batches(merge_block, batch_format="pyarrow",
                         batch_size=None).materialize()


class _KMVPartial:
    """map_batches combiner: the k smallest DISTINCT value hashes per
    block (fixed k x 8 bytes out regardless of block size)."""

    def __init__(self, col: str, k: int):
        self.col, self.k = col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = np.unique(_hash_column(batch.column(self.col)))
        return pa.table({"kmv": pa.array([h[:self.k].tobytes()],
                                         pa.binary())})


def _kmv_sketch(ds: ray.data.Dataset, col: str, k: int) -> np.ndarray:
    """Distributed KMV sketch of one column: per-block partials (each
    k x 8 bytes), a distributed pairwise-merge pass, then a driver fold
    over O(merge-tasks) arrays — the exact skeleton of
    ``approx_distinct``, with sorted-unique-truncate as the merge."""
    partials = ds.map_batches(_KMVPartial, fn_constructor_args=(col, k),
                              batch_format="pyarrow", batch_size=None,
                              concurrency=(1, 8))

    def merge(batch: pa.Table) -> pa.Table:
        arrs = [np.frombuffer(b, np.uint64)
                for b in batch.column("kmv").to_pylist()]
        h = np.unique(np.concatenate(arrs)) if arrs \
            else np.array([], np.uint64)
        return pa.table({"kmv": pa.array([h[:k].tobytes()], pa.binary())})

    merged = partials.map_batches(merge, batch_format="pyarrow",
                                  batch_size=None)
    final = np.array([], np.uint64)
    for b in merged.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("kmv").to_pylist():
            final = np.unique(np.concatenate(
                [final, np.frombuffer(blob, np.uint64)]))[:k]
    return final


def _kmv_estimate(sk: np.ndarray, k: int) -> float:
    """KMV distinct estimator: exact below k values, else (k-1)/h_k
    with hashes normalized to [0, 1) (Bar-Yossef et al. 2002 /
    Beyer et al. 2007)."""
    if len(sk) < k:
        return float(len(sk))
    hk = float(sk[k - 1]) / 2.0 ** 64
    return (k - 1) / hk if hk > 0 else float(k)


def approx_overlap(ds_a: ray.data.Dataset, col_a: str,
                   ds_b: ray.data.Dataset, col_b: str | None = None,
                   k: int = 4096) -> ray.data.Dataset:
    """Approximate DISTINCT-set overlap between two columns via KMV
    sketches: one row ``{distinct_a, distinct_b, distinct_union,
    distinct_intersection, jaccard}``. Relative error ~ 1/sqrt(k)
    (k=4096 -> ~1.6%); EXACT whenever |A ∪ B| has fewer than k
    distinct values (then BOTH sketches and their union are the full
    hash sets — per-side counts alone being under k is NOT sufficient:
    two disjoint 3k-distinct sides still truncate the union at k).

    The corpus-contamination measurement at 100 TB: each side folds to
    k x 8-byte block partials with zero all-to-all (the
    ``approx_distinct`` skeleton), so comparing two 10^10-row corpora
    moves O(blocks x k x 8) bytes — no join, no shuffle, and the two
    sides can live in different tables/formats. Deterministic and
    partitioning-invariant (fixed mixer; sorted-unique merges are
    order-free). Jaccard = |K(A∪B) ∩ A_sk ∩ B_sk| / |K(A∪B)| (the
    standard KMV set-operation estimator); intersection = jaccard x
    union estimate."""
    col_b = col_b or col_a
    sa = _kmv_sketch(ds_a, col_a, k)
    sb = _kmv_sketch(ds_b, col_b, k)
    union = np.unique(np.concatenate([sa, sb]))[:k]
    both = np.intersect1d(sa, sb, assume_unique=True)
    n_shared = int(np.isin(union, both, assume_unique=True).sum())
    jac = n_shared / len(union) if len(union) else 1.0
    est_u = _kmv_estimate(union, k)
    return ray.data.from_arrow(pa.table({
        "distinct_a": pa.array([int(round(_kmv_estimate(sa, k)))],
                               pa.int64()),
        "distinct_b": pa.array([int(round(_kmv_estimate(sb, k)))],
                               pa.int64()),
        "distinct_union": pa.array([int(round(est_u))], pa.int64()),
        "distinct_intersection": pa.array([int(round(jac * est_u))],
                                          pa.int64()),
        "jaccard": pa.array([round(jac, 6)], pa.float64())}))


# ---------------------------------------------------------------------------
# Bloom filter: broadcastable membership sketch for join pruning
# ---------------------------------------------------------------------------

_BLOOM_SEED = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _bloom_positions(hashes: np.ndarray, n_bits: int, k: int):
    """Double hashing (Kirsch & Mitzenmacher 2006): k probe positions
    from two base hashes, vectorized — yields one (len,) index array per
    probe round."""
    h1 = hashes
    h2 = _mix64(hashes ^ _BLOOM_SEED) | np.uint64(1)  # odd -> full cycle
    nb = np.uint64(n_bits)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % nb).astype(np.int64)


def bloom_build(ds: ray.data.Dataset, col: str, n_bits: int = 1 << 23,
                k: int = 5) -> np.ndarray:
    """Build a Bloom filter over ``col`` as a uint64 word array
    (``n_bits/8`` bytes total, e.g. 1 MB at the default 2^23 bits).

    Per-block partials are each a full bitmask ORed on the driver —
    fine while blocks are few; the point of the sketch is the FILTER is
    tiny and broadcastable even when the key SET is not. With default
    params, ~500k keys -> fpp ~= 0.9%."""
    n_words = (n_bits + 63) // 64

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, np.uint64)
        h = _hash_column(batch.column(col))
        for idx in _bloom_positions(h, n_bits, k):
            np.bitwise_or.at(words, idx >> 6,
                             np.uint64(1) << (idx & 63).astype(np.uint64))
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def or_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, np.uint64)
        for w in batch.column("words").to_pylist():
            np.bitwise_or(acc, np.frombuffer(w, np.uint64), out=acc)
        return pa.table({"words": pa.array([acc.tobytes()], pa.binary())})

    # tree-reduce the per-block masks DISTRIBUTED (OR is commutative and
    # idempotent, so any grouping is deterministic): two 64-way rounds
    # cut blocks -> blocks/4096 before the driver's final OR — a 100-TB
    # input's ~1e6 x 1 MB partials never funnel into one process
    for _ in range(2):
        parts = parts.map_batches(or_merge, batch_format="pyarrow",
                                  batch_size=64)
    out = np.zeros(n_words, np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for w in b.column("words").to_pylist():
            np.bitwise_or(out, np.frombuffer(w, np.uint64), out=out)
    return out


def bloom_contains(words: np.ndarray, hashes: np.ndarray, n_bits: int,
                   k: int) -> np.ndarray:
    """Vectorized membership probe: bool mask (no false negatives)."""
    mask = np.ones(len(hashes), bool)
    for idx in _bloom_positions(hashes, n_bits, k):
        mask &= ((words[idx >> 6] >> (idx & 63).astype(np.uint64))
                 & np.uint64(1)).astype(bool)
    return mask


def bloom_semi_join(big: ray.data.Dataset, key: str,
                    small: ray.data.Dataset, small_key: str,
                    n_bits: int = 1 << 23, k: int = 5,
                    verify: bool = True) -> ray.data.Dataset:
    """Semi join with a Bloom pre-filter: build a ~MB filter over the
    build side, broadcast it once (``ray.put``), prune the probe side
    INSIDE ``map_batches`` (no shuffle touches the pruned-away rows),
    then run the exact semi join on the survivors only.

    The 100-TB shape: the probe side never shuffles non-matching rows —
    at a 1% match rate the exact join sees ~2% of the input (matches +
    fpp) instead of 100%. Result is EXACT (bloom has no false
    negatives; ``verify`` removes the false positives). ``verify=False``
    returns the approximate superset for callers that re-check later."""
    words = bloom_build(small, small_key, n_bits, k)
    ref = ray.put(words)

    def prune(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        h = _hash_column(batch.column(key))
        return batch.filter(pa.array(bloom_contains(w, h, n_bits, k)))

    pruned = big.map_batches(prune, batch_format="pyarrow")
    if not verify:
        return pruned
    from .relational import semi_join
    return semi_join(pruned, key, small, small_key)


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidate pass + exact counting pass
# ---------------------------------------------------------------------------

def _mg_truncate(ids: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra-Gries truncation: keep <= capacity counters by subtracting
    the (capacity+1)-th largest count from all (Agarwal et al. 2013
    mergeable-summaries rule). Guarantees kept_count >= true - n/(cap+1)."""
    if len(ids) <= capacity:
        return ids, counts
    kth = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1]
    adj = counts - kth
    keep = adj > 0
    return ids[keep], adj[keep]


def heavy_hitters(ds: ray.data.Dataset, col: str, threshold: int,
                  capacity: int = 4096,
                  total_n: int | None = None) -> ray.data.Dataset:
    """EXACT frequent items: all values of ``col`` with count >
    ``threshold``, via a Misra-Gries sketch pass + a counting pass
    restricted to the sketch's candidates.

    Pass 1 folds every block into <= ``capacity`` (value, count)
    counters (np.unique — vectorized, MG-truncated), then the partial
    counters are summed with a DISTRIBUTED groupby (the exchange is
    <= capacity rows per block, never the column's cardinality) and the
    candidate filter runs inside map_batches — only survivors reach the
    driver. Soundness: MG truncation undercounts any item by at most
    floor(n_block/(capacity+1)) per block, and the floors sum to at
    most floor(n/(capacity+1)) = slack, so every item with true count >
    threshold keeps summed count > threshold - slack; filtering
    ``sum + slack > threshold`` is therefore a SUPERSET of the true
    heavy hitters (#candidates <= n/(threshold - slack), small by the
    precondition). Pass 2 re-scans with an ``isin`` filter on that set
    and counts exactly. Requires threshold > n/(capacity+1) to be exact
    (else raises): pick capacity >= n/threshold. Null keys are excluded
    (fill beforehand to count them as a group).

    ``total_n``: optional UPPER BOUND on the non-null row count (e.g. a
    metadata-only ``ds.count()`` straight off a parquet read) — skips
    the dedicated counting scan. Any upper bound is sound: a larger n
    only inflates ``slack``, which widens the candidate SUPERSET (and
    tightens the exactness precondition); pass 2 counts exactly either
    way."""
    from .relational import count_non_null

    def partial(batch: pa.Table) -> pa.Table:
        a = batch.column(col)
        if a.null_count:
            batch = batch.filter(pc.is_valid(a))
        item_type = batch.column(col).type
        v = batch.column(col).to_numpy(zero_copy_only=False)
        ids, counts = np.unique(v, return_counts=True)
        ids, counts = _mg_truncate(ids, counts.astype(np.int64), capacity)
        items = (pa.array(ids).cast(item_type) if len(ids)
                 else pa.nulls(0, item_type))
        return pa.table({"item": items,
                         "c": pa.array(counts, pa.int64())})

    if total_n is None:
        total_n = count_non_null(ds, col)
    slack = total_n // (capacity + 1)
    if threshold <= slack:
        raise ValueError(
            f"threshold {threshold} <= MG slack {slack}; raise capacity")

    summed = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("item").sum("c"))

    def keep_possible(batch: pa.Table) -> pa.Table:
        cname = "sum(c)" if "sum(c)" in batch.column_names else "c"
        m = pc.greater(pc.add(batch.column(cname),
                              pa.scalar(slack, pa.int64())),
                       pa.scalar(threshold, pa.int64()))
        return batch.filter(m)

    cand_items = []
    for b in summed.map_batches(keep_possible, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        cand_items.extend(b.column("item").to_pylist())
    cand = np.array(sorted(cand_items))
    ref = ray.put(cand)

    def count_cand(batch: pa.Table) -> pa.Table:
        # pre-aggregated combiner: the exchange after this carries
        # <= #candidates rows per BLOCK (one (item, c) partial per
        # matching value), never the matching ROWS themselves
        c = ray.get(ref)
        a = batch.column(col)
        if a.null_count:
            batch = batch.filter(pc.is_valid(a))
        item_type = batch.column(col).type
        v = batch.column(col).to_numpy(zero_copy_only=False)
        v = v[np.isin(v, c)]
        ids, counts = np.unique(v, return_counts=True)
        items = (pa.array(ids).cast(item_type) if len(ids)
                 else pa.nulls(0, item_type))
        return pa.table({"item": items,
                         "c2": pa.array(counts.astype(np.int64),
                                        pa.int64())})

    counted = (ds.select_columns([col])
               .map_batches(count_cand, batch_format="pyarrow",
                            batch_size=None)
               .groupby("item").sum("c2"))

    def thresh(batch: pa.Table) -> pa.Table:
        cname = "sum(c2)" if "sum(c2)" in batch.column_names else "c2"
        m = pc.greater(batch.column(cname), pa.scalar(threshold))
        t = batch.filter(m)
        return pa.table({"item": t.column("item"),
                         "n_occurrences": pc.cast(t.column(cname),
                                                  pa.int64())})

    return counted.map_batches(thresh, batch_format="pyarrow")


def heavy_hitters_by(ds: ray.data.Dataset, group_col: str, col: str,
                     threshold: int, capacity: int = 4096,
                     total_n: int | None = None) -> ray.data.Dataset:
    """EXACT grouped frequent items: all ``(group, value)`` pairs with
    count > ``threshold`` — ``heavy_hitters`` with the COMPOSITE
    (group, value) pair as the sketched item, so the identical
    Misra-Gries soundness argument applies with n = total non-null
    rows (slack = n // (capacity+1); requires threshold > slack).

    Per block the pair plane is composed vectorized (two ``np.unique``
    factorizations -> one int64 pair code -> one counting ``unique`` ->
    MG truncate), so the candidate exchange is <= capacity rows per
    block. Pass 2 re-scans restricted to the candidate ITEM set (a
    superset of the heavy pairs' items — membership of the pair itself
    is not needed: every (group, candidate-item) pair gets an exact
    count and the final ``> threshold`` filter decides), with the same
    per-block pre-aggregate combiner. Null group or value rows are
    excluded (fill beforehand to count them)."""
    from .relational import count_non_null

    def _valid(batch: pa.Table) -> pa.Table:
        g, v = batch.column(group_col), batch.column(col)
        if g.null_count or v.null_count:
            batch = batch.filter(pc.and_(pc.is_valid(g), pc.is_valid(v)))
        return batch

    def partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        gtype = batch.schema.field(group_col).type
        itype = batch.schema.field(col).type
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        gu, gi = np.unique(g, return_inverse=True)
        vu, vi = np.unique(v, return_inverse=True)
        code = gi.astype(np.int64) * len(vu) + vi
        cu, counts = np.unique(code, return_counts=True)
        cu, counts = _mg_truncate(cu, counts.astype(np.int64), capacity)
        gs = gu[(cu // max(len(vu), 1))] if len(cu) else gu[:0]
        vs = vu[(cu % max(len(vu), 1))] if len(cu) else vu[:0]
        return pa.table({
            group_col: (pa.array(gs.tolist()).cast(gtype) if len(gs)
                        else pa.nulls(0, gtype)),
            "item": (pa.array(vs.tolist()).cast(itype) if len(vs)
                     else pa.nulls(0, itype)),
            "c": pa.array(counts, pa.int64())})

    if total_n is None:
        total_n = ds.map_batches(
            lambda b: pa.table({"n": pa.array([_valid(b).num_rows],
                                              pa.int64())}),
            batch_format="pyarrow", batch_size=None) \
            .sum("n") or 0
    slack = total_n // (capacity + 1)
    if threshold <= slack:
        raise ValueError(
            f"threshold {threshold} <= MG slack {slack}; raise capacity")

    summed = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby([group_col, "item"]).sum("c"))

    def keep_possible(batch: pa.Table) -> pa.Table:
        cname = "sum(c)" if "sum(c)" in batch.column_names else "c"
        return batch.filter(pc.greater(
            pc.add(batch.column(cname), pa.scalar(slack, pa.int64())),
            pa.scalar(threshold, pa.int64())))

    cand_items: set = set()
    for b in summed.map_batches(keep_possible, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        cand_items.update(b.column("item").to_pylist())
    cand = np.array(sorted(cand_items))
    ref = ray.put(cand)

    def count_cand(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        gtype = batch.schema.field(group_col).type
        itype = batch.schema.field(col).type
        v = batch.column(col).to_numpy(zero_copy_only=False)
        keep = np.isin(v, ray.get(ref))
        batch = batch.filter(pa.array(keep))
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = v[keep]
        gu, gi = np.unique(g, return_inverse=True)
        vu, vi = np.unique(v, return_inverse=True)
        code = gi.astype(np.int64) * max(len(vu), 1) + vi
        cu, counts = np.unique(code, return_counts=True)
        gs = gu[(cu // max(len(vu), 1))] if len(cu) else gu[:0]
        vs = vu[(cu % max(len(vu), 1))] if len(cu) else vu[:0]
        return pa.table({
            group_col: (pa.array(gs.tolist()).cast(gtype) if len(gs)
                        else pa.nulls(0, gtype)),
            "item": (pa.array(vs.tolist()).cast(itype) if len(vs)
                     else pa.nulls(0, itype)),
            "c2": pa.array(counts.astype(np.int64), pa.int64())})

    counted = (ds.select_columns([group_col, col])
               .map_batches(count_cand, batch_format="pyarrow",
                            batch_size=None)
               .groupby([group_col, "item"]).sum("c2"))

    def thresh(batch: pa.Table) -> pa.Table:
        if group_col not in batch.column_names:
            # Ray 2.49 can emit a schema-less empty block from an
            # empty aggregate (zero candidates)
            return pa.table({group_col: pa.nulls(0),
                             "item": pa.nulls(0),
                             "n_occurrences": pa.nulls(0, pa.int64())})
        cname = "sum(c2)" if "sum(c2)" in batch.column_names else "c2"
        t = batch.filter(pc.greater(batch.column(cname),
                                    pa.scalar(threshold)))
        return pa.table({group_col: t.column(group_col),
                         "item": t.column("item"),
                         "n_occurrences": pc.cast(t.column(cname),
                                                  pa.int64())})

    return counted.map_batches(thresh, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Order-independent table checksum: replica/anti-entropy validation
# ---------------------------------------------------------------------------

def table_checksum(ds: ray.data.Dataset, cols: list[str],
                   sep: str = "|") -> ray.data.Dataset:
    """Order- and partitioning-independent content checksum of a column
    projection: per row, md5 of the '|'-joined string forms (DuckDB
    ``md5(concat_ws('|', ...))``-compatible: floats via repr-style %g is
    NOT portable, so callers pass integer/string columns); the top-8
    md5 bytes (signed int64) are SUMMED with wraparound. Addition
    commutes, so any block order / any partitioning / any replica
    yields the same value — the cheap cross-replica validation pass at
    100 TB: one streaming map + an O(blocks) scalar reduce, nothing
    shuffled. Collision-detection strength ~2^-64 per differing table
    pair (adversarial-free setting)."""
    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"s": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        # null cells take a sentinel string form so the checksum is
        # total (never crashes) and null != empty-string; the DuckDB
        # twin for null-bearing columns is
        # COALESCE(CAST(col AS VARCHAR), chr(0) || 'null')
        parts = [pc.fill_null(pc.cast(batch.column(c), pa.string()),
                              "\x00null") for c in cols]
        joined = parts[0]
        for p in parts[1:]:
            joined = pc.binary_join_element_wise(joined, p, sep)
        total = 0
        for s in joined.to_pylist():
            h = hashlib.md5(s.encode()).digest()[:8]
            total = (total + int.from_bytes(h, "big")) \
                & 0xFFFFFFFFFFFFFFFF
        signed = total - (1 << 64) if total >= (1 << 63) else total
        return pa.table({"s": pa.array([signed], pa.int64()),
                         "c": pa.array([n], pa.int64())})

    tot = 0
    rows = 0
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for s, c in zip(b.column("s").to_pylist(), b.column("c").to_pylist()):
            tot = (tot + (s & 0xFFFFFFFFFFFFFFFF)) & 0xFFFFFFFFFFFFFFFF
            rows += c
    signed = tot - (1 << 64) if tot >= (1 << 63) else tot
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([rows], pa.int64()),
        "checksum": pa.array([signed], pa.int64())}))


def approx_quantiles(ds: ray.data.Dataset, col: str,
                     ps: tuple[float, ...] = (0.25, 0.5, 0.75),
                     nbins: int = 8192) -> dict:
    """Mergeable histogram quantile sketch: the 100-TB companion to the
    exact radix selection (which needs ~4 counting passes; this needs
    two map passes total for ANY number of percentiles).

    Pass 1 reduces (min, max, count) per block; pass 2 builds per-block
    fixed-edge histograms, tree-reduced 64-way like the Bloom masks
    (vector add is commutative+associative on int64 counts, so any
    grouping is deterministic). Each percentile maps to its DISCRETE
    rank (quantile_disc semantics: ceil(p*n) clamped to [1, n]); the
    returned value interpolates inside the rank's bin, so the absolute
    error vs the exact discrete quantile is bounded by one bin width,
    (max - min) / nbins over the finite range. (An interpolated-
    quantile target would void that bound: its two bracketing data
    values can straddle empty bins in a sparse tail.) Nulls and NaNs
    are ignored, matching SQL; +/-inf values are counted at the rank
    range's ends and returned exactly.

    Returns {"quantiles": {p: value}, "count": n, "lo": min, "hi": max,
    "bin_width": w}.
    """
    def mm_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)   # None -> nan; ints promote losslessly
        v = v[~np.isnan(v)]       # only NULL/NaN ignored, like SQL
        fin = v[np.isfinite(v)]
        n_neg = int(np.count_nonzero(v == -np.inf))
        n_pos = int(np.count_nonzero(v == np.inf))
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64()),
                             "ninf": pa.array([], pa.int64()),
                             "pinf": pa.array([], pa.int64())})
        return pa.table({
            "lo": pa.array([float(np.min(fin)) if len(fin) else np.nan]),
            "hi": pa.array([float(np.max(fin)) if len(fin) else np.nan]),
            "n": pa.array([int(len(v))], pa.int64()),
            "ninf": pa.array([n_neg], pa.int64()),
            "pinf": pa.array([n_pos], pa.int64())})

    lo = hi = None
    total = n_neginf = n_posinf = 0
    for b in ds.map_batches(mm_partial, batch_format="pyarrow",
                            batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for blo, bhi, bn, bni, bpi in zip(t.column("lo").to_pylist(),
                                          t.column("hi").to_pylist(),
                                          t.column("n").to_pylist(),
                                          t.column("ninf").to_pylist(),
                                          t.column("pinf").to_pylist()):
            if blo == blo:      # nan-safe: block had finite values
                lo = blo if lo is None else min(lo, blo)
                hi = bhi if hi is None else max(hi, bhi)
            total += bn
            n_neginf += bni
            n_posinf += bpi
    if total == 0:
        return {"quantiles": {p: None for p in ps}, "count": 0,
                "lo": None, "hi": None, "bin_width": None}
    if lo is None:              # every non-null value was +/-inf
        qs = {}
        for p in ps:
            target = min(max(int(np.ceil(p * total)), 1), total)
            qs[p] = -np.inf if target <= n_neginf else np.inf
        return {"quantiles": qs, "count": total, "lo": None, "hi": None,
                "bin_width": 0.0}
    if hi == lo and not (n_neginf or n_posinf):
        return {"quantiles": {p: lo for p in ps}, "count": total,
                "lo": lo, "hi": hi, "bin_width": 0.0}
    edges = np.linspace(lo, hi, nbins + 1)

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        v = v[np.isfinite(v)]
        counts, _ = np.histogram(v, bins=edges)
        return pa.table({"c": pa.array([counts.astype(np.int64).tobytes()],
                                       pa.binary())})

    parts = ds.map_batches(hist_partial, batch_format="pyarrow",
                           batch_size=None)

    def add_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(nbins, np.int64)
        for w in batch.column("c").to_pylist():
            acc += np.frombuffer(w, np.int64)
        return pa.table({"c": pa.array([acc.tobytes()], pa.binary())})

    for _ in range(2):      # 64-way tree rounds before the driver sum
        parts = parts.map_batches(add_merge, batch_format="pyarrow",
                                  batch_size=64)
    counts = np.zeros(nbins, np.int64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for w in t.column("c").to_pylist():
            counts += np.frombuffer(w, np.int64)
    cum = np.cumsum(counts)
    n_fin = int(cum[-1])
    out = {}
    for p in ps:
        target = min(max(int(np.ceil(p * total)), 1), total)  # disc rank
        # +/-inf values (counted, never histogrammed) occupy the rank
        # range's two ends
        if target <= n_neginf:
            out[p] = -np.inf
            continue
        if target > n_neginf + n_fin:
            out[p] = np.inf
            continue
        target -= n_neginf
        bin_i = int(np.searchsorted(cum, target))
        bin_i = min(bin_i, nbins - 1)
        prev = cum[bin_i - 1] if bin_i else 0
        inbin = counts[bin_i]
        frac = (target - prev) / inbin if inbin else 0.0
        out[p] = float(edges[bin_i]
                       + (edges[bin_i + 1] - edges[bin_i]) * min(frac, 1.0))
    return {"quantiles": out, "count": int(total), "lo": float(lo),
            "hi": float(hi),
            "bin_width": float((hi - lo) / nbins)}


class _GroupStatsPartial:
    """map_batches combiner for the grouped quantile sketch's pass 1:
    per (block, group) -> (lo, hi, n, ninf, pinf), all via flat
    ``minimum.at``/``maximum.at``/``bincount`` (no per-row loop).
    lo/hi are NULL (not NaN) when the group has no finite value in the
    block, so Ray's Min/Max aggregates skip them."""

    def __init__(self, group_col: str, col: str):
        self.group_col, self.col = group_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        gcol = batch.column(self.group_col)
        if gcol.null_count:
            batch = batch.filter(pc.is_valid(gcol))
        g = np.asarray(batch.column(self.group_col).to_pylist(),
                       dtype=object)
        v = batch.column(self.col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)          # None -> nan; ints promote
        keep = ~np.isnan(v)              # NULL/NaN ignored, like SQL
        g, v = g[keep], v[keep]
        gtype = batch.schema.field(self.group_col).type
        if len(v) == 0:
            return pa.table({self.group_col: pa.nulls(0, gtype),
                             "lo": pa.nulls(0, pa.float64()),
                             "hi": pa.nulls(0, pa.float64()),
                             "n": pa.nulls(0, pa.int64()),
                             "ninf": pa.nulls(0, pa.int64()),
                             "pinf": pa.nulls(0, pa.int64())})
        gu, gi = np.unique(g, return_inverse=True)
        ng = len(gu)
        n = np.bincount(gi, minlength=ng).astype(np.int64)
        ninf = np.bincount(gi[v == -np.inf], minlength=ng).astype(np.int64)
        pinf = np.bincount(gi[v == np.inf], minlength=ng).astype(np.int64)
        fin = np.isfinite(v)
        lo = np.full(ng, np.inf)
        hi = np.full(ng, -np.inf)
        np.minimum.at(lo, gi[fin], v[fin])
        np.maximum.at(hi, gi[fin], v[fin])
        has_fin = np.bincount(gi[fin], minlength=ng) > 0
        return pa.table({
            self.group_col: pa.array(gu.tolist(), gtype),
            "lo": pa.array([float(x) if h else None
                            for x, h in zip(lo, has_fin)], pa.float64()),
            "hi": pa.array([float(x) if h else None
                            for x, h in zip(hi, has_fin)], pa.float64()),
            "n": pa.array(n, pa.int64()),
            "ninf": pa.array(ninf, pa.int64()),
            "pinf": pa.array(pinf, pa.int64())})


def approx_quantiles_by(ds: ray.data.Dataset, group_col: str, col: str,
                        ps: tuple[float, ...] = (0.25, 0.5, 0.75),
                        nbins: int = 2048,
                        num_partitions: int = 16) -> ray.data.Dataset:
    """Per-group mergeable histogram quantile sketch — the grouped twin
    of ``approx_quantiles``, with the same discrete-rank target
    (``quantile_disc``: ceil(p*n) clamped to [1, n]) and the same
    provable bound PER GROUP: |approx - exact discrete quantile| <=
    (hi_g - lo_g) / nbins over each group's finite range. Nulls/NaNs
    ignored; +/-inf counted at the rank ends and returned exactly;
    null group keys excluded. Returns a long-format Dataset
    ``{group_col, p, value, n}`` (one row per group x percentile).

    Scale shape: pass 1 reduces per-(block, group) (lo, hi, n, ninf,
    pinf) combiner rows through a DISTRIBUTED groupby (G result rows
    to the driver -> broadcast once via ``ray.put``; ~40 B/group, so
    10^6 groups is ~40 MB — the op targets group cardinalities that a
    GROUP BY result table must fit anyway). Pass 2 emits SPARSE
    (group, bin, count) rows per block (<= min(nbins, block-rows) per
    group), so the ONE group-keyed exchange carries bounded combiner
    rows, never the input; co-located rows merge with one flat
    ``bincount`` per block and a vectorized per-group CDF walk. At
    10^10 rows x 10^4 groups that is ~MBs on the wire where an exact
    grouped quantile would sort the corpus."""
    from ray.data.aggregate import Max, Min, Sum

    from .dedup import _hash_shuffle
    from .relational import cap_join_partitions

    stats_rows = (ds.map_batches(_GroupStatsPartial,
                                 fn_constructor_args=(group_col, col),
                                 batch_format="pyarrow", batch_size=None,
                                 concurrency=(1, 8))
                  .groupby(group_col)
                  .aggregate(Min("lo"), Max("hi"), Sum("n"),
                             Sum("ninf"), Sum("pinf")))
    stats: dict = {}
    for b in stats_rows.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for r in t.to_pylist():
            stats[r[group_col]] = (r["min(lo)"], r["max(hi)"],
                                   int(r["sum(n)"] or 0),
                                   int(r["sum(ninf)"] or 0),
                                   int(r["sum(pinf)"] or 0))
    gtype = ds.schema().base_schema.field(group_col).type
    ps = tuple(float(p) for p in ps)

    def _quantile_rows(st, gvals, cums, bins_list, counts_list):
        """Vector of output rows for whole groups: gvals with their
        sparse sorted (bins, counts, cum) triples; ``st`` is the
        group-stats mapping (passed explicitly so workers read the
        ray.put broadcast, not a per-task pickled closure copy)."""
        og, op_, ov, on = [], [], [], []
        for gval, cum, bins, counts in zip(gvals, cums, bins_list,
                                           counts_list):
            lo, hi, n, ninf, pinf = st[gval]
            w = (hi - lo) / nbins
            n_fin = int(cum[-1]) if len(cum) else 0
            for p in ps:
                target = min(max(int(np.ceil(p * n)), 1), n)
                if target <= ninf:
                    val = -np.inf
                elif target > ninf + n_fin:
                    val = np.inf
                else:
                    t_ = target - ninf
                    i = int(np.searchsorted(cum, t_))
                    prev = cum[i - 1] if i else 0
                    frac = (t_ - prev) / counts[i] if counts[i] else 0.0
                    val = float(lo + bins[i] * w + w * min(frac, 1.0))
                og.append(gval)
                op_.append(p)
                ov.append(val)
                on.append(n)
        return pa.table({group_col: pa.array(og, gtype),
                         "p": pa.array(op_, pa.float64()),
                         "value": pa.array(ov, pa.float64()),
                         "n": pa.array(on, pa.int64())})

    if not stats:
        return ray.data.from_arrow(_quantile_rows({}, [], [], [], []))

    ref = ray.put(stats)

    def hist_partial(batch: pa.Table) -> pa.Table:
        gcol = batch.column(group_col)
        if gcol.null_count:
            batch = batch.filter(pc.is_valid(gcol))
        g = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keep = np.isfinite(v)            # only finite values binned
        g, v = g[keep], v[keep]
        if len(v) == 0:
            return pa.table({group_col: pa.nulls(0, gtype),
                             "bin": pa.nulls(0, pa.int64()),
                             "c": pa.nulls(0, pa.int64())})
        st = ray.get(ref)
        gu, gi = np.unique(g, return_inverse=True)
        los = np.array([st[x][0] for x in gu], np.float64)
        width = np.array([st[x][1] - st[x][0] for x in gu], np.float64)
        scale = np.where(width > 0, nbins / np.where(width > 0, width, 1.0),
                         0.0)
        b = np.clip(((v - los[gi]) * scale[gi]).astype(np.int64),
                    0, nbins - 1)
        code = gi.astype(np.int64) * nbins + b
        cu, cc = np.unique(code, return_counts=True)
        return pa.table({
            group_col: pa.array(gu[cu // nbins].tolist(), gtype),
            "bin": pa.array(cu % nbins, pa.int64()),
            "c": pa.array(cc.astype(np.int64), pa.int64())})

    pre = ds.map_batches(hist_partial, batch_format="pyarrow",
                         batch_size=None)

    def merge_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _quantile_rows({}, [], [], [], [])
        g = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        bins = batch.column("bin").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        gu, gi = np.unique(g, return_inverse=True)
        code = gi.astype(np.int64) * nbins + bins
        cu, inv = np.unique(code, return_inverse=True)
        csum = np.bincount(inv, weights=c).astype(np.int64)
        owner = cu // nbins
        starts = np.searchsorted(owner, np.arange(len(gu)))
        ends = np.searchsorted(owner, np.arange(len(gu)), side="right")
        bl, cl, cml = [], [], []
        for s, e in zip(starts, ends):
            bb, cc2 = (cu[s:e] % nbins), csum[s:e]
            bl.append(bb)
            cl.append(cc2)
            cml.append(np.cumsum(cc2))
        return _quantile_rows(ray.get(ref), gu.tolist(), cml, bl, cl)

    with _hash_shuffle(pre):
        out = pre.repartition(
            num_blocks=cap_join_partitions(num_partitions),
            keys=[group_col]) \
            .map_batches(merge_block, batch_format="pyarrow",
                         batch_size=None).materialize()

    # groups whose every non-null value is +/-inf never emit histogram
    # rows (nothing finite to bin); their quantiles are rank-exact and
    # computed here (pathological, O(such groups) driver rows)
    inf_only = [gval for gval, (lo, _hi, n, _ni, _pi) in stats.items()
                if lo is None and n > 0]
    if inf_only:
        rows = []
        for gval in inf_only:
            _lo, _hi, n, ninf, _pinf = stats[gval]
            for p in ps:
                target = min(max(int(np.ceil(p * n)), 1), n)
                rows.append((gval, p,
                             -np.inf if target <= ninf else np.inf, n))
        extra = pa.table({group_col: pa.array([r[0] for r in rows], gtype),
                          "p": pa.array([r[1] for r in rows], pa.float64()),
                          "value": pa.array([r[2] for r in rows],
                                            pa.float64()),
                          "n": pa.array([r[3] for r in rows], pa.int64())})
        out = out.union(ray.data.from_arrow(extra))
    return out
