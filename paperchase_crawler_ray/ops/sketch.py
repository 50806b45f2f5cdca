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
