"""Resumable partitioned parquet sink for batch (non-crawl) pipelines.

The crawl loop already checkpoints per wave (`pipelines/crawl.py`
``_COMMITTED`` markers); this is the same discipline for the
training-data ops side: output is hash-sharded into ``shard=K/``
directories, each sealed with its own ``_COMMITTED`` marker, so a
killed run re-executes ONLY the unsealed shards on rerun — at 100 TB a
restart must not repeat finished work, and partitioned output is also
what keeps any single sink file bounded.

Shape: ONE streaming pass over the input writes every missing shard
(``write_parquet`` fans rows out to their shard directory via a
deterministic hash column); sealed shards are excluded with a
vectorized filter at the head of the pass, so a fully-committed rerun
reads nothing but the markers. Partial files from a crash are removed
before rewrite (unsealed directories are wiped), which makes the write
idempotent per shard.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["write_resumable", "read_resumable", "committed_shards"]

_SHARD_COL = "__shard"


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard}")


def committed_shards(out_dir: str, num_shards: int) -> set[int]:
    return {s for s in range(num_shards)
            if os.path.exists(os.path.join(_shard_dir(out_dir, s),
                                           "_COMMITTED"))}


def _hash_shard(col: pa.ChunkedArray, num_shards: int) -> np.ndarray:
    """Deterministic cross-process shard id from a key column (FNV-1a
    over the string form, vectorized via uint64 numpy for ints)."""
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = v * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        return (h % np.uint64(num_shards)).astype(np.int64)
    import hashlib
    vals = col.to_pylist()
    return np.array([int.from_bytes(
        hashlib.blake2b(str(x).encode(), digest_size=8).digest(), "big")
        % num_shards for x in vals], np.int64)


def write_resumable(ds: ray.data.Dataset, out_dir: str, key_col: str,
                    num_shards: int = 16) -> dict:
    """Write ``ds`` hash-sharded by ``key_col`` into ``out_dir`` with a
    per-shard ``_COMMITTED`` marker; shards already sealed are SKIPPED
    (their rows are filtered out of the pass). Returns counters
    {written: [...], skipped: [...]}.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = committed_shards(out_dir, num_shards)
    missing = [s for s in range(num_shards) if s not in done]
    if not missing:
        return {"written": [], "skipped": sorted(done)}
    # a crash may have left partial files in unsealed shard dirs —
    # wipe them so the rewrite is idempotent
    for s in missing:
        shutil.rmtree(_shard_dir(out_dir, s), ignore_errors=True)

    missing_arr = np.array(missing, np.int64)

    def tag_and_filter(b: pa.Table) -> pa.Table:
        shard = _hash_shard(b.column(key_col), num_shards)
        keep = np.isin(shard, missing_arr)
        out = b.append_column(_SHARD_COL, pa.array(shard, pa.int64()))
        return out.filter(pa.array(keep))

    tagged = ds.map_batches(tag_and_filter, batch_format="pyarrow")
    tagged.write_parquet(out_dir, partition_cols=[_SHARD_COL])
    # parquet partition dirs are "__shard=K"; normalize to "shard=K"
    for s in missing:
        src = os.path.join(out_dir, f"{_SHARD_COL}={s}")
        dst = _shard_dir(out_dir, s)
        if os.path.exists(src):
            os.rename(src, dst)
        else:
            os.makedirs(dst, exist_ok=True)  # empty shard still seals
        with open(os.path.join(dst, "_COMMITTED"), "w") as f:
            f.write("ok\n")
    return {"written": missing, "skipped": sorted(done)}


def read_resumable(out_dir: str, num_shards: int = 16,
                   columns: list[str] | None = None) -> ray.data.Dataset:
    """Read back ONLY sealed shards (ignores any partial shard from a
    crashed writer)."""
    done = committed_shards(out_dir, num_shards)
    files = []
    for s in sorted(done):
        d = _shard_dir(out_dir, s)
        files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                     if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no committed shards under {out_dir}")
    return ray.data.read_parquet(files, columns=columns)
