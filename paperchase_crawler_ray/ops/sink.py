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
_SCHEMA_FILE = "_SCHEMA.parquet"


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard}")


def _data_files(out_dir: str, shard: int) -> list[str]:
    sd = _shard_dir(out_dir, shard)
    if not os.path.isdir(sd):
        return []
    return [os.path.join(sd, f) for f in sorted(os.listdir(sd))
            if f.endswith(".parquet")]


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


def write_resumable(ds: ray.data.Dataset, out_dir: str,
                    key_col: str | None = None,
                    num_shards: int = 16,
                    shard_col: str | None = None) -> dict:
    """Write ``ds`` hash-sharded by ``key_col`` into ``out_dir`` with a
    per-shard ``_COMMITTED`` marker; shards already sealed are SKIPPED
    (their rows are filtered out of the pass). Returns counters
    {written: [...], skipped: [...]}.

    ``shard_col`` (instead of ``key_col``) uses a PRE-COMPUTED integer
    shard id column (values must lie in [0, num_shards)) — the path a
    pipeline that already shuffled-to-shards (e.g. shuffle_to_shards's
    ``shard``) takes, so the storage layout matches the training layout
    exactly instead of re-hashing under a different function.
    """
    if (key_col is None) == (shard_col is None):
        raise ValueError("write_resumable: exactly one of key_col / "
                         "shard_col must be given")
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
        if shard_col is not None:
            shard = b.column(shard_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # fail fast on the documented precondition: an out-of-range
            # shard would otherwise be silently dropped AND the target
            # shards sealed _COMMITTED — permanent loss across resumes
            if len(shard) and (shard.min() < 0
                               or shard.max() >= num_shards):
                bad = int(shard[(shard < 0)
                                | (shard >= num_shards)][0])
                raise ValueError(
                    f"write_resumable: {shard_col}={bad} outside "
                    f"[0, {num_shards}) — num_shards must match the "
                    "shard column's domain")
        else:
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
    # A legitimately-empty table seals with zero data files; persist the
    # schema in a zero-row sidecar so readers (read_resumable,
    # bucket_join) can still produce typed empty results instead of
    # failing. Only needed when NO shard anywhere holds a data file.
    if not any(_data_files(out_dir, s) for s in range(num_shards)):
        sch = ds.schema(fetch_if_missing=True)
        base = getattr(sch, "base_schema", None) if sch is not None else None
        if isinstance(base, pa.Schema):
            import pyarrow.parquet as pq
            pq.write_table(base.empty_table(),
                           os.path.join(out_dir, _SCHEMA_FILE))
    return {"written": missing, "skipped": sorted(done)}


def read_resumable(out_dir: str, num_shards: int = 16,
                   columns: list[str] | None = None) -> ray.data.Dataset:
    """Read back ONLY sealed shards (ignores any partial shard from a
    crashed writer)."""
    done = committed_shards(out_dir, num_shards)
    files = []
    for s in sorted(done):
        files.extend(_data_files(out_dir, s))
    if not files:
        # a fully-sealed EMPTY table reads back as a typed empty dataset
        sidecar = os.path.join(out_dir, _SCHEMA_FILE)
        if done and os.path.exists(sidecar):
            files = [sidecar]
        else:
            raise FileNotFoundError(f"no committed shards under {out_dir}")
    return ray.data.read_parquet(files, columns=columns)


def bucket_join(dir_a: str, dir_b: str, key_a: str, key_b: str,
                num_shards: int, join_type: str = "inner",
                right_suffix: str = "_r") -> ray.data.Dataset:
    """SHUFFLE-FREE equi join over two co-partitioned `write_resumable`
    outputs: both tables were hash-sharded by their join key with the
    SAME `_hash_shard` function and shard count, so matching keys are
    guaranteed to live in the same ``shard=K`` pair — the join runs as
    ``num_shards`` independent per-shard tasks (pyarrow hash join in
    each), with NO network exchange at query time.

    This is the "pick ONE partitioning key and reuse it" payoff at
    100 TB: pay the partitioning once at write time, then every
    subsequent join on that key is embarrassingly parallel. Both inputs
    must be fully sealed (raises otherwise); per-shard volume must fit
    a task's heap — that is the shard-count sizing rule at write time.
    Right-side non-key columns that collide with left names get
    ``right_suffix``."""
    import pyarrow.parquet as pq

    for d in (dir_a, dir_b):
        missing = set(range(num_shards)) - committed_shards(d, num_shards)
        if missing:
            raise ValueError(f"{d} has unsealed shards {sorted(missing)}; "
                             "bucket_join requires fully-committed inputs")

    def _any_empty(d: str) -> pa.Table:
        """A zero-row table carrying this sealed table's schema —
        recovered from any shard's data file, else the `_SCHEMA.parquet`
        sidecar write_resumable leaves for legitimately-empty tables."""
        for s2 in range(num_shards):
            f2 = _data_files(d, s2)
            if f2:
                t = pq.read_table(f2[0]).slice(0, 0)
                return t.drop_columns([_SHARD_COL]) \
                    if _SHARD_COL in t.column_names else t
        sidecar = os.path.join(d, _SCHEMA_FILE)
        if os.path.exists(sidecar):
            return pq.read_table(sidecar)
        raise ValueError(
            f"bucket_join: {d} is sealed but holds no data files and no "
            f"{_SCHEMA_FILE} sidecar — cannot infer its schema (was it "
            "written by an older write_resumable?)")

    empty_a, empty_b = _any_empty(dir_a), _any_empty(dir_b)

    def _load(d: str, s: int, empty: pa.Table) -> pa.Table:
        fs = _data_files(d, s)
        if not fs:
            # empty shard (or legitimately-empty table): a typed empty
            # table joins to the correct output schema — Ray 2.49
            # chokes on schema-less empty blocks downstream
            return empty
        t = pa.concat_tables([pq.read_table(f) for f in fs])
        return t.drop_columns([_SHARD_COL]) \
            if _SHARD_COL in t.column_names else t

    def join_shard(batch: pa.Table) -> pa.Table:
        outs = []
        for s in batch.column("shard").to_pylist():
            ta = _load(dir_a, s, empty_a)
            tb = _load(dir_b, s, empty_b)
            outs.append(ta.join(tb, keys=[key_a], right_keys=[key_b],
                                join_type=join_type,
                                right_suffix=right_suffix))
        return pa.concat_tables(outs, promote_options="default")

    ids = ray.data.from_arrow(pa.table({
        "shard": pa.array(list(range(num_shards)), pa.int64())}))
    return ids.repartition(num_shards).map_batches(
        join_shard, batch_format="pyarrow", batch_size=None)


def write_clustered(ds: ray.data.Dataset, out_dir: str, key_col: str,
                    order_col: str, num_shards: int = 16) -> dict:
    """Clustered + secondary-sorted resumable write: rows are
    hash-sharded by ``key_col`` (every key lives in exactly one
    ``shard=K``) and each shard's files are sorted by (key, order)
    INSIDE the shard — so per-key scans touch one shard and read rows
    already in order (the layout merge joins, as-of probes and
    time-series reads want).

    Implementation rides `write_resumable` unchanged: the sort is a
    block-local kernel applied after an explicit keyed repartition, and
    the sink's shard filter/commit machinery provides resume. The only
    all-to-all is the clustering repartition itself — the price of the
    layout, paid once."""
    from .dedup import _hash_shuffle

    width = max(1, min(num_shards, 64))
    with _hash_shuffle(ds):
        clustered = ds.repartition(num_blocks=width, keys=[key_col])

        def sort_block(b: pa.Table) -> pa.Table:
            idx = pc.sort_indices(b, sort_keys=[(key_col, "ascending"),
                                                (order_col, "ascending")])
            return b.take(idx)

        ordered = clustered.map_batches(sort_block, batch_format="pyarrow",
                                        batch_size=None)
        out = write_resumable(ordered, out_dir, key_col, num_shards)
    return out
