"""Sharded URL-seen set as Ray actors + map_batches lookup stages (A1).

Why raw actors here (the one place the Dataset API can't express the
semantics): the seen set is SHARED MUTABLE state that must survive across
waves (separate Dataset executions). N shard actors each own one
``ShardFilter`` (cuckoo warm / bloom+exact cold, state/cuckoo.py);
``map_batches`` tasks route each batch's url_hash array to its shards by
``hash % nshards`` and call the actors. No all-to-all shuffle is needed:
each batch sends one compact int64 sub-array per shard it touches —
at cluster scale this is k small RPCs per batch instead of a full
repartition of the frontier.

Determinism: actor method execution is serialized per actor, so
concurrent batches racing on the same key resolve to exactly one winner;
within-wave duplicates are already removed by the U2 dedup shuffle ahead
of this stage. Inserts are idempotent, so Ray task retries are safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.cuckoo import ShardFilter


@ray.remote(num_cpus=0)
class SeenShardActor:
    """Owns one shard of the seen set. num_cpus=0: RPC work is tiny and
    must not steal CPU slots from the fetch/parse/decode pools."""

    def __init__(self, capacity: int = 1 << 20, promote_at: int = 4096, seed: int = 42):
        self._filter = ShardFilter(capacity=capacity, promote_at=promote_at, seed=seed)

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        return self._filter.contains_many(h)

    def insert_many(self, h: np.ndarray) -> int:
        novel = self._filter.check_and_insert(h)
        return int(novel.sum())

    def check_and_insert(self, h: np.ndarray) -> np.ndarray:
        return self._filter.check_and_insert(h)

    def count(self) -> int:
        return self._filter.count

    def checkpoint(self) -> dict:
        return self._filter.checkpoint()

    def restore(self, state: dict) -> None:
        self._filter = ShardFilter.restore(state)


def make_seen_actors(nshards: int, capacity_per_shard: int = 1 << 20,
                     promote_at: int = 4096) -> list:
    return [SeenShardActor.remote(capacity=capacity_per_shard, promote_at=promote_at)
            for _ in range(nshards)]


def _shards_of(url_hash: np.ndarray, nshards: int) -> np.ndarray:
    return (url_hash.astype(np.int64).view(np.uint64) % np.uint64(nshards)).astype(np.int64)


def _route(handles: list, h: np.ndarray, method: str) -> np.ndarray:
    """Send each shard's sub-array to its actor; reassemble a bool mask."""
    n = len(h)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    shard = _shards_of(h, len(handles))
    futures, idxs = [], []
    for s in np.unique(shard):
        idx = np.nonzero(shard == s)[0]
        futures.append(getattr(handles[int(s)], method).remote(h[idx]))
        idxs.append(idx)
    for idx, res in zip(idxs, ray.get(futures)):
        out[idx] = res
    return out


class SeenLookup:
    """map_batches fn: drop rows whose url_hash is already seen (contains
    only — insertion happens at admission, after politeness)."""

    def __init__(self, handles: list, hash_col: str = "url_hash"):
        self.handles = handles
        self.hash_col = hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column(self.hash_col).to_numpy(zero_copy_only=False)
        seen = _route(self.handles, h, "contains_many")
        return batch.filter(pa.array(~seen))


class SeenInsert:
    """map_batches fn: insert url_hash values, pass batch through."""

    def __init__(self, handles: list, hash_col: str = "url_hash"):
        self.handles = handles
        self.hash_col = hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column(self.hash_col).to_numpy(zero_copy_only=False)
        _route(self.handles, h, "check_and_insert")
        return batch


class SeenCheckAndInsert:
    """map_batches fn: combined first-sighting filter + insert (used by the
    image branch where no politeness stage sits in between)."""

    def __init__(self, handles: list, hash_col: str = "url_hash"):
        self.handles = handles
        self.hash_col = hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column(self.hash_col).to_numpy(zero_copy_only=False)
        novel = _route(self.handles, h, "check_and_insert")
        return batch.filter(pa.array(novel))


def seen_counts(handles: list) -> int:
    return int(sum(ray.get([a.count.remote() for a in handles])))


def checkpoint_seen(handles: list) -> list[dict]:
    return ray.get([a.checkpoint.remote() for a in handles])


def restore_seen(handles: list, states: list[dict]) -> None:
    ray.get([a.restore.remote(s) for a, s in zip(handles, states)])
