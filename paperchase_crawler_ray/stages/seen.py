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
    must not steal CPU slots from the fetch/parse/decode pools.

    Besides the cross-wave cuckoo/bloom filter, each shard holds a
    PER-WAVE image-winner map (url_hash -> min admission-order key) used
    by the image branch to resolve duplicate srcs deterministically
    WITHOUT an all-to-all shuffle: refs are already routed here by
    ``hash % nshards``, so a two-pass offer/filter protocol over the
    narrow ref stream replaces a keyed repartition of the whole branch
    (the round-1 keyed shuffle deadlocked the bench — VERDICT.md §wrong 1).
    """

    def __init__(self, capacity: int = 1 << 20, promote_at: int = 4096, seed: int = 42):
        self._filter = ShardFilter(capacity=capacity, promote_at=promote_at, seed=seed)
        self._winners: dict = {}
        self._claimed: dict = {}

    def begin_wave(self) -> None:
        """Reset per-wave state (the winner + claimed maps). Idempotent;
        called at the start of each wave's image pass so a partial-wave
        rerun re-offers from scratch."""
        self._winners = {}
        self._claimed = {}

    def offer_winners(self, h: np.ndarray, prio: np.ndarray,
                      depth: np.ndarray, page_hash: np.ndarray,
                      pos: np.ndarray) -> None:
        """Pass 1: record the min admission-order key per url_hash.
        Key order matches stages.image.dedup_image_refs_block:
        (-page_priority, page_depth, page_hash, img_pos). Idempotent
        (min of a re-offered key is unchanged), so task retries are safe."""
        d = self._winners
        for hh, k in zip(h.tolist(),
                         zip((-prio).tolist(), depth.tolist(),
                             page_hash.tolist(), pos.tolist())):
            cur = d.get(hh)
            if cur is None or k < cur:
                d[hh] = k

    def winner_check_insert(self, h: np.ndarray, prio: np.ndarray,
                            depth: np.ndarray, page_hash: np.ndarray,
                            pos: np.ndarray) -> np.ndarray:
        """Pass 2: keep a row iff it IS the recorded per-wave winner for
        its url_hash AND the hash is novel across waves (cuckoo
        check-and-insert). The key is unique per ref (page_hash+img_pos
        identify it), so at most one row per url_hash survives.

        RETRY-SAFE: Ray Data re-runs map tasks on worker failure, and a
        retried batch would re-probe hashes its first attempt already
        inserted into the cross-wave filter — consulting only the
        cuckoo would then return 'seen' and silently drop the winning
        ref. The per-wave ``_claimed`` map records which exact
        (url_hash -> key) won the cuckoo insert this wave; a re-probe by
        the SAME key is re-granted, while any other key stays denied.
        Actor methods execute atomically, so claim + insert can't be
        observed half-done."""
        d = self._winners
        claimed = self._claimed
        keys = list(zip((-prio).tolist(), depth.tolist(),
                        page_hash.tolist(), pos.tolist()))
        hs = h.tolist()
        out = np.zeros(len(h), bool)
        probe_idx = []
        for i, (hh, k) in enumerate(zip(hs, keys)):
            if d.get(hh) != k:
                continue
            if claimed.get(hh) == k:  # retried task: re-grant
                out[i] = True
            else:
                probe_idx.append(i)
        if probe_idx:
            idx = np.asarray(probe_idx, np.int64)
            novel = self._filter.check_and_insert(h[idx])
            out[idx] = novel
            for i, nv in zip(probe_idx, novel.tolist()):
                if nv:
                    claimed[hs[i]] = keys[i]
        return out

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

    def checkpoint_to(self, path: str) -> int:
        """Write this shard's dump to ``path`` ACTOR-SIDE (atomic
        tmp+rename): checkpointing parallelizes across the shard pool
        and the fingerprint arrays never ship through the driver — at
        256 shards x MBs each, the driver-gather variant would move the
        whole seen set every wave. Single-node it is the same disk; on
        a real cluster point the out_dir at shared storage, the same
        contract every other artifact in the wave directory has."""
        import os
        state = self._filter.checkpoint()
        tmp = f"{path}.{os.getpid()}.tmp.npz"
        np.savez(tmp, **state)
        os.replace(tmp, path)
        return 1

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


_WINNER_KEY_COLS = ("page_priority", "page_depth", "page_hash", "img_pos")


def _route_cols(handles: list, h: np.ndarray, cols: list[np.ndarray],
                method: str) -> np.ndarray:
    """Like ``_route`` but ships the winner-key columns alongside the
    hashes. Returns a bool mask (all-False for void methods)."""
    n = len(h)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    shard = _shards_of(h, len(handles))
    futures, idxs = [], []
    for s in np.unique(shard):
        idx = np.nonzero(shard == s)[0]
        futures.append(getattr(handles[int(s)], method).remote(
            h[idx], *[c[idx] for c in cols]))
        idxs.append(idx)
    for idx, res in zip(idxs, ray.get(futures)):
        if res is not None:
            out[idx] = res
    return out


def _winner_cols(batch: pa.Table) -> tuple[np.ndarray, list[np.ndarray]]:
    h = batch.column("url_hash").to_numpy(zero_copy_only=False)
    cols = [batch.column(c).to_numpy(zero_copy_only=False)
            for c in _WINNER_KEY_COLS]
    return h, cols


def begin_image_wave(handles: list) -> None:
    ray.get([a.begin_wave.remote() for a in handles])


class OfferImageWinners:
    """map_batches fn (pass 1): register each ref's admission-order key
    with its owning shard actor; pass the batch through unchanged."""

    def __init__(self, handles: list):
        self.handles = handles

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, cols = _winner_cols(batch)
        _route_cols(self.handles, h, cols, "offer_winners")
        return batch


class ImageWinnerFilter:
    """map_batches fn (pass 2): keep only the deterministic per-wave
    winner per image url_hash that is also novel across waves."""

    def __init__(self, handles: list):
        self.handles = handles

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, cols = _winner_cols(batch)
        keep = _route_cols(self.handles, h, cols, "winner_check_insert")
        return batch.filter(pa.array(keep))


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
