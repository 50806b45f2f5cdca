"""A1 seen-set state tests: no false negatives, bounded FP rate,
bloom→cuckoo promotion, checkpoint/restore round-trip (SURVEY.md §5.2)."""

import numpy as np

from paperchase_crawler_ray.state.cuckoo import BloomFilter, CuckooFilter, ShardFilter


def _hashes(n, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)


def test_cuckoo_no_false_negative():
    f = CuckooFilter(capacity=1 << 16)
    ins = _hashes(20_000, 1)
    f.insert_many(ins)
    assert f.contains_many(ins).all()


def test_cuckoo_false_positive_rate():
    f = CuckooFilter(capacity=1 << 16)
    f.insert_many(_hashes(20_000, 2))
    probe = _hashes(50_000, 3)
    fp = f.contains_many(probe).mean()
    assert fp < 0.01, fp


def test_cuckoo_delete():
    f = CuckooFilter(capacity=1 << 12)
    h = _hashes(1000, 4)
    f.insert_many(h)
    deleted = f.delete_many(h[:500])
    assert deleted == 500
    assert f.contains_many(h[500:]).all()


def test_bloom_no_false_negative():
    b = BloomFilter(nbits=1 << 16)
    h = _hashes(2000, 5)
    b.add_many(h)
    assert b.contains_many(h).all()


def test_shard_promote_and_idempotent_insert():
    s = ShardFilter(capacity=1 << 14, promote_at=256)
    h1 = _hashes(200, 6)
    novel = s.check_and_insert(h1)
    assert novel.all()
    assert not s.check_and_insert(h1).any()  # idempotent: all already seen
    assert s.mode == "cold"
    h2 = _hashes(5000, 7)
    s.check_and_insert(h2)
    assert s.mode == "cuckoo"  # promoted
    assert s.contains_many(h1).all()  # no false negatives across promotion
    assert s.contains_many(h2).all()


def test_shard_checkpoint_restore():
    s = ShardFilter(capacity=1 << 14, promote_at=64)
    h = _hashes(1000, 8)
    s.check_and_insert(h)
    state = s.checkpoint()
    r = ShardFilter.restore(state)
    assert r.mode == s.mode
    assert r.count == s.count
    assert r.contains_many(h).all()
    # restored filter keeps rejecting re-inserts
    assert not r.check_and_insert(h).any()


def test_shard_cold_checkpoint_restore():
    s = ShardFilter(capacity=1 << 14, promote_at=1 << 12)
    h = _hashes(100, 9)
    s.check_and_insert(h)
    assert s.mode == "cold"
    r = ShardFilter.restore(s.checkpoint())
    assert r.contains_many(h).all()
    assert not r.check_and_insert(h).any()
