"""Hypothesis property tests for the spec-defining primitives
(SURVEY.md §5.2 item 1): URL canonicalization idempotence, seen-set
no-false-negatives, codec round-trips, dedup-combiner associativity."""

import numpy as np
from hypothesis import given, settings, strategies as st

from paperchase_crawler_ray.functions.codec import decode, encode
from paperchase_crawler_ray.functions.urlnorm import canonicalize, url_hash64
from paperchase_crawler_ray.state.cuckoo import ShardFilter

_HOST = st.from_regex(r"[a-zA-Z][a-zA-Z0-9\-]{0,10}(\.[a-zA-Z]{2,7}){1,2}",
                      fullmatch=True)
_PATH = st.lists(
    st.text(alphabet="abcdefXYZ019-._~%", min_size=0, max_size=6)
    | st.sampled_from([".", ".."]),
    min_size=0, max_size=5).map(lambda segs: "/" + "/".join(segs))
_QUERY = st.lists(
    st.tuples(st.text(alphabet="abz19", min_size=1, max_size=3),
              st.text(alphabet="abz19", min_size=0, max_size=3)),
    min_size=0, max_size=4).map(
        lambda kvs: "&".join(f"{k}={v}" for k, v in kvs))


@settings(max_examples=200, deadline=None)
@given(scheme=st.sampled_from(["http", "HTTP", "https"]), host=_HOST,
       port=st.sampled_from(["", ":80", ":443", ":8080"]), path=_PATH,
       query=_QUERY, frag=st.sampled_from(["", "#f", "#frag/x"]))
def test_canonicalize_idempotent(scheme, host, port, path, query, frag):
    url = f"{scheme}://{host}{port}{path}"
    if query:
        url += "?" + query
    url += frag
    c1 = canonicalize(url)
    assert canonicalize(c1) == c1
    # canonical form never keeps a fragment and always has a path
    assert "#" not in c1
    assert "://" in c1 and c1.split("://", 1)[1].count("/") >= 1


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
                min_size=0, max_size=500))
def test_shard_filter_no_false_negatives(keys):
    f = ShardFilter(capacity=1 << 14, promote_at=64)
    h = np.array(keys, np.int64) if keys else np.empty(0, np.int64)
    f.check_and_insert(h)
    if len(h):
        assert f.contains_many(h).all()
        # idempotent: nothing is novel the second time
        assert not f.check_and_insert(h).any()


@settings(max_examples=25, deadline=None)
@given(w=st.integers(min_value=1, max_value=40),
       h=st.integers(min_value=1, max_value=40),
       seed=st.integers(min_value=0, max_value=2 ** 31),
       fmt=st.sampled_from(["png", "bmp", "raw"]))
def test_codec_roundtrip_property(w, h, seed, fmt):
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode(encode(px, fmt)) == px).all()


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=300))
def test_url_hash_is_stable_and_text_safe(s):
    u = "http://h.example/" + s.replace("\n", "")
    assert url_hash64(u) == url_hash64(u)


@settings(max_examples=50, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 3),
                               st.integers(0, 5),
                               st.floats(0, 1, allow_nan=False)),
                     min_size=1, max_size=200),
       split=st.integers(min_value=0, max_value=200))
def test_dedup_combiner_property(rows, split):
    """Block-local pre-dedup then global == global (any split point)."""
    import pyarrow as pa
    from paperchase_crawler_ray.stages.frontier import dedup_block
    t = pa.table({
        "url_hash": pa.array([r[0] for r in rows], pa.int64()),
        "depth": pa.array([r[1] for r in rows], pa.int32()),
        "parent_hash": pa.array([r[2] for r in rows], pa.int64()),
        "priority": pa.array([r[3] for r in rows], pa.float64()),
    })
    split = min(split, t.num_rows)
    combined = dedup_block(pa.concat_tables(
        [dedup_block(t.slice(0, split)), dedup_block(t.slice(split))]))
    direct = dedup_block(t)
    key = lambda tab: sorted(map(tuple, tab.to_pandas().values.tolist()))
    assert key(combined) == key(direct)


@settings(max_examples=400, deadline=None)
@given(s=st.text(alphabet="abzAZ09:/?#%.~-_@&=+!$'()*,;", min_size=1,
                 max_size=48),
       prefix=st.sampled_from(["", "http://", "https://", "HTTP://"]))
def test_fast_canonical_mask_is_fixpoint(s, prefix):
    """Any URL the vectorized already-canonical predicate accepts must be
    a FIXPOINT of canonicalize() with a matching extracted host — the
    fast path may only ever skip work, never change identity."""
    import pyarrow as pa
    from paperchase_crawler_ray.functions.urlnorm import (canonicalize,
                                                          extract_host)
    from paperchase_crawler_ray.stages.frontier import fast_canonical_mask
    u = prefix + s
    mask, hosts = fast_canonical_mask(pa.array([u]))
    if mask[0]:
        assert canonicalize(u) == u
        assert extract_host(u) == hosts[0]


@settings(max_examples=40, deadline=None)
@given(xs=st.lists(st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
                   min_size=1, max_size=400),
       frac=st.floats(min_value=0.0, max_value=1.0))
def test_multi_kth_property_matches_sorted(xs, frac):
    """multi_kth_smallest == sorted()[k] for any int list and any rank,
    regardless of block structure (the algorithm never sees row order)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from paperchase_crawler_ray.ops.relational import multi_kth_smallest
    k = min(int(frac * len(xs)), len(xs) - 1)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(xs, pa.int64())}))
    if len(xs) > 3:
        ds = ds.repartition(3)
    got = multi_kth_smallest(ds, "x", [0, k, len(xs) - 1], collect_limit=8)
    s = sorted(xs)
    assert got == [s[0], s[k], s[-1]]


@settings(max_examples=60, deadline=None)
@given(a=st.text(alphabet="abcXYZ 0", min_size=0, max_size=24),
       b=st.text(alphabet="abcXYZ 0", min_size=0, max_size=24),
       d=st.integers(min_value=0, max_value=4))
def test_lev_banded_properties(a, b, d):
    """Banded distance is symmetric, respects the length-difference
    lower bound, and equals the true distance whenever it is <= d."""
    from paperchase_crawler_ray.ops.linkage import lev_banded
    ab = lev_banded(a, b, d)
    ba = lev_banded(b, a, d)
    assert ab == ba
    assert ab >= min(abs(len(a) - len(b)), d + 1)
    if a == b:
        assert ab == 0
    # triangle-ish sanity: distance to itself via one substitution
    if a and d >= 1:
        mutated = ("z" if a[0] != "z" else "q") + a[1:]
        assert lev_banded(a, mutated, d) == 1


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=(1 << 16) - 1),
                          st.integers(min_value=0, max_value=(1 << 16) - 1)),
                min_size=1, max_size=200))
def test_morton_key_order_preserving_within_axis(pts):
    """Fixing one axis, the Morton key is strictly monotonic in the
    other (bit interleave preserves per-axis order)."""
    import numpy as np
    from paperchase_crawler_ray.ops.layout import morton_key2
    xs = np.array([p[0] for p in pts], np.int64)
    ys = np.array([p[1] for p in pts], np.int64)
    keys = morton_key2(xs, ys)
    # same y, larger x -> larger key (and same for x/y swapped)
    for i in range(len(pts)):
        for j in range(len(pts)):
            if ys[i] == ys[j] and xs[i] < xs[j]:
                assert keys[i] < keys[j]
            if xs[i] == xs[j] and ys[i] < ys[j]:
                assert keys[i] < keys[j]
