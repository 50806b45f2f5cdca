"""Frontier batch transforms (SURVEY.md M1-M3, M7, M12, U2).

All stateless `map_batches` functions over ``batch_format="pyarrow"``
batches. URL parsing is inherently per-string (urllib), so the canonical
step loops over the python strings of a batch once and rebuilds Arrow
columns; everything downstream (hashing reuse, masks, scoring) is
vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urlnorm import canonicalize, extract_host, url_hash64
from ..oracle import CrawlConfig, score_priority

# Conservative ALREADY-CANONICAL predicate (RE2, evaluated vectorized over
# the whole batch): lowercase http(s) scheme, lowercase dot/hyphen host
# with no port and no trailing dot, a mandatory absolute path drawn from
# pchar-minus-'%' (so no escapes), no query, no fragment. Combined with a
# "/."-free check (no dot segments, conservatively also sending hidden
# paths to the slow lane), any match is a FIXPOINT of canonicalize() —
# property-tested in tests/test_urlnorm.py.
_FAST_URL_RE = (r"^https?://(?P<host>[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?)"
                r"(?P<path>/[A-Za-z0-9\-._~!$&'()*+,;=:@/]*)$")


def fast_canonical_mask(urls: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, list]:
    """Vectorized mask of rows that are provably already canonical, plus
    the extracted host per row (None where the mask is False)."""
    ext = pc.extract_regex(urls, pattern=_FAST_URL_RE)
    ok = pc.and_(pc.is_valid(ext),
                 pc.invert(pc.match_substring(urls, pattern="/.")))
    hosts = pc.if_else(ok, pc.struct_field(ext, "host"), None).to_pylist()
    return ok.to_numpy(zero_copy_only=False), hosts


class CanonicalizeBatch:
    """M1+M2+M3+M7: canonicalize, hash, host, scope-filter a frontier batch.

    Most crawl-discovered URLs are already canonical (they come out of our
    own parser resolving against canonical bases), so a vectorized RE2
    fixpoint test routes them around the per-row urllib normalization; the
    slow lane keeps a per-instance cache for repeat offenders.
    """

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self._cache: dict[str, tuple[str, int, str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_col = batch.column("url")
        urls = urls_col.to_pylist()
        fast, fast_hosts = fast_canonical_mask(urls_col)
        depths = batch.column("depth").to_numpy(zero_copy_only=False)
        canon_l: list[str] = []
        hash_l: list[int] = []
        host_l: list[str] = []
        keep = np.zeros(len(urls), bool)
        cache = self._cache
        suffix = self.cfg.host_suffix
        for i, u in enumerate(urls):
            if fast[i]:
                c, host = u, fast_hosts[i]
                h = url_hash64(c)
            else:
                hit = cache.get(u)
                if hit is None:
                    c = canonicalize(u)
                    if not c.startswith(("http://", "https://")):
                        hit = ("", 0, "")
                    else:
                        hit = (c, url_hash64(c), extract_host(c))
                    if len(cache) < 200_000:
                        cache[u] = hit
                c, h, host = hit
            if c and host.endswith(suffix) and depths[i] <= self.cfg.max_depth:
                keep[i] = True
            canon_l.append(c)
            hash_l.append(h)
            host_l.append(host)
        out = batch.append_column("url_canon", pa.array(canon_l, pa.string()))
        out = out.append_column("url_hash", pa.array(hash_l, pa.int64()))
        out = out.append_column("host", pa.array(host_l, pa.string()))
        return out.filter(pa.array(keep))


def dedup_block(batch: pa.Table) -> pa.Table:
    """U2 vectorized: keep one row per url_hash — min (depth, parent_hash,
    -priority) — within a WHOLE block. Correct only after
    ``repartition(keys=["url_hash"])`` co-located equal hashes; one
    lexsort + unique per block, no per-group Python.
    """
    if batch.num_rows == 0:
        return batch
    h = batch.column("url_hash").to_numpy(zero_copy_only=False)
    order = np.lexsort((-batch.column("priority").to_numpy(zero_copy_only=False),
                        batch.column("parent_hash").to_numpy(zero_copy_only=False),
                        batch.column("depth").to_numpy(zero_copy_only=False),
                        h))
    hs = h[order]
    first = np.ones(len(hs), bool)
    first[1:] = hs[1:] != hs[:-1]
    return batch.take(pa.array(order[first]))


def dedup_wave_group(g: pd.DataFrame) -> pd.DataFrame:
    """U2 per-group winner: min (depth, parent_hash, -priority).

    Runs inside ``groupby("url_hash").map_groups`` — the hash-partitioned
    exact-dedup shuffle. Deterministic total order, matching
    ``oracle.dedup_winner_key``.
    """
    idx = np.lexsort((-g["priority"].to_numpy(),
                      g["parent_hash"].to_numpy(),
                      g["depth"].to_numpy()))
    return g.iloc[idx[:1]]


def score_new_links(batch: pa.Table) -> pa.Table:
    """M12: priority for freshly discovered outlinks (vectorized)."""
    depth = batch.column("depth").to_numpy(zero_copy_only=False).astype(np.float64)
    pri = 1.0 / (1.0 + depth)
    return batch.set_column(
        batch.schema.get_field_index("priority"), "priority", pa.array(pri, pa.float64())
    )


__all__ = ["CanonicalizeBatch", "dedup_wave_group", "score_new_links", "score_priority"]
