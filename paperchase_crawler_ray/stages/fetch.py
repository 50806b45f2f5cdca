"""Fetch stage (SURVEY.md A4) — actor pool over zero-copy Arrow batches.

The sandbox has no network, so the Fetcher resolves canonical URLs
against a deterministic fixture web (FIXTURES.md §3) shared via a single
``ray.put`` object ref: every actor maps the same plasma-backed
``pa.Table`` (zero-copy) and builds one url->row-index dict in
``__init__`` — the actor-state pattern a production HTTP fetcher would
use for its connection pools. Missing URLs resolve to status 404.

Production note: swap ``FixtureFetcher`` for an HTTP implementation with
the same batch signature; politeness is already enforced upstream (A3),
so the fetcher only needs per-host connection reuse, not scheduling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


class FixtureFetcher:
    """map_batches actor: frontier rows -> fetched page rows."""

    def __init__(self, web_ref):
        web: pa.Table = ray.get(web_ref) if not isinstance(web_ref, pa.Table) else web_ref
        self._web = web.combine_chunks()
        urls = self._web.column("url_canon").to_pylist()
        self._index: dict[str, int] = {u: i for i, u in enumerate(urls)}
        self._status = self._web.column("status").to_numpy(zero_copy_only=False)
        self._ctype = self._web.column("content_type")
        self._body = self._web.column("body")
        self._location = self._web.column("location")

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url_canon").to_pylist()
        n = len(urls)
        rows = np.array([self._index.get(u, -1) for u in urls], np.int64)
        found = rows >= 0
        status = np.full(n, 404, np.int32)
        status[found] = self._status[rows[found]]
        # gather variable-width cols via take on the shared table (zero-copy-ish)
        take_idx = pa.array(np.where(found, rows, 0), pa.int64())
        ctype = self._ctype.take(take_idx)
        body = self._body.take(take_idx)
        loc = self._location.take(take_idx)
        if not found.all():
            miss = pa.array(~found)
            empty_s = pa.array([""] * n, pa.string())
            empty_b = pa.array([b""] * n, pa.binary())
            ctype = pa.chunked_array([pc_if_else(miss, empty_s, ctype)])
            body = pa.chunked_array([pc_if_else(miss, empty_b, body)])
            loc = pa.chunked_array([pc_if_else(miss, empty_s, loc)])
        out = batch.append_column("status", pa.array(status, pa.int32()))
        out = out.append_column("content_type", ctype)
        out = out.append_column("body", body)
        out = out.append_column("location", loc)
        return out


def pc_if_else(cond, a, b):
    import pyarrow.compute as pc

    return pc.if_else(cond, a, b)


import re as _re

_IMG_URL_RE = _re.compile(
    r"^http://h\d{3}\.[^/]+/img/\d+-\d+\.(png|bmp|raw|jpeg)$")


_PROCESS_FETCHERS: dict = {}


class TaskFetcher:
    """TASK-based page fetcher: holds only the plasma ref; the url index
    is built once per WORKER PROCESS (module-level cache keyed by ref) —
    repeated ``ray.get`` of the same ref is a zero-copy cache hit, so
    tasks pay index construction once per process, not per task. Full
    task parallelism without actor-pool sizing."""

    def __init__(self, web_ref, img_scale: int = 1):
        self.web_ref = web_ref
        self.img_scale = img_scale

    def _impl(self) -> "GenerativeFetcher":
        key = self.web_ref.hex() if hasattr(self.web_ref, "hex") else id(self.web_ref)
        impl = _PROCESS_FETCHERS.get(key)
        if impl is None:
            impl = GenerativeFetcher(self.web_ref, self.img_scale)
            _PROCESS_FETCHERS.clear()   # one web per process is typical
            _PROCESS_FETCHERS[key] = impl
        return impl

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._impl()(batch)


class SyntheticImageFetch:
    """TASK-based map_batches fn for the image branch in lazy mode: every
    fixture image URL's bytes are synthesized deterministically (shared
    ``gen_image_bytes`` rule) — stateless, so it runs at full task
    parallelism with no actor pool or broadcast table at all."""

    def __init__(self, img_scale: int = 1):
        self.img_scale = img_scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import gen_image_bytes

        urls = batch.column("url_canon").to_pylist()
        n = len(urls)
        status = np.full(n, 404, np.int32)
        ctypes = [""] * n
        bodies: list[bytes] = [b""] * n
        for i, u in enumerate(urls):
            if _IMG_URL_RE.match(u):
                data, fmt = gen_image_bytes(u, self.img_scale)
                status[i], ctypes[i], bodies[i] = 200, f"image/{fmt}", data
        out = batch.append_column("status", pa.array(status, pa.int32()))
        out = out.append_column("content_type", pa.array(ctypes, pa.string()))
        out = out.append_column("body", pa.array(bodies, pa.binary()))
        return out.append_column("location", pa.array([""] * n, pa.string()))


class GenerativeFetcher(FixtureFetcher):
    """Fetcher whose image responses are SYNTHESIZED deterministically at
    fetch time (the 'origin server' computes them) instead of being
    pre-materialized in the broadcast table.

    Rationale: at bench scale a fully materialized web would broadcast
    gigabytes of encoded pixels; a real crawl's fetch cost lives in the
    fetch stage, so generating bytes there keeps the benchmark's compute
    where a production crawl's I/O+decode cost would be, and lets the
    fixture table stay HTML-only (``make_web(materialize_images=False)``).
    Byte-for-byte identical to the eager web (shared ``gen_image_bytes``
    rule), so oracle invariants still hold.
    """

    def __init__(self, web_ref, img_scale: int = 1):
        super().__init__(web_ref)
        self.img_scale = img_scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import gen_image_bytes

        urls = batch.column("url_canon").to_pylist()
        misses = [u for u in urls if u not in self._index
                  and _IMG_URL_RE.match(u)]
        if not misses:
            return super().__call__(batch)
        gen_status, gen_ct, gen_body = {}, {}, {}
        for u in misses:
            data, fmt = gen_image_bytes(u, self.img_scale)
            gen_status[u], gen_ct[u], gen_body[u] = 200, f"image/{fmt}", data
        out = super().__call__(batch)
        status = out.column("status").to_numpy(zero_copy_only=False).copy()
        ctype = out.column("content_type").to_pylist()
        body = out.column("body").to_pylist()
        for i, u in enumerate(urls):
            if u in gen_status:
                status[i] = gen_status[u]
                ctype[i] = gen_ct[u]
                body[i] = gen_body[u]
        out = out.set_column(out.schema.get_field_index("status"), "status",
                             pa.array(status, pa.int32()))
        out = out.set_column(out.schema.get_field_index("content_type"),
                             "content_type", pa.array(ctype, pa.string()))
        return out.set_column(out.schema.get_field_index("body"), "body",
                              pa.array(body, pa.binary()))
