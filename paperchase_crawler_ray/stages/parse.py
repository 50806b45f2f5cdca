"""Parse + explode stages (SURVEY.md M4-M6, redirects).

``ParsePages`` is a stateless per-batch map over fetched pages: html
bodies -> ``outlinks:list<string>`` + ``images:list<struct<src,caption>>``
columns (bodies are DROPPED here, so only compact parsed rows flow on /
are checkpointed). The explodes are vectorized batch-level flattens via
``pyarrow.compute.list_flatten`` + ``list_parent_indices`` — no per-row
Python in the explode path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.htmlparse import parse_page
from ..oracle import score_priority

_IMG_STRUCT = pa.struct([("src", pa.string()), ("caption", pa.string())])

PARSED_COLUMNS = ["url_hash", "url_canon", "host", "depth", "priority",
                  "seed_id", "status", "location", "outlinks", "images"]


def parse_pages(batch: pa.Table) -> pa.Table:
    """Fetched page rows -> parsed rows (outlinks/images lists, no body)."""
    status = batch.column("status").to_numpy(zero_copy_only=False)
    ctypes = batch.column("content_type").to_pylist()
    bodies = batch.column("body").to_pylist()
    urls = batch.column("url_canon").to_pylist()
    outlinks: list[list[str]] = []
    images: list[list[dict]] = []
    for i in range(len(urls)):
        if status[i] == 200 and ctypes[i].startswith("text/html"):
            page = parse_page(bodies[i], urls[i])
            outlinks.append(page.outlinks)
            images.append([{"src": s, "caption": c} for s, c in page.images])
        else:
            outlinks.append([])
            images.append([])
    scalar_cols = [c for c in PARSED_COLUMNS
                   if c not in ("outlinks", "images") and c in batch.column_names]
    out = batch.select(scalar_cols)
    out = out.append_column("outlinks", pa.array(outlinks, pa.list_(pa.string())))
    out = out.append_column("images", pa.array(images, pa.list_(_IMG_STRUCT)))
    return out


def _gather_parents(batch: pa.Table, list_col, cols: list[str]) -> dict:
    idx = pc.list_parent_indices(list_col)
    return {c: batch.column(c).take(idx) for c in cols}


def explode_links(batch: pa.Table) -> pa.Table:
    """Parsed rows -> one frontier row per outlink (depth+1, scored)."""
    col = batch.column("outlinks")
    flat = pc.list_flatten(col)
    parents = _gather_parents(batch, col, ["url_hash", "depth", "seed_id"])
    depth = pc.add(parents["depth"], pa.scalar(1, pa.int32()))
    d = depth.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "url": flat,
            "depth": depth,
            "priority": pa.array(1.0 / (1.0 + d), pa.float64()),
            "parent_hash": parents["url_hash"],
            "seed_id": parents["seed_id"],
        }
    )


def explode_redirects(batch: pa.Table) -> pa.Table:
    """301 rows -> frontier rows for the redirect target (same depth/prio)."""
    mask = pc.and_(pc.equal(batch.column("status"), pa.scalar(301, pa.int32())),
                   pc.not_equal(batch.column("location"), pa.scalar("")))
    sub = batch.filter(mask)
    return pa.table(
        {
            "url": sub.column("location"),
            "depth": sub.column("depth"),
            "priority": sub.column("priority"),
            "parent_hash": sub.column("url_hash"),
            "seed_id": sub.column("seed_id"),
        }
    )


def explode_images(batch: pa.Table) -> pa.Table:
    """Parsed rows -> one row per (image src, caption) pair, carrying the
    page's admission-order key (priority, depth, page_hash) plus the
    in-page position so a duplicated src has a deterministic winner."""
    col = batch.column("images")
    flat = pc.list_flatten(col)  # struct array of (src, caption)
    parents = _gather_parents(
        batch, col, ["url_hash", "seed_id", "priority", "depth"])
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # position of each image within its page's list
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    pos = np.arange(int(lengths.sum()), dtype=np.int64) - \
        np.repeat(np.concatenate([[0], np.cumsum(lengths)[:-1]]), lengths)
    return pa.table(
        {
            "src": flat.field("src"),
            "caption": flat.field("caption"),
            "page_hash": parents["url_hash"],
            "seed_id": parents["seed_id"],
            "page_priority": parents["priority"],
            "page_depth": parents["depth"],
            "img_pos": pa.array(pos, pa.int64()),
        }
    )
