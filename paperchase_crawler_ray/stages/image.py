"""Image branch stages (SURVEY.md M8-M11, U3) — the payload pipeline.

Batches here carry wide ``binary`` image bodies, so the crawl loop runs
these stages with a small explicit ``batch_size`` (memory note SURVEY.md
§4.4). Decode + phash is the CPU-heavy stage; it is a callable class so
``map_batches`` runs it as an actor pool whose size is tuned
independently of the fetch pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import UnsupportedFormatError, decode, sniff_format
from ..functions.phash import hamming64, phash64
from ..functions.urlnorm import canonicalize, url_hash64
from ..oracle import normalize_caption

_DECODABLE = {"png", "bmp", "raw", "jpeg"}


def canonicalize_image_refs(batch: pa.Table) -> pa.Table:
    """(src, caption) rows -> canonical src + namespaced image url_hash.

    The image-seen namespace is ``img:<canon>`` so image dedup shares the
    sharded cuckoo seen set without colliding with page URLs.
    """
    srcs = batch.column("src").to_pylist()
    canon = [canonicalize(s) for s in srcs]
    hashes = [url_hash64("img:" + c) for c in canon]
    out = batch.append_column("url_canon", pa.array(canon, pa.string()))
    out = out.append_column("url_hash", pa.array(hashes, pa.int64()))
    return out


class DecodeImages:
    """Fetched image rows -> IMAGE_CAPTION rows (+ phash bucket).

    Drops rows that are not 200 image/* responses or use formats the
    engine cannot decode (gif). Per-row decode is
    genuinely per-image work; the numpy kernels inside (unfilter, DCT)
    are vectorized per image.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        status = batch.column("status").to_numpy(zero_copy_only=False)
        ctypes = batch.column("content_type").to_pylist()
        bodies = batch.column("body").to_pylist()
        urls = batch.column("url_canon").to_pylist()
        captions = batch.column("caption").to_pylist()
        ids, blobs, ws, hs, fmts, caps, phashes = [], [], [], [], [], [], []
        for i in range(len(urls)):
            if status[i] != 200 or not ctypes[i].startswith("image/"):
                continue
            data = bodies[i]
            fmt = sniff_format(data)
            if fmt not in _DECODABLE:
                continue
            try:
                px = decode(data, fmt)
            except UnsupportedFormatError:
                continue
            ids.append(urls[i])
            blobs.append(data)
            ws.append(px.shape[1])
            hs.append(px.shape[0])
            fmts.append(fmt)
            caps.append(normalize_caption(captions[i]))
            phashes.append(phash64(px))
        ph = np.array(phashes, np.int64) if phashes else np.empty(0, np.int64)
        bucket = (ph.view(np.uint64) >> np.uint64(48)).astype(np.int64)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )


class DecodeWriteImages:
    """``DecodeImages`` fused with the parquet sink: each batch's full
    IMAGE_CAPTION rows are written to ONE deterministic parquet file
    inside the map task, and only the NARROW (image_id, phash, bucket)
    columns stream onward — the near-dup tombstone pass consumes them
    directly instead of re-reading ``image_parallelism`` files (the
    second full pass over the images directory that dominated the
    neardup_tombstones stage at bench scale).

    Retry-safe: the file name is keyed on the batch's first image_id
    (image_ids are wave-unique after the winner filter, so batch ->
    name is injective), and decode is deterministic — a retried task
    rewrites the same file with the same bytes."""

    def __init__(self, images_dir: str):
        self.images_dir = images_dir
        self.decode = DecodeImages()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import os

        import pyarrow.parquet as _pq
        full = self.decode(batch)
        if full.num_rows:
            key = hashlib.blake2b(
                full.column("image_id")[0].as_py().encode(),
                digest_size=10).hexdigest()
            # bytes hold already-compressed codec payloads — parquet
            # recompression would cost seconds/GB and save nothing.
            # Write to a pid-suffixed temp and os.replace() into the
            # deterministic name: a task killed mid-write must not leave
            # a truncated file at the canonical path, and a zombie
            # executor finishing late must swap atomically rather than
            # tear a file a reader already trusts (ADVICE r3 #2).
            dst = os.path.join(self.images_dir, f"part-{key}.parquet")
            tmp = f"{dst}.tmp{os.getpid()}"
            _pq.write_table(full, tmp, compression="none")
            os.replace(tmp, dst)
        return full.select(["image_id", "phash", "bucket"])


def dedup_image_refs_block(batch: pa.Table) -> pa.Table:
    """Within-wave image-ref dedup over a WHOLE block of co-located
    url_hashes (after ``repartition(keys=["url_hash"])``): one row per
    image url_hash, winner = the reference from the earliest-admitted
    page in the oracle's iteration order (-priority, depth, page_hash),
    then in-page position — making the landed caption deterministic when
    several pages reference the same src in one wave."""
    if batch.num_rows == 0:
        return batch
    order = np.lexsort((
        batch.column("img_pos").to_numpy(zero_copy_only=False),
        batch.column("page_hash").to_numpy(zero_copy_only=False),
        batch.column("page_depth").to_numpy(zero_copy_only=False),
        -batch.column("page_priority").to_numpy(zero_copy_only=False),
        batch.column("url_hash").to_numpy(zero_copy_only=False),
    ))
    h = batch.column("url_hash").to_numpy(zero_copy_only=False)[order]
    first = np.ones(len(h), bool)
    first[1:] = h[1:] != h[:-1]
    return batch.take(pa.array(order[first]))


def _neardup_keep_indices(batch: pa.Table, hamming_max: int) -> np.ndarray:
    """Greedy keep-first by image_id within each phash-prefix bucket
    (the oracle's sequential pass), vectorized hamming per bucket.
    Returns the KEPT row indices into ``batch`` (unsorted).

    Bucket boundaries are found vectorized and singleton buckets (the
    vast majority — the bucket key is a 16-bit phash prefix) are kept
    wholesale; the sequential greedy runs only inside multi-member
    buckets, so the Python loop is O(collisions), not O(rows)."""
    order = np.lexsort((np.asarray(batch.column("image_id").to_pylist()),
                        batch.column("bucket").to_numpy(zero_copy_only=False)))
    bucket = batch.column("bucket").to_numpy(zero_copy_only=False)[order]
    ph = batch.column("phash").to_numpy(zero_copy_only=False)[order]
    n = len(order)
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    ends = np.r_[starts[1:], n]
    sizes = ends - starts
    single = sizes == 1
    keep_parts = [order[starts[single]]]
    for s, e in zip(starts[~single], ends[~single]):
        kept: list[int] = []
        for j in range(s, e):
            if not kept or hamming64(ph[np.array(kept)], ph[j]).min() > hamming_max:
                kept.append(j)
        keep_parts.append(order[np.asarray(kept, np.int64)])
    return np.concatenate(keep_parts) if keep_parts else np.empty(0, np.int64)


def neardup_block(batch: pa.Table, hamming_max: int = 2) -> pa.Table:
    """U3 over a WHOLE block holding complete phash-prefix buckets
    (correct only after ``repartition(keys=["bucket"])``)."""
    if batch.num_rows == 0:
        return batch.drop_columns(["bucket"]) if "bucket" in batch.column_names else batch
    keep = np.sort(_neardup_keep_indices(batch, hamming_max))
    return batch.take(pa.array(keep)).drop_columns(["bucket"])


def neardup_drops_block(batch: pa.Table, hamming_max: int = 2) -> pa.Table:
    """U3 narrow path: same per-bucket greedy keep-first as
    ``neardup_block`` but over (image_id, phash, bucket) ONLY, returning
    the DROPPED image_ids (the index complement of the kept rows — no
    per-row set membership). The wide image rows never shuffle — the
    crawl broadcasts this (small) drop set and filters the decoded
    stream."""
    if batch.num_rows == 0:
        return pa.table({"drop_id": pa.array([], pa.string())})
    keep = _neardup_keep_indices(batch, hamming_max)
    mask = np.ones(batch.num_rows, bool)
    mask[keep] = False
    dropped = batch.column("image_id").filter(pa.array(mask))
    return pa.table({"drop_id": dropped})


def neardup_drops_ds(narrow_imgs: "ray.data.Dataset", hamming_max: int,
                     partitions: int = 4) -> "ray.data.Dataset":
    """Distributed U3 drop plane over the narrow
    (image_id, phash, bucket) columns, returned as a DATASET of
    (image_id) rows so the caller can ``write_parquet`` it straight to
    a tombstone sidecar dir — at image-heavy corpora (10-30% near-dup
    rates, 10^8-image waves) the drop set is GBs and must never
    consolidate on the driver. Requires the HASH_SHUFFLE strategy in
    scope (the crawl pipeline scopes it). Blocks are coalesced before
    the keyed exchange: the hash shuffle pays a per-block aggregator
    round trip, and 512 x 100-row blocks cost ~20x more through it
    than 32 consolidated ones (measured). Per-bucket drops are
    disjoint (one bucket row per image), so no global dedup pass is
    needed."""
    import ray.data  # noqa: F811 - keep module import-light at top

    return (narrow_imgs
            .repartition(num_blocks=max(partitions * 2, 8))
            .repartition(num_blocks=partitions, keys=["bucket"])
            .map_batches(lambda b: pa.table(
                {"image_id": neardup_drops_block(
                    b, hamming_max).column("drop_id")}),
                batch_format="pyarrow", batch_size=None))
