"""Flagship batch pipeline: document prep for LLM training.

One streaming Dataset chain — length+repetition quality filter ->
exact hash dedup -> sliding-window chunking — landed through the
resumable sharded sink (`ops/sink.write_resumable`), so a killed run
re-executes only unsealed output shards. The same chain backs the
driver contract's ``q_prep_pipeline`` (full-chain DuckDB twin); this
module is its production wrapper: input from parquet, output to
``shard=K/`` parquet, counters back to the caller.

Scale shape: every stage is a stateless map or the two-phase dedup —
the only all-to-all is the dedup's keyed winner reduction; chunk
explode is bounded by window/stride; the sink's shard filter prunes
re-runs at the head of the pass (SCALE.md §5).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..ops.relational import exact_dedup
from ..ops.sink import committed_shards, write_resumable
from ..ops.textstats import (chunk_documents, fingerprint_batch,
                             repetition_stats)


def prep_chain(docs: ray.data.Dataset, min_tokens: int = 30,
               top_ratio: int = 8, window: int = 64,
               stride: int = 48) -> ray.data.Dataset:
    """quality filter -> hash dedup -> chunk, as one lazy chain.

    The filter keeps docs with >= ``min_tokens`` tokens whose most
    frequent token is at most 1/``top_ratio`` of them (cross-multiplied
    integer rule — SQL-exact)."""
    stats = repetition_stats(docs)

    def keep(b: pa.Table) -> pa.Table:
        n = b.column("n_tokens")
        top = b.column("top_count")
        mask = pc.and_(pc.greater_equal(n, min_tokens),
                       pc.less_equal(pc.multiply(top, top_ratio), n))
        return b.filter(mask).select(["doc_id", "text"])

    kept = stats.map_batches(keep, batch_format="pyarrow")
    hashed = kept.map_batches(fingerprint_batch, batch_format="pyarrow")
    dd = exact_dedup(hashed, ["text_hash"], [("doc_id", False)])
    return chunk_documents(dd.select_columns(["doc_id", "text"]),
                           window=window, stride=stride)


def prep_documents(in_path: str, out_dir: str, num_shards: int = 16,
                   **chain_kwargs) -> dict:
    """Run the prep chain over a documents parquet and land it through
    the resumable sink. Safe to re-invoke after a kill: sealed shards
    are skipped. Returns {written, skipped, shards_done}."""
    docs = ray.data.read_parquet(in_path, columns=["doc_id", "text"])
    chunks = prep_chain(docs, **chain_kwargs)
    res = write_resumable(chunks, out_dir, "doc_id", num_shards)
    res["shards_done"] = len(committed_shards(out_dir, num_shards))
    return res


def image_prep_chain(imgs: ray.data.Dataset, hamming_max: int = 6,
                     min_entropy: float = 1.0,
                     split_fractions: dict[str, int] | None = None
                     ) -> ray.data.Dataset:
    """Image-side flagship prep: phash near-dup collapse -> decoded
    quality filter -> aspect/resolution bucket tags, as one chain that
    touches the WIDE (bytes) table exactly once.

    Stage order is the scale decision: near-dup clustering runs first
    on the NARROW (image_id, phash) plane (the phash landed at crawl
    time — no decode, no payload shuffle), producing a representative
    set; the single wide pass then semi-join-filters to representatives,
    decodes once for the quality signals, and tags buckets. Payload
    bytes never cross an all-to-all.

    ``split_fractions`` (e.g. {"train": 90, "val": 5, "test": 5})
    additionally stamps a deterministic md5-bucketed ``split`` column
    on image_id — held-out membership fixed at prep time, auditable in
    SQL (see `ops.relational.hash_split`)."""
    from ..ops.multimodal import (aspect_buckets_block, image_neardup_clusters,
                                  image_quality)
    from ..ops.relational import semi_join

    clusters = image_neardup_clusters(
        imgs.select_columns(["image_id", "phash"]), hamming_max=hamming_max)

    def reps_only(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("image_id"), b.column("cluster_id"))
        return b.filter(keep).select(["image_id"])

    reps = clusters.map_batches(reps_only, batch_format="pyarrow")
    uniq = semi_join(imgs, "image_id", reps, "image_id")
    scored = image_quality(uniq, batch_size=32)

    def quality_gate(b: pa.Table) -> pa.Table:
        mask = pc.greater_equal(b.column("entropy"),
                                pa.scalar(float(min_entropy)))
        kept = b.filter(mask)
        return aspect_buckets_block(kept.select(
            ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]))

    out = scored.map_batches(quality_gate, batch_format="pyarrow",
                             batch_size=32)
    if split_fractions:
        from ..ops.relational import hash_split
        out = hash_split(out, "image_id", split_fractions)
    return out


def prep_images(in_path: str, out_dir: str, num_shards: int = 8,
                **chain_kwargs) -> dict:
    """Run the image prep chain over an image_caption parquet and land
    it through the resumable sink (kill-safe re-runs skip sealed
    shards). Returns {written, skipped, shards_done}."""
    imgs = ray.data.read_parquet(in_path)
    out = image_prep_chain(imgs, **chain_kwargs)
    res = write_resumable(out, out_dir, "image_id", num_shards)
    res["shards_done"] = len(committed_shards(out_dir, num_shards))
    return res
