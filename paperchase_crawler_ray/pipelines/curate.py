"""End-to-end LLM-corpus curation: the pipeline a user of this engine
runs over a raw web-text dump to produce training shards.

One composition of the library's own operators — nothing here is a new
kernel, it is the PRODUCT chain (each stage cites the op that owns its
semantics and tests):

  ingest (parquet / jsonl / jsonl.gz)                 sources.read_jsonl
  -> heuristic quality gates (Gopher and/or C4)       ops/textstats
  -> corpus-wide paragraph dedup (optional)           ops/textstats
  -> exact-duplicate collapse, BEST copy wins         ops/relational
  -> MinHash-LSH near-dup dedup                       ops/dedup
  -> CCNet perplexity gate (drop the worst tercile
     per language; optional, fits a KN LM on the
     surviving corpus)                                ops/textstats+relational
  -> sliding-window token chunking                    ops/textstats
  -> deterministic md5 shuffle-to-shards              ops/relational
  -> export: resumable parquet / WebDataset tars /
     gzip JSONL                                       ops/sink, sources

Scale shape: stages 2-3 are stateless maps or one keyed exchange each;
the dedups are the bucketed two-phase ops (SCALE.md §2); the CCNet gate
adds one tiny per-language count aggregate + the stitched rank sort;
the shuffle is ONE shard-keyed exchange. The export is resumable
(sealed shards skipped on re-run) for the parquet path; tar/jsonl
exports are content-hash-named whole-file units.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


@dataclass
class CurateConfig:
    filters: tuple[str, ...] = ("gopher",)   # any of "gopher", "c4"
    paragraph_dedup: bool = False            # corpus-wide line dedup
    neardup_threshold: float | None = 0.8    # None = skip minhash pass
    ccnet_gate: bool = False                 # drop worst tercile per lang
    window: int = 64                         # chunking
    stride: int = 48
    n_shards: int = 8
    export: str = "parquet"                  # parquet | webdataset | jsonl.gz
    minhash_kwargs: dict = field(default_factory=dict)


def _load(in_path: str) -> ray.data.Dataset:
    # route on the EXTENSION only — a substring test would misroute
    # e.g. /data/jsonl_conversions/docs.parquet into the JSON parser
    from ..sources import read_jsonl
    if in_path.endswith((".jsonl", ".jsonl.gz")):
        return read_jsonl(in_path)
    return ray.data.read_parquet(in_path)


def curate_chain(docs: ray.data.Dataset, cfg: CurateConfig,
                 counters: dict | None = None) -> ray.data.Dataset:
    """The full chain up to (and including) the shard shuffle; returns
    the sharded chunk Dataset with (doc_id, chunk_id, text, shard,
    seq). ``counters`` (if given) collects per-stage survivor counts —
    each count forces that stage, so pass it in tests/audits, not in
    the streaming production run."""
    from ..ops.dedup import minhash_lsh_dedup
    from ..ops.relational import exact_dedup, grouped_ntile, \
        shuffle_to_shards
    from ..ops.textstats import (c4_stats_batch, chunk_documents,
                                 fingerprint_batch, gopher_stats_batch,
                                 kneser_ney_fit, kneser_ney_score,
                                 paragraph_dedup, token_count)

    unknown = set(cfg.filters) - {"gopher", "c4"}
    if unknown:
        # a typo'd gate must fail loudly, not ship an ungated corpus
        raise ValueError(f"unknown quality filters: {sorted(unknown)} "
                         "(known: 'gopher', 'c4')")

    def note(stage: str, ds: ray.data.Dataset) -> ray.data.Dataset:
        if counters is not None:
            counters[stage] = ds.count()
        return ds

    has_lang = "lang" in docs.schema().names
    keep_cols = ["doc_id", "text"] + (["lang"] if has_lang else [])
    docs = docs.map_batches(lambda b: b.select(keep_cols),
                            batch_format="pyarrow")
    note("ingested", docs)

    # 1. heuristic gates — fused into ONE stateless map (each *_stats
    #    kernel appends its flag; we filter and drop the helper columns)
    if cfg.filters:
        def gate(b: pa.Table) -> pa.Table:
            base = b.column_names
            if "gopher" in cfg.filters:
                s = gopher_stats_batch(b)
                b = b.filter(pc.equal(s.column("pass_gopher"), 1))
            if "c4" in cfg.filters:
                s = c4_stats_batch(b)
                b = b.filter(pc.equal(s.column("pass_c4"), 1))
            return b.select(base)
        docs = note("filtered",
                    docs.map_batches(gate, batch_format="pyarrow"))

    # 2. corpus-wide paragraph dedup (keeps doc structure; a doc whose
    #    every paragraph was seen earlier disappears)
    if cfg.paragraph_dedup:
        side = docs.select_columns(
            [c for c in keep_cols if c != "text"])
        deduped = paragraph_dedup(docs)
        docs = deduped.map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id"),
                                "text": b.column("clean_text")}),
            batch_format="pyarrow")
        if has_lang:
            from ..ops.relational import broadcast_lookup_join
            docs = broadcast_lookup_join(docs, "doc_id", side,
                                         "doc_id", ["lang"])
        docs = note("paragraph_deduped", docs)

    # 3. exact-duplicate collapse, BEST copy wins (most tokens, then
    #    lowest doc_id — the RefinedWeb canonical-selection policy)
    hashed = docs.map_batches(fingerprint_batch, batch_format="pyarrow")
    hashed = token_count(hashed)
    docs = exact_dedup(hashed, ["text_hash"],
                       [("n_tokens", True), ("doc_id", False)]) \
        .map_batches(lambda b: b.select(keep_cols),
                     batch_format="pyarrow")
    note("exact_deduped", docs)

    # 4. MinHash-LSH near-dup dedup (bucketed candidates, Dataset pair
    #    plane, distributed drop removal — ops/dedup.py)
    if cfg.neardup_threshold is not None:
        docs = note("neardup_deduped",
                    minhash_lsh_dedup(docs, "doc_id", "text",
                                      threshold=cfg.neardup_threshold,
                                      **cfg.minhash_kwargs))

    # 5. CCNet gate: fit a KN bigram LM on the survivors, keep the two
    #    best perplexity terciles per language (head + middle)
    if cfg.ccnet_gate:
        group = "lang" if has_lang else None
        model = kneser_ney_fit(docs)
        scored = kneser_ney_score(docs, model)
        if group is None:
            scored = scored.map_batches(
                lambda b: b.append_column(
                    "_g", pa.array(["all"] * b.num_rows)),
                batch_format="pyarrow")
            group = "_g"
        tiled = grouped_ntile(scored, group,
                              [("kn_logprob", True), ("doc_id", False)],
                              3, out_col="_tile")
        docs = tiled.map_batches(
            lambda b: b.filter(pc.less_equal(b.column("_tile"), 2))
            .select(keep_cols), batch_format="pyarrow")
        docs = note("ccnet_kept", docs)

    # 6. chunk + 7. deterministic global shuffle into shards
    chunks = chunk_documents(docs.select_columns(["doc_id", "text"]),
                             window=cfg.window, stride=cfg.stride)

    def chunk_key(b: pa.Table) -> pa.Table:
        # the training-sample text column is just "text" downstream
        b = b.rename_columns(
            ["text" if c == "chunk_text" else c for c in b.column_names])
        k = pc.binary_join_element_wise(
            pc.cast(b.column("doc_id"), pa.string()),
            pc.cast(b.column("chunk_id"), pa.string()), ":")
        return b.append_column("_ck", k)

    keyed = chunks.map_batches(chunk_key, batch_format="pyarrow")
    sharded = shuffle_to_shards(keyed, "_ck", cfg.n_shards)
    return sharded.map_batches(lambda b: b.drop_columns(["_ck"]),
                               batch_format="pyarrow")


def curate(in_path: str, out_dir: str,
           cfg: CurateConfig | None = None,
           counters: dict | None = None) -> dict:
    """Run the full curation over ``in_path`` and export training
    shards to ``out_dir`` in ``cfg.export`` format. Returns counters
    (always includes ``chunks_out``)."""
    import os

    from ..ops.sink import committed_shards, write_resumable
    from ..sources import write_jsonl, write_webdataset

    cfg = cfg or CurateConfig()
    counters = counters if counters is not None else {}
    sharded = curate_chain(_load(in_path), cfg, counters)

    if cfg.export == "parquet":
        res = write_resumable(sharded, out_dir,
                              num_shards=cfg.n_shards, shard_col="shard")
        counters["shards_written"] = res["written"]
        counters["shards_skipped"] = res["skipped"]
        counters["shards_done"] = len(
            committed_shards(out_dir, cfg.n_shards))
        counters["chunks_out"] = sharded.count()
    elif cfg.export == "webdataset":
        from ..ops.relational import cap_join_partitions

        def key_and_order(b: pa.Table) -> pa.Table:
            # <shard zero-padded>-<seq zero-padded> keys order the tar
            # members; BOTH components pad so lexicographic key order
            # equals (shard, seq) at any n_shards (shard 15 must not
            # sort before shard 2). The block arrives shard-co-located;
            # sort it into training order so tar iteration IS the
            # shuffle order.
            k = pc.binary_join_element_wise(
                pc.utf8_lpad(pc.cast(b.column("shard"), pa.string()),
                             6, "0"),
                pc.utf8_lpad(pc.cast(b.column("seq"), pa.string()),
                             9, "0"), "-")
            b = b.append_column("_wk", k)
            return b.take(pc.sort_indices(
                b, sort_keys=[("shard", "ascending"),
                              ("seq", "ascending")]))

        co_located = sharded.repartition(
            num_blocks=cap_join_partitions(cfg.n_shards), keys=["shard"]) \
            .map_batches(key_and_order, batch_format="pyarrow",
                         batch_size=None)
        counters["chunks_out"] = write_webdataset(
            co_located, out_dir, key_col="_wk", text_col="text",
            meta_cols=["doc_id", "chunk_id", "shard", "seq"])
    elif cfg.export == "jsonl.gz":
        os.makedirs(out_dir, exist_ok=True)
        write_jsonl(sharded, out_dir, compression="gzip")
        counters["chunks_out"] = sharded.count()
    else:
        raise ValueError(f"unknown export format: {cfg.export}")
    return counters
