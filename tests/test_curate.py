"""End-to-end tests for pipelines/curate.py — the composed LLM-corpus
curation product chain. Each stage's kernel has its own unit tests in
test_ops.py; here we verify the COMPOSITION: counters are monotone,
the parquet export is resumable (sealed shards skipped on re-run), the
result is deterministic across runs, and every export format carries
the same chunk set."""

import glob
import gzip
import json
import os

import pyarrow.parquet as pq
import pytest
import ray

from paperchase_crawler_ray.pipelines.curate import (CurateConfig,
                                                     curate, curate_chain)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _chunk_set(dir_: str, n_shards: int) -> set:
    from paperchase_crawler_ray.ops.sink import read_resumable
    t = read_resumable(dir_, n_shards).to_pandas()
    return set(zip(t["doc_id"], t["chunk_id"], t["text"],
                   t["shard"], t["seq"]))


def test_curate_parquet_resume_and_determinism(ray_session, tmp_path):
    cfg = CurateConfig(filters=("gopher",), neardup_threshold=0.8,
                       ccnet_gate=True, n_shards=4)
    out1 = str(tmp_path / "run1")
    c1 = {}
    curate(DOCS, out1, cfg, c1)
    # monotone survivor counts through the destructive stages
    assert c1["ingested"] >= c1["filtered"] >= c1["exact_deduped"] \
        >= c1["neardup_deduped"] >= c1["ccnet_kept"] > 0
    assert c1["chunks_out"] > 0
    assert sorted(c1["shards_written"]) == [0, 1, 2, 3]
    assert c1["shards_skipped"] == []

    # resume: second run over the same out_dir writes nothing new
    c2 = {}
    curate(DOCS, out1, cfg, c2)
    assert c2["shards_written"] == []
    assert sorted(c2["shards_skipped"]) == [0, 1, 2, 3]

    # determinism: a fresh run lands the identical chunk set
    out2 = str(tmp_path / "run2")
    curate(DOCS, out2, cfg, {})
    assert _chunk_set(out1, 4) == _chunk_set(out2, 4)

    # partial resume: wipe one shard's _COMMITTED, only it is rewritten
    os.remove(os.path.join(out1, "shard=2", "_COMMITTED"))
    for f in glob.glob(os.path.join(out1, "shard=2", "*.parquet")):
        os.remove(f)
    c3 = {}
    curate(DOCS, out1, cfg, c3)
    assert c3["shards_written"] == [2]
    assert sorted(c3["shards_skipped"]) == [0, 1, 3]
    assert _chunk_set(out1, 4) == _chunk_set(out2, 4)


def test_curate_exports_agree(ray_session, tmp_path):
    """All three export formats carry the same (doc_id, chunk_id, text)
    multiset; the webdataset tars iterate in (shard, seq) order."""
    cfg = CurateConfig(filters=("gopher",), neardup_threshold=None,
                       n_shards=2)
    outs = {}
    for fmt in ("parquet", "webdataset", "jsonl.gz"):
        d = str(tmp_path / fmt)
        curate(DOCS, d, CurateConfig(**{**cfg.__dict__, "export": fmt}),
               {})
        outs[fmt] = d

    from paperchase_crawler_ray.ops.sink import read_resumable
    from paperchase_crawler_ray.sources import read_webdataset
    ref = read_resumable(outs["parquet"], 2).to_pandas()
    ref_set = set(zip(ref["doc_id"], ref["chunk_id"], ref["text"]))

    wds = read_webdataset(outs["webdataset"]).to_pandas()
    wds_set = set(zip(wds["doc_id"], wds["chunk_id"], wds["text"]))
    assert wds_set == ref_set
    # tar member keys sort identically to (shard, seq) training order
    key_sorted = wds.sort_values("key")
    pairs = list(zip(key_sorted["shard"], key_sorted["seq"]))
    assert pairs == sorted(pairs)

    rows = []
    for f in sorted(glob.glob(os.path.join(outs["jsonl.gz"], "*.gz"))):
        with gzip.open(f, "rt") as fh:
            rows += [json.loads(line) for line in fh]
    jl_set = set((r["doc_id"], r["chunk_id"], r["text"]) for r in rows)
    assert jl_set == ref_set


def test_curate_chain_stage_toggles(ray_session):
    """Optional stages only ever shrink the survivor set, and the
    chunk schema is stable across configurations."""
    docs = ray.data.read_parquet(DOCS, columns=["doc_id", "text", "lang"])
    base = curate_chain(docs, CurateConfig(filters=(), n_shards=2,
                                           neardup_threshold=None))
    with_filters = curate_chain(
        docs, CurateConfig(filters=("gopher",), n_shards=2,
                           neardup_threshold=None))
    nb, nf = base.count(), with_filters.count()
    assert 0 < nf <= nb
    # c4 stacks on gopher and only ever shrinks further (the synthetic
    # corpus fails c4's terminal-punctuation rule, so possibly to zero)
    both = curate_chain(docs, CurateConfig(filters=("gopher", "c4"),
                                           n_shards=2,
                                           neardup_threshold=None))
    assert both.count() <= nf
    assert set(base.schema().names) == set(with_filters.schema().names)
    assert {"doc_id", "chunk_id", "text", "shard",
            "seq"} <= set(base.schema().names)
    # shard ids in range, seq contiguous from 0 within each shard
    t = base.to_pandas()
    assert t["shard"].between(0, 1).all()
    for _, g in t.groupby("shard"):
        assert sorted(g["seq"]) == list(range(len(g)))


def test_write_resumable_shard_col_matches_layout(ray_session, tmp_path):
    """shard_col path: the storage shard equals the precomputed column
    (no re-hash), so training layout == storage layout."""
    import pandas as pd
    df = pd.DataFrame({"k": range(40), "shard": [i % 4 for i in range(40)]})
    out = str(tmp_path / "sc")
    res = write_resumable_call(df, out)
    assert sorted(res["written"]) == [0, 1, 2, 3]
    for s in range(4):
        import pandas as pd
        files = glob.glob(os.path.join(out, f"shard={s}", "*.parquet"))
        got = pd.concat([pq.read_table(f).to_pandas() for f in files])
        assert (got["shard"] == s).all()
        assert sorted(got["k"]) == [i for i in range(40) if i % 4 == s]
    with pytest.raises(ValueError):
        from paperchase_crawler_ray.ops.sink import write_resumable
        write_resumable(ray.data.from_pandas(df), out, key_col="k",
                        shard_col="shard")


def write_resumable_call(df, out):
    from paperchase_crawler_ray.ops.sink import write_resumable
    return write_resumable(ray.data.from_pandas(df).repartition(3), out,
                           num_shards=4, shard_col="shard")


def test_webdataset_key_order_many_shards(ray_session, tmp_path):
    """Tar member keys must sort as (shard, seq) even when n_shards >
    10 — the shard component is zero-padded too (review fix: '15-…'
    must not sort before '2-…')."""
    import json
    from paperchase_crawler_ray.sources import read_webdataset
    cfg = CurateConfig(filters=("gopher",), neardup_threshold=None,
                       n_shards=12, export="webdataset")
    out = str(tmp_path / "wds12")
    curate(DOCS, out, cfg, {})
    wds = read_webdataset(out).to_pandas()
    assert wds["shard"].max() >= 10      # the regression regime
    key_sorted = wds.sort_values("key")
    pairs = list(zip(key_sorted["shard"], key_sorted["seq"]))
    assert pairs == sorted(pairs)
