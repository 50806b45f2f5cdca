"""End-to-end golden tests (SURVEY.md §5.2 items 2 & 4, BASELINE.json:14-15):

the distributed Ray crawl must reproduce the single-threaded pure-Python
oracle crawler exactly — per-wave admitted ordering, final URL-seen set —
and every landed image row must satisfy the per-row invariants
(decoded-pixel equality / PSNR≥40dB, exact caption equality, phash).
Also: parallelism invariance and kill-resume equivalence.
"""

import shutil

import numpy as np
import pytest

from paperchase_crawler_ray.functions.codec import decode, psnr
from paperchase_crawler_ray.fixtures import make_pixels
from paperchase_crawler_ray.pipelines.crawl import RunConfig, crawl


@pytest.fixture(scope="module")
def ray_result(fixture_web, fixture_seeds, crawl_cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    return crawl(fixture_web, fixture_seeds, out, crawl_cfg,
                 RunConfig(nshards=4, fetch_concurrency=2))


def test_host_link_graph_matches_naive(ray_result):
    """Post-crawl analysis: the distributed host graph must equal a
    pandas reconstruction from the same on-disk wave artifacts, and
    host PageRank must run over it."""
    import glob
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from paperchase_crawler_ray.functions.urlnorm import (canonicalize,
                                                          extract_host)
    from paperchase_crawler_ray.pipelines.analyze import (host_link_graph,
                                                          host_pagerank)
    out = ray_result.out_dir
    got = host_link_graph(out).to_pandas() \
        .sort_values(["src_host", "dst_host"]).reset_index(drop=True)
    waves = [wd for wd in sorted(glob.glob(os.path.join(out, "wave=*")))
             if os.path.exists(os.path.join(wd, "_COMMITTED"))]
    fr = pd.concat([pq.read_table(f).to_pandas() for wd in waves
                    for f in sorted(glob.glob(wd + "/frontier/*.parquet"))])
    adm = pd.concat([pq.read_table(f).to_pandas() for wd in waves
                     for f in sorted(glob.glob(wd + "/admitted/*.parquet"))])
    h = dict(zip(adm["url_hash"], adm["host"]))
    fr = fr[(fr["parent_hash"] != 0) & fr["parent_hash"].isin(h)]
    want = pd.DataFrame({
        "src_host": fr["parent_hash"].map(h),
        "dst_host": [extract_host(canonicalize(u)) for u in fr["url"]]}) \
        .groupby(["src_host", "dst_host"]).size().reset_index(name="n_links") \
        .sort_values(["src_host", "dst_host"]).reset_index(drop=True)
    assert got.equals(want) and len(got) > 0
    pr = host_pagerank(out, iters=4).to_pandas()
    assert len(pr) > 0 and (pr["score"] > 0).all()


def test_admitted_ordering_matches_oracle(ray_result, oracle_result):
    got = ray_result.admitted_per_wave()
    want = oracle_result.admitted_per_wave[: ray_result.waves_run]
    assert got == want


def test_seen_set_matches_oracle(ray_result, oracle_result):
    assert ray_result.seen_hashes() == oracle_result.seen_hashes


def test_counters_match_oracle(ray_result, oracle_result):
    rc, oc = ray_result.counters, oracle_result.counters
    assert rc["admitted"] == oc["admitted"]
    assert rc["deferred"] == oc["deferred"]
    assert rc["images_landed"] == oc["images_landed"]


def test_image_rows_match_oracle(ray_result, oracle_result):
    imgs = ray_result.images_dataset().to_pandas()
    oracle_by_id = {r["image_id"]: r for r in oracle_result.image_rows}
    assert sorted(imgs["image_id"]) == sorted(oracle_by_id)
    for row in imgs.itertuples():
        o = oracle_by_id[row.image_id]
        assert row.caption == o["caption"]          # exact caption equality
        assert row.phash == o["phash"]
        assert row.w == o["w"] and row.h == o["h"] and row.fmt == o["fmt"]
        # per-row pixel invariant vs ground-truth pixels: PSNR>=40dB for
        # the lossy format, exact equality for the lossless ones
        px = decode(bytes(row.bytes))
        truth = make_pixels(row.image_id, row.w, row.h)
        assert psnr(truth, px) >= 40.0
        if row.fmt != "jpeg":
            assert (px == truth).all()


def test_parallelism_invariance(fixture_web, fixture_seeds, crawl_cfg,
                                oracle_result, tmp_path):
    """Same admitted order and seen set at a different shard/actor count."""
    out = str(tmp_path / "p1")
    res = crawl(fixture_web, fixture_seeds, out, crawl_cfg,
                RunConfig(nshards=1, fetch_concurrency=1))
    assert res.admitted_per_wave() == oracle_result.admitted_per_wave[: res.waves_run]
    assert res.seen_hashes() == oracle_result.seen_hashes


def test_robots_actor_mode_matches_oracle(fixture_web, fixture_seeds,
                                          crawl_cfg, oracle_result, tmp_path):
    """robots_mode='actor' (lazy TTL'd actor-pool rules cache — the
    SCALE.md path for robots corpora beyond driver memory) must be
    semantically identical to the driver-parsed dict."""
    out = str(tmp_path / "ract")
    res = crawl(fixture_web, fixture_seeds, out, crawl_cfg,
                RunConfig(nshards=4, driver_wave_max=0, host_partitions=4,
                          robots_mode="actor"))
    assert res.admitted_per_wave() == oracle_result.admitted_per_wave[: res.waves_run]
    assert res.seen_hashes() == oracle_result.seen_hashes


def test_distributed_frontier_plane_matches_oracle(fixture_web, fixture_seeds,
                                                   crawl_cfg, oracle_result,
                                                   tmp_path):
    """Force the DISTRIBUTED frontier plane (hash shuffle + block stages)
    even for tiny waves — must equal the oracle exactly, like the
    driver-local fast path the other tests exercise."""
    out = str(tmp_path / "dist")
    res = crawl(fixture_web, fixture_seeds, out, crawl_cfg,
                RunConfig(nshards=4, driver_wave_max=0, host_partitions=4))
    assert res.admitted_per_wave() == oracle_result.admitted_per_wave[: res.waves_run]
    assert res.seen_hashes() == oracle_result.seen_hashes
    imgs = res.images_dataset().to_pandas()
    want_ids = sorted(r["image_id"] for r in oracle_result.image_rows)
    assert sorted(imgs["image_id"]) == want_ids


def test_resume_from_checkpoint(fixture_web, fixture_seeds, crawl_cfg,
                                ray_result, tmp_path):
    """Kill after wave 1 commit (simulated by truncating the output dir),
    restart, final results identical to the uninterrupted run."""
    out = str(tmp_path / "resume")
    # run only waves 0-1 by limiting max_waves, then resume with full cfg
    from dataclasses import replace
    res1 = crawl(fixture_web, fixture_seeds, out, replace(crawl_cfg, max_waves=2),
                 RunConfig(nshards=4))
    assert res1.waves_run == 2
    # wave-2 frontier was written by wave 1; delete nothing — resume
    res2 = crawl(fixture_web, fixture_seeds, out, crawl_cfg, RunConfig(nshards=4))
    assert res2.waves_run == ray_result.waves_run
    assert res2.admitted_per_wave() == ray_result.admitted_per_wave()
    assert res2.seen_hashes() == ray_result.seen_hashes()
    full = ray_result.images_dataset().to_pandas()
    resumed = res2.images_dataset().to_pandas()
    assert sorted(resumed["image_id"]) == sorted(full["image_id"])


def test_partial_wave_rerun_is_idempotent(fixture_web, fixture_seeds, crawl_cfg,
                                          ray_result, tmp_path):
    """A wave directory without _COMMITTED is rerun; results unchanged."""
    import os
    out = str(tmp_path / "partial")
    res1 = crawl(fixture_web, fixture_seeds, out, crawl_cfg, RunConfig(nshards=4))
    last = res1.waves_run - 1
    # simulate a crash mid-wave: drop the last commit marker + its outputs
    wd = os.path.join(out, f"wave={last}")
    os.remove(os.path.join(wd, "_COMMITTED"))
    for sub in ("admitted", "parsed", "images", "seen"):
        p = os.path.join(wd, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
    res2 = crawl(fixture_web, fixture_seeds, out, crawl_cfg, RunConfig(nshards=4))
    assert res2.admitted_per_wave() == res1.admitted_per_wave()
    assert res2.seen_hashes() == res1.seen_hashes()


def test_distributed_tombstone_plane_matches_oracle(fixture_web,
                                                    fixture_seeds, crawl_cfg,
                                                    oracle_result, tmp_path):
    """Force the Dataset tombstone path (neardup_driver_max=0: the drop
    plane is computed in bucket-keyed blocks and written as a parquet
    DIRECTORY, never consolidating on the driver — r3 verdict wrong #3)
    AND the anti-join read path (broadcast_max=0): the reader view must
    equal the oracle's image set either way, and a rerun of the last
    wave (crash simulation) must be idempotent."""
    import os
    out = str(tmp_path / "dist_ts")
    res = crawl(fixture_web, fixture_seeds, out, crawl_cfg,
                RunConfig(nshards=4, neardup_driver_max=0,
                          neardup_partitions=2))
    want_ids = sorted(r["image_id"] for r in oracle_result.image_rows)
    got = res.images_dataset().to_pandas()
    assert sorted(got["image_id"]) == want_ids
    # the fixture web has no near-dups, so the Dataset path writes NO
    # sidecar at all (absent sidecar == no drops; the single-file form
    # belongs to the driver path only) — the nonzero-drop directory
    # layout is exercised by test_sources.test_dataset_tombstone_dir
    assert not any(
        os.path.exists(os.path.join(out, d, "images_tombstones.parquet"))
        for d in os.listdir(out))
    # read side forced through the keyed anti join
    got_aj = res.images_dataset(broadcast_max=0).to_pandas()
    assert sorted(got_aj["image_id"]) == want_ids
    assert "bucket" not in got_aj.columns
    # crash simulation: drop the last commit marker + outputs, rerun
    last = res.waves_run - 1
    wd = os.path.join(out, f"wave={last}")
    os.remove(os.path.join(wd, "_COMMITTED"))
    for sub in ("admitted", "parsed", "images", "images_tombstones", "seen"):
        p = os.path.join(wd, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
    res2 = crawl(fixture_web, fixture_seeds, out, crawl_cfg,
                 RunConfig(nshards=4, neardup_driver_max=0,
                           neardup_partitions=2))
    assert sorted(res2.images_dataset().to_pandas()["image_id"]) == want_ids


def test_lineage_reconciles(ray_result):
    """Lineage rows exist for every wave and stage counts are coherent."""
    stages = {}
    for r in ray_result.lineage:
        stages.setdefault(r["wave"], set()).add(r["stage"])
    assert set(stages) == set(range(ray_result.waves_run))
    for w in stages:
        assert {"frontier", "schedule", "fetch_parse", "images"} <= stages[w]
    # in-band fetch_seq (SURVEY §2.10) reconciles: one contiguous global
    # sequence across waves, each wave's span matching its admitted count
    base = 0
    for lo, hi, n in ray_result.fetch_seq_bounds():
        if n == 0:
            continue
        assert (lo, hi) == (base, base + n - 1)
        base += n
    schedule_out = sum(r["rows_out"] for r in ray_result.lineage
                       if r["stage"] == "schedule")
    assert base == schedule_out


def test_lazy_image_mode_matches_eager(fixture_seeds, crawl_cfg,
                                       tmp_path_factory, ray_result):
    """lazy_images=True (bench mode: HTML-only web, bytes synthesized in
    the fetch stage) must land the identical image set, captions, and
    phashes as the eager materialized-web crawl — every fixture format
    included. Guards the lazy fetch's URL gate (jpeg once 404'd here)."""
    from paperchase_crawler_ray.fixtures import make_web
    lazy_web = make_web(n_hosts=8, total_pages=60, materialize_images=False)
    out = str(tmp_path_factory.mktemp("lazy_crawl"))
    res = crawl(lazy_web, fixture_seeds, out, crawl_cfg,
                RunConfig(nshards=2, lazy_images=True))
    lazy_imgs = res.images_dataset().to_pandas().set_index("image_id")
    eager_imgs = ray_result.images_dataset().to_pandas().set_index("image_id")
    assert sorted(lazy_imgs.index) == sorted(eager_imgs.index)
    assert set(lazy_imgs["fmt"]) == {"jpeg", "png", "bmp", "raw"}
    for iid in lazy_imgs.index:
        assert lazy_imgs.loc[iid, "caption"] == eager_imgs.loc[iid, "caption"]
        assert lazy_imgs.loc[iid, "phash"] == eager_imgs.loc[iid, "phash"]
        assert bytes(lazy_imgs.loc[iid, "bytes"]) == \
            bytes(eager_imgs.loc[iid, "bytes"])


def test_snapshot_diff_between_crawl_checkpoints(fixture_web, fixture_seeds,
                                                 tmp_path):
    """CDC integration: diffing the landed image tables of a 3-wave and
    a 4-wave crawl of the SAME web must classify exactly the wave-4
    images as 'added' — no removals, no changes (image content is
    deterministic)."""
    from paperchase_crawler_ray.oracle import CrawlConfig
    from paperchase_crawler_ray.ops.relational import snapshot_diff

    r3 = crawl(fixture_web, fixture_seeds, str(tmp_path / "w3"),
               CrawlConfig(max_waves=3))
    r4 = crawl(fixture_web, fixture_seeds, str(tmp_path / "w4"),
               CrawlConfig(max_waves=4))
    old = r3.images_dataset().select_columns(["image_id", "phash"])
    new = r4.images_dataset().select_columns(["image_id", "phash"])
    diff = snapshot_diff(old, new, "image_id", ["phash"]).to_pandas()
    ids3 = set(r3.images_dataset().to_pandas()["image_id"])
    ids4 = set(r4.images_dataset().to_pandas()["image_id"])
    assert set(diff["change"]) <= {"added"}
    assert set(diff["image_id"]) == ids4 - ids3
    assert len(ids4 - ids3) > 0  # wave 4 actually landed new images


def test_salted_sched_mode_matches_oracle(fixture_web, fixture_seeds,
                                          crawl_cfg, oracle_result,
                                          tmp_path):
    """sched_mode='salted' (uniform url_hash dedup exchange + candidate
    prune — the adversarial-skew path) must reproduce the oracle's
    ordering, seen set and image set exactly, on the forced-distributed
    plane."""
    out = str(tmp_path / "salt")
    res = crawl(fixture_web, fixture_seeds, out, crawl_cfg,
                RunConfig(nshards=4, driver_wave_max=0, host_partitions=4,
                          sched_mode="salted"))
    assert res.admitted_per_wave() == \
        oracle_result.admitted_per_wave[: res.waves_run]
    assert res.seen_hashes() == oracle_result.seen_hashes
    imgs = res.images_dataset().to_pandas()
    want_ids = sorted(r["image_id"] for r in oracle_result.image_rows)
    assert sorted(imgs["image_id"]) == want_ids
