"""Unit tests for the block-vectorized crawl stages: each must equal its
reference formulation (per-group pandas / oracle logic) exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from paperchase_crawler_ray.functions.htmlparse import parse_page
from paperchase_crawler_ray.functions.robots import RobotsRules, parse_robots
from paperchase_crawler_ray.oracle import CrawlConfig
from paperchase_crawler_ray.stages.frontier import dedup_block, dedup_wave_group
from paperchase_crawler_ray.stages.politeness import schedule_block


class PolitenessSchedulerTwin:
    """Naive per-host-group pandas twin of ``schedule_block`` — the
    test oracle for the vectorized kernel (kept out of the package so
    nobody wires the slow path into a pipeline)."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["url_hash"].to_numpy(),
                            g["depth"].to_numpy(),
                            -g["priority"].to_numpy()))
        g = g.iloc[order].reset_index(drop=True)
        budget = self.cfg.host_wave_budget(float(g["crawl_delay"].iloc[0]))
        admitted = np.arange(len(g)) < budget
        g["admitted"] = admitted
        pri = g["priority"].to_numpy().copy()
        pri[~admitted] *= self.cfg.defer_decay
        g["priority"] = pri
        return g


def _frontier_table(n=500, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    hosts = [f"h{i:03d}.example" for i in range(8)]
    host_idx = rng.integers(0, 8, n)
    uh = rng.integers(0, 50, n) * 1000 + host_idx  # deliberate duplicates
    return pa.table({
        "url_canon": pa.array([f"http://{hosts[h]}/p/{u}" for h, u in
                               zip(host_idx, uh)]),
        "url_hash": pa.array(uh, pa.int64()),
        "host": pa.array([hosts[h] for h in host_idx]),
        "depth": pa.array(rng.integers(0, 4, n).astype(np.int32), pa.int32()),
        "priority": pa.array(rng.random(n), pa.float64()),
        "parent_hash": pa.array(rng.integers(0, 99, n), pa.int64()),
        "seed_id": pa.array(np.zeros(n, np.int32), pa.int32()),
        "crawl_delay": pa.array(
            np.array([float(h % 3) for h in host_idx]), pa.float64()),
    })


def test_dedup_block_matches_groupwise():
    t = _frontier_table()
    got = dedup_block(t).to_pandas().sort_values("url_hash").reset_index(drop=True)
    df = t.to_pandas()
    want = pd.concat([dedup_wave_group(g) for _, g in df.groupby("url_hash")]) \
        .sort_values("url_hash").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_dedup_block_combiner_associative():
    """Block-local pre-dedup then global dedup == global dedup (the
    combiner legality that lets the crawl pre-dedup before the shuffle)."""
    t = _frontier_table(800, seed=3)
    n = t.num_rows // 2
    part = pa.concat_tables([dedup_block(t.slice(0, n)),
                             dedup_block(t.slice(n))])
    combined = dedup_block(part).to_pandas() \
        .sort_values("url_hash").reset_index(drop=True)
    direct = dedup_block(t).to_pandas() \
        .sort_values("url_hash").reset_index(drop=True)
    pd.testing.assert_frame_equal(combined, direct)


def test_schedule_block_matches_groupwise():
    cfg = CrawlConfig()
    t = dedup_block(_frontier_table(seed=1))
    got = schedule_block(t, cfg).to_pandas() \
        .sort_values(["host", "url_hash"]).reset_index(drop=True)
    sched = PolitenessSchedulerTwin(cfg)
    df = t.to_pandas()
    want = pd.concat([sched(g) for _, g in df.groupby("host")]) \
        .sort_values(["host", "url_hash"]).reset_index(drop=True)
    want = want[got.columns]
    pd.testing.assert_frame_equal(got, want)


def test_schedule_block_budget_and_determinism():
    cfg = CrawlConfig(host_budget=4, wave_seconds=8.0)
    t = dedup_block(_frontier_table(seed=2))
    out1 = schedule_block(t, cfg)
    # permuted input -> identical admitted set (order-free determinism)
    perm = np.random.Generator(np.random.PCG64(9)).permutation(t.num_rows)
    out2 = schedule_block(t.take(pa.array(perm)), cfg)

    def admitted_set(out):
        m = out.to_pandas()
        return set(m[m["admitted"]]["url_canon"])

    assert admitted_set(out1) == admitted_set(out2)
    df = out1.to_pandas()
    for host, g in df.groupby("host"):
        delay = g["crawl_delay"].iloc[0]
        budget = cfg.host_wave_budget(float(delay))
        assert g["admitted"].sum() == min(budget, len(g))


def test_robots_parsing():
    r = parse_robots(b"User-agent: *\nDisallow: /private\nDisallow: /p/7\n"
                     b"Crawl-delay: 2\n")
    assert not r.allowed("/private/x")
    assert not r.allowed("/p/7")
    assert r.allowed("/p/70") is False or r.allowed("/p/70") is True  # prefix rule
    assert r.allowed("/public")
    assert r.crawl_delay == 2.0
    assert RobotsRules().allowed("/anything")
    empty = parse_robots(b"")
    assert empty.allowed("/x")


def test_htmlparse_links_and_captions():
    body = b"""<html><body>
      <a href="/rel">a</a>
      <a href="http://other.example/abs">b</a>
      <figure><img src="/img/1-0.png"><figcaption> Cap  one </figcaption></figure>
      <img src="/img/2-0.bmp" alt="Alt cap">
    </body></html>"""
    page = parse_page(body, "http://host.example/p/1")
    assert "http://host.example/rel" in page.outlinks
    assert "http://other.example/abs" in page.outlinks
    srcs = dict(page.images)
    assert srcs["http://host.example/img/1-0.png"].strip() == "Cap  one".strip()
    assert srcs["http://host.example/img/2-0.bmp"] == "Alt cap"


def test_generative_fetcher_matches_eager_web():
    """Lazy image synthesis must be byte-identical to the eager fixture."""
    from paperchase_crawler_ray.fixtures import gen_image_bytes, make_web
    web = make_web(n_hosts=4, total_pages=40)
    imgs = [(u, b) for u, b, c in zip(web.column("url_canon").to_pylist(),
                                      web.column("body").to_pylist(),
                                      web.column("content_type").to_pylist())
            if c.startswith("image/")]
    assert imgs
    for u, b in imgs[:20]:
        data, fmt = gen_image_bytes(u, 1)
        assert data == b, u


def test_robots_gate_ttl_refetches():
    """Cached robots rules expire after ttl_seconds and re-resolve from
    the source (the production live-crawl contract; injectable clock)."""
    import pyarrow as pa
    from paperchase_crawler_ray.stages.robots_gate import RobotsGate

    web = pa.table({
        "url_canon": ["http://h.example/robots.txt"],
        "body": [b"User-agent: *\nDisallow: /private\n"],
        "status": pa.array([200], pa.int32()),
        "content_type": ["text/plain"],
        "location": [""],
    })
    t = {"now": 0.0}
    gate = RobotsGate(web, ttl_seconds=10.0, clock=lambda: t["now"])
    batch = pa.table({"host": ["h.example"] * 2,
                      "url_canon": ["http://h.example/ok",
                                    "http://h.example/private/x"]})
    out = gate(batch)
    assert out.column("url_canon").to_pylist() == ["http://h.example/ok"]
    # origin's robots changes; cache still fresh -> old rules apply
    gate._robots_bodies["h.example"] = b"User-agent: *\nDisallow: /ok\n"
    assert gate(batch).column("url_canon").to_pylist() == ["http://h.example/ok"]
    # past TTL -> re-parse picks up the new rules
    t["now"] = 11.0
    assert gate(batch).column("url_canon").to_pylist() == \
        ["http://h.example/private/x"]


def test_synthetic_image_fetch_serves_all_fixture_formats():
    """The lazy image-fetch URL gate must 200 every fixture format —
    jpeg was silently 404ing (and thus dropped) in lazy/bench mode."""
    import pyarrow as pa
    from paperchase_crawler_ray.fixtures import _FMT_CYCLE
    from paperchase_crawler_ray.functions.codec import sniff_format
    from paperchase_crawler_ray.stages.fetch import SyntheticImageFetch

    urls = [f"http://h000.example/img/{c}-0.{fmt}"
            for c, fmt in enumerate(_FMT_CYCLE)]
    out = SyntheticImageFetch(img_scale=1)(
        pa.table({"url_canon": pa.array(urls, pa.string())}))
    assert out.column("status").to_pylist() == [200] * len(_FMT_CYCLE)
    for fmt, ct, body in zip(_FMT_CYCLE,
                             out.column("content_type").to_pylist(),
                             out.column("body").to_pylist()):
        assert ct == f"image/{fmt}"
        assert sniff_format(body) == fmt


def test_decode_write_images_retry_idempotent(tmp_path):
    """A retried decode-write batch must rewrite the SAME file with the
    SAME bytes (deterministic name + deterministic decode), leaving no
    duplicate rows behind."""
    import os

    import numpy as np
    import pyarrow as pa

    from paperchase_crawler_ray.stages.fetch import SyntheticImageFetch
    from paperchase_crawler_ray.stages.image import DecodeWriteImages

    urls = [f"http://h000.example/img/{j}-0.jpeg" for j in range(6)]
    batch = pa.table({
        "url_canon": pa.array(urls),
        "caption": pa.array([f"Figure {j}: a b under c." for j in range(6)]),
        "url_hash": pa.array(np.arange(6), pa.int64())})
    fetched = SyntheticImageFetch(1)(batch)
    d = str(tmp_path / "imgs")
    os.makedirs(d)
    sink = DecodeWriteImages(d)
    narrow1 = sink(fetched)
    files1 = sorted(os.listdir(d))
    bytes1 = open(os.path.join(d, files1[0]), "rb").read()
    narrow2 = sink(fetched)          # simulated task retry
    files2 = sorted(os.listdir(d))
    assert files1 == files2          # same single file, no duplicates
    assert open(os.path.join(d, files2[0]), "rb").read() == bytes1
    assert narrow1.equals(narrow2)


def test_schedule_salted_equals_schedule_block(ray_session):
    """The salted scheduler (uniform dedup exchange + two-level budget
    prune, stages/politeness.schedule_salted) admits the SAME rows with
    the SAME decayed priorities as the fused whole-plane kernel, on an
    80%-one-host frontier split across 5 blocks."""
    import ray.data
    from paperchase_crawler_ray.stages.politeness import schedule_salted

    cfg = CrawlConfig(host_budget=4, wave_seconds=8.0)
    t = dedup_block(_frontier_table(2000, seed=7))
    # skew: first 80% of rows move to one hot host; crawl_delay must be
    # a function of host, so rebuild it from the (new) host digits
    n = t.num_rows
    hosts = t.column("host").to_pylist()
    hot_n = int(n * 0.8)
    hosts = ["h777.example"] * hot_n + hosts[hot_n:]
    delays = [float(int(h[1:4]) % 3) for h in hosts]
    t = t.set_column(t.schema.get_field_index("host"), "host",
                     pa.array(hosts, pa.string()))
    t = t.set_column(t.schema.get_field_index("crawl_delay"),
                     "crawl_delay", pa.array(delays, pa.float64()))

    want = schedule_block(t, cfg).to_pandas() \
        .sort_values("url_hash").reset_index(drop=True)
    ds = ray.data.from_arrow(t).repartition(5).materialize()
    got_ds, counts = schedule_salted(ds, cfg, host_partitions=4)
    got = got_ds.to_pandas().sort_values("url_hash") \
        .reset_index(drop=True)[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)
    # exact per-host counts ride along
    import collections
    true_counts = collections.Counter(hosts)
    assert {h: v[0] for h, v in counts.items()} == dict(true_counts)
    # the hot host really was over budget (the exchange path ran)
    assert true_counts["h777.example"] > cfg.host_wave_budget(0.0)
