"""HttpFetcher / HttpRobotsGate / FixtureWebServer tests: the real
HTTP/1.1 client must reproduce FixtureFetcher's outputs over a loopback
origin serving the same fixture web (VERDICT r4 next #2), with
connection reuse, bounded retry/backoff, and wall-clock crawl_delay
spacing."""

import time

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from paperchase_crawler_ray.fixtures import make_seeds, make_web
from paperchase_crawler_ray.stages.fetch import FixtureFetcher
from paperchase_crawler_ray.stages.httpfetch import (NETWORK_ERROR_STATUS,
                                                     FixtureWebServer,
                                                     HttpFetcher,
                                                     HttpRobotsGate)


@pytest.fixture(scope="module")
def web():
    return make_web(n_hosts=6, total_pages=40)


def _batch_of(web, urls):
    return pa.table({"url_canon": pa.array(urls, pa.string())})


def test_http_fetcher_matches_fixture_fetcher(web, ray_session):
    """For every in-table URL kind (200 html, 404, 301+Location,
    robots, image bytes) the wire result equals the broadcast-table
    result byte-for-byte."""
    urls = web.column("url_canon").to_pylist()
    sample = [u for u in urls if u.endswith("robots.txt")][:2]
    st = web.column("status").to_pylist()
    for code in (200, 301, 404):
        sample += [u for u, s in zip(urls, st) if s == code][:4]
    batch = _batch_of(web, sample)
    want = FixtureFetcher(web)(batch)
    with FixtureWebServer(web) as srv:
        f = HttpFetcher(resolve=srv.resolve, timeout=5.0)
        got = f(batch)
    for col in ("status", "content_type", "body", "location"):
        assert got.column(col).to_pylist() == want.column(col).to_pylist(), col


def test_http_fetcher_unknown_url_and_dead_server(web):
    with FixtureWebServer(web) as srv:
        f = HttpFetcher(resolve=srv.resolve, timeout=5.0)
        st, _, _, _ = f.fetch_one("http://h000.example/definitely/missing")
        assert st == 404
        dead_port = srv.port
    # server is down now: transport failure -> NETWORK_ERROR_STATUS,
    # fast bounded retries
    f2 = HttpFetcher(resolve=("127.0.0.1", dead_port), timeout=0.5,
                     retries=1, backoff=0.01)
    st, ct, body, loc = f2.fetch_one("http://h000.example/p/0")
    assert (st, ct, body, loc) == (NETWORK_ERROR_STATUS, "", b"", "")


def test_http_fetcher_retry_backoff(web):
    url = "http://h000.example/p/0"
    with FixtureWebServer(web, fail_first={url: 2}) as srv:
        f = HttpFetcher(resolve=srv.resolve, retries=2, backoff=0.01)
        st, _, body, _ = f.fetch_one(url)
        assert st == 200 and body  # two 503s then success
        statuses = [s for h, p, t, s in srv.request_log if p == "/p/0"]
        assert statuses == [503, 503, 200]
    with FixtureWebServer(web, fail_first={url: 5}) as srv:
        f = HttpFetcher(resolve=srv.resolve, retries=2, backoff=0.01)
        st, _, _, _ = f.fetch_one(url)
        assert st == 503   # retries exhausted -> last origin status
        assert len(srv.request_log) == 3


def test_http_fetcher_connection_reuse(web):
    """20 requests to one host ride ONE TCP connection (keep-alive +
    per-host connection cache)."""
    urls = [u for u in web.column("url_canon").to_pylist()
            if u.startswith("http://h000.")][:20]
    with FixtureWebServer(web) as srv:
        f = HttpFetcher(resolve=srv.resolve)
        f(_batch_of(web, urls))
        assert srv.connections_opened == 1
        # a second host opens exactly one more
        f.fetch_one("http://h001.example/p/0")
        assert srv.connections_opened == 2


def test_http_fetcher_wall_clock_spacing(web):
    """crawl_delay spacing is honored under the wall clock: consecutive
    requests to one host are >= delay apart, measured at the server."""
    urls = [u for u in web.column("url_canon").to_pylist()
            if u.startswith("http://h002.") and "/p/" in u][:4]
    delay = 0.08
    batch = pa.table({
        "url_canon": pa.array(urls, pa.string()),
        "crawl_delay": pa.array([delay] * len(urls), pa.float64())})
    with FixtureWebServer(web) as srv:
        f = HttpFetcher(resolve=srv.resolve, delay_scale=1.0)
        t0 = time.monotonic()
        f(batch)
        elapsed = time.monotonic() - t0
        times = [t for h, p, t, s in srv.request_log]
    gaps = np.diff(sorted(times))
    assert (gaps >= delay - 0.02).all(), gaps
    assert elapsed >= delay * (len(urls) - 1)
    # honor_delay=False skips the sleeps
    with FixtureWebServer(web) as srv:
        f = HttpFetcher(resolve=srv.resolve, honor_delay=False)
        t0 = time.monotonic()
        f(batch)
        assert time.monotonic() - t0 < delay * (len(urls) - 1)


def test_http_robots_gate_matches_table_rules(web, ray_session):
    """HttpRobotsGate over the wire == RobotsFilter over driver-parsed
    table rules, on a mixed-host frontier batch."""
    from paperchase_crawler_ray.stages.robots_gate import (
        RobotsFilter, robots_rules_from_web)
    urls = [u for u in web.column("url_canon").to_pylist()
            if "/p/" in u][:60]
    batch = pa.table({
        "url_canon": pa.array(urls, pa.string()),
        "host": pa.array([u.split("/")[2] for u in urls], pa.string())})
    want = RobotsFilter(robots_rules_from_web(web))(batch)
    with FixtureWebServer(web) as srv:
        gate = HttpRobotsGate(resolve=srv.resolve)
        got = gate(batch)
        # rules are cached per host: a second call fetches nothing new
        robots_hits = len([1 for h, p, t, s in srv.request_log
                           if p == "/robots.txt"])
        gate(batch)
        assert len([1 for h, p, t, s in srv.request_log
                    if p == "/robots.txt"]) == robots_hits
    assert got.column("url_canon").to_pylist() == \
        want.column("url_canon").to_pylist()
    assert got.column("crawl_delay").to_pylist() == \
        want.column("crawl_delay").to_pylist()


def test_http_robots_gate_ttl_refetch(web):
    """Expired rules re-fetch from the wire (injectable clock)."""
    clock = {"now": 0.0}
    with FixtureWebServer(web) as srv:
        gate = HttpRobotsGate(resolve=srv.resolve, ttl_seconds=10.0,
                              clock=lambda: clock["now"])
        b = pa.table({"url_canon": pa.array(["http://h001.example/p/0"]),
                      "host": pa.array(["h001.example"])})
        gate(b)
        gate(b)
        assert len(srv.request_log) == 1
        clock["now"] = 11.0
        gate(b)
        assert len(srv.request_log) == 2


def _seed_rows(seeds):
    return list(zip(*[seeds.column(c).to_pylist()
                      for c in ("url", "seed_id", "priority")]))


def test_http_crawl_e2e_matches_oracle(ray_session, tmp_path):
    """The full crawl over 127.0.0.1 — HttpFetcher pages+images,
    HttpRobotsGate robots, host-affine fetch — reproduces the oracle's
    crawl ordering, seen set and landed image set exactly (the same
    equality gates FixtureFetcher passes), and the server observes
    wall-clock crawl_delay spacing per host."""
    from paperchase_crawler_ray.oracle import (CrawlConfig, crawl_oracle,
                                               web_table_to_dict)
    from paperchase_crawler_ray.pipelines.crawl import RunConfig, crawl
    web = make_web(n_hosts=6, total_pages=40)
    seeds = make_seeds(3, 6)
    cfg = CrawlConfig(max_waves=3)
    scale = 0.03   # seconds per crawl_delay unit (fixture units 0/1/2)
    with FixtureWebServer(web) as srv:
        run = RunConfig(
            fetcher_cls=HttpFetcher,
            fetcher_args=(srv.resolve, 5.0, 2, 0.02, True, scale),
            host_affine_fetch=True,
            robots_http={"resolve": srv.resolve})
        res = crawl(web, seeds, str(tmp_path / "out"), cfg, run)
        log = list(srv.request_log)

    o = crawl_oracle(web_table_to_dict(web), _seed_rows(seeds), cfg)
    assert res.admitted_per_wave() == o.admitted_per_wave
    assert res.seen_hashes() == o.seen_hashes
    imgs = res.images_dataset().to_pandas()
    oimg = {r["image_id"]: r for r in o.image_rows}
    assert set(imgs["image_id"]) == set(oimg)
    assert all(oimg[r.image_id]["caption"] == r.caption
               and oimg[r.image_id]["phash"] == r.phash
               for r in imgs.itertuples())

    # politeness spacing under the wall clock: consecutive PAGE requests
    # to a delayed host arrive >= crawl_delay * scale apart (between-wave
    # gaps are much larger, so the min-gap check is safe)
    by_host: dict = {}
    for host, path, t, status in log:
        if "/p/" in path:
            by_host.setdefault(host, []).append(t)
    checked = 0
    for host, times in by_host.items():
        delay = float(int(host[1:4]) % 3) * scale
        if delay > 0 and len(times) > 1:
            gaps = np.diff(sorted(times))
            assert (gaps >= delay - 0.02).all(), (host, gaps)
            checked += 1
    assert checked >= 2   # hosts with delay 1 and 2 were exercised
