"""Shared fixtures: ONE Ray session per pytest run (driver instruction),
plus the fixture web / oracle-crawl pair reused by the e2e tests."""

from __future__ import annotations

import pytest
import ray

from paperchase_crawler_ray.fixtures import make_seeds, make_web
from paperchase_crawler_ray.oracle import CrawlConfig, crawl_oracle, web_table_to_dict


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True)
    yield
    ray.shutdown()


N_HOSTS = 8
TOTAL_PAGES = 60
N_SEEDS = 4
MAX_WAVES = 4


@pytest.fixture(scope="session")
def fixture_web():
    return make_web(n_hosts=N_HOSTS, total_pages=TOTAL_PAGES)


@pytest.fixture(scope="session")
def fixture_seeds():
    return make_seeds(N_SEEDS, N_HOSTS)


@pytest.fixture(scope="session")
def crawl_cfg():
    return CrawlConfig(max_waves=MAX_WAVES)


@pytest.fixture(scope="session")
def oracle_result(fixture_web, fixture_seeds, crawl_cfg):
    seeds = [
        (u, s, p)
        for u, s, p in zip(
            fixture_seeds.column("url").to_pylist(),
            fixture_seeds.column("seed_id").to_pylist(),
            fixture_seeds.column("priority").to_pylist(),
        )
    ]
    return crawl_oracle(web_table_to_dict(fixture_web), seeds, crawl_cfg)
