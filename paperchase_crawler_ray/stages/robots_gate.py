"""Robots.txt gating as an actor-pool map_batches stage (SURVEY.md A2).

Actor state (loaded once per actor in ``__init__``): the robots source —
in the sandbox a broadcast fixture-web object ref (``ray.put`` once on the
driver, read once per actor); in production an HTTP fetcher. Parsed rules
are cached per host with a bounded LRU-ish dict, so a host's robots.txt
is parsed once per actor, not once per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.robots import RobotsRules, parse_robots


def _path_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    return "/" + rest.split("/", 1)[-1] if "/" in rest else "/"


def robots_rules_from_web(web: pa.Table) -> dict[str, RobotsRules]:
    """Driver-side one-time parse of every host's robots.txt (tiny: one
    entry per host). The resulting dict rides inside the task closure —
    at real scale, ``ray.put`` it and resolve in an actor pool instead."""
    mask = pa.array([u.endswith("/robots.txt")
                     for u in web.column("url_canon").to_pylist()])
    sub = web.filter(mask)
    return {
        u.split("://", 1)[-1].rsplit("/robots.txt", 1)[0]: parse_robots(b)
        for u, b in zip(sub.column("url_canon").to_pylist(),
                        sub.column("body").to_pylist())
    }


class RobotsFilter:
    """Task-based map_batches fn: drop disallowed URLs, attach
    ``crawl_delay``; rules pre-parsed once on the driver."""

    def __init__(self, rules: dict[str, RobotsRules]):
        self._rules = rules
        self._default = RobotsRules()

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        urls = batch.column("url_canon").to_pylist()
        keep = np.zeros(len(hosts), bool)
        delays = np.zeros(len(hosts), np.float64)
        for i, (host, u) in enumerate(zip(hosts, urls)):
            rules = self._rules.get(host, self._default)
            if rules.allowed(_path_of(u)):
                keep[i] = True
                delays[i] = rules.crawl_delay
        out = batch.append_column("crawl_delay", pa.array(delays, pa.float64()))
        return out.filter(pa.array(keep))


class RobotsGate:
    """Actor-pool variant of the gate for deployments where the robots
    source is too big to pre-parse on the driver (SCALE.md §1): each
    actor lazily parses rules per host from a broadcast robots table,
    with a bounded cache, then delegates filtering to RobotsFilter."""

    def __init__(self, web_ref, max_cached_hosts: int = 100_000,
                 ttl_seconds: float = float("inf"), clock=None):
        import time

        web = ray.get(web_ref) if not isinstance(web_ref, pa.Table) else web_ref
        # robots rows only — small even for a big fixture web
        mask = [u.endswith("/robots.txt") for u in web.column("url_canon").to_pylist()]
        sub = web.filter(pa.array(mask))
        self._robots_bodies = {
            u.split("://", 1)[-1].rsplit("/robots.txt", 1)[0]: b
            for u, b in zip(sub.column("url_canon").to_pylist(),
                            sub.column("body").to_pylist())
        }
        self._rules: dict[str, RobotsRules] = {}
        self._max_cached = max_cached_hosts
        # TTL: cached rules expire and re-resolve from the source — a
        # no-op against a static fixture web, but the production contract
        # (robots change under a live crawl). ``clock`` is injectable so
        # tests can drive expiry deterministically.
        self._ttl = ttl_seconds
        self._clock = clock or time.monotonic
        self._expiry: dict[str, float] = {}

    def _rules_for(self, host: str) -> RobotsRules:
        now = self._clock()
        r = self._rules.get(host)
        if r is None or self._expiry.get(host, float("inf")) <= now:
            body = self._robots_bodies.get(host)
            r = parse_robots(body) if body is not None else RobotsRules()
            if len(self._rules) >= self._max_cached:
                self._rules.clear()
                self._expiry.clear()
            self._rules[host] = r
            self._expiry[host] = now + self._ttl
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        for host in set(batch.column("host").to_pylist()):
            self._rules_for(host)
        return RobotsFilter(self._rules)(batch)
