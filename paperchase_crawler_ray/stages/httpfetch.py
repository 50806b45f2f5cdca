"""Production HTTP fetch stage (SURVEY.md A4 "HTTP client in prod").

``HttpFetcher`` is a real HTTP/1.1 client with the SAME batch signature
as ``FixtureFetcher`` (frontier rows in -> status / content_type / body
/ location columns appended), so ``pipelines/crawl.py`` can swap it in
unchanged: redirects are NOT followed (the crawl loop owns redirect
semantics via the ``location`` column, exactly as in fixture mode), and
politeness ADMISSION is owned upstream by A3 — this stage adds the
wall-clock per-host REQUEST SPACING a live crawl needs on top.

Actor-state pattern (the reason this is an actor-pool stage):
  - one ``http.client.HTTPConnection`` per host, kept open across
    batches (HTTP keep-alive; per-host connection reuse),
  - a per-host last-request wall clock driving ``crawl_delay`` spacing,
  - retry/backoff state is per request, bounded, with jitter-free
    exponential sleeps (deterministic test timing).

Partitioning assumption (documented per SURVEY §2 custom-operator
rule): per-host spacing state is PER ACTOR, so global spacing holds
when the admitted stream reaches the fetch pool host-clustered — which
the crawl pipeline guarantees (politeness runs after
``repartition(keys=["host"])`` and blocks stay host-clustered through
admission). With an un-partitioned stream the spacing degrades to
per-actor best effort, never below ``crawl_delay / n_actors``.

The sandbox has no external network, so the e2e tests drive this
client against ``serve_fixture_web`` — a loopback ``http.server``
serving the SAME deterministic fixture web the oracle crawls, routed
by Host header. Nothing in ``HttpFetcher`` knows it is talking to a
fixture: give ``resolve=None`` in production and hosts resolve via
real DNS.
"""

from __future__ import annotations

import http.client
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

#: status code reported for transport-level failures (DNS, refused,
#: timeout, exhausted retries) — distinct from any origin status.
NETWORK_ERROR_STATUS = 599

_RETRYABLE_STATUS = (502, 503, 504)


class HttpFetcher:
    """map_batches actor: frontier rows -> fetched page rows, over HTTP.

    Parameters
    ----------
    resolve:
        host -> ``(address, port)`` map for connection establishment
        (the injectable DNS layer). Hosts absent from the map connect
        to ``(host, 80)``. A plain ``(address, port)`` tuple routes
        EVERY host there (the loopback-test mode); the original host
        always rides the ``Host:`` header.
    timeout:         socket timeout per request, seconds.
    retries:         extra attempts after the first, on transport
                     errors and 502/503/504.
    backoff:         first retry sleep; doubles per attempt.
    honor_delay:     space consecutive requests to one host by its
                     ``crawl_delay`` column (wall clock). Admission
                     budgets are upstream (A3); this is the live-crawl
                     inter-request courtesy gap.
    max_body_bytes:  truncate larger bodies (defense vs huge pages).
    """

    def __init__(self, resolve=None, timeout: float = 10.0,
                 retries: int = 2, backoff: float = 0.1,
                 honor_delay: bool = True, delay_scale: float = 1.0,
                 max_body_bytes: int = 16 * 1024 * 1024,
                 user_agent: str = "paperchase-ray/1.0"):
        self._resolve = resolve
        self.timeout = float(timeout)
        self.retries = int(retries)
        self.backoff = float(backoff)
        self.honor_delay = bool(honor_delay)
        # seconds per crawl_delay unit (fixture robots use small integer
        # "virtual units"; tests scale them down to keep wall time sane)
        self.delay_scale = float(delay_scale)
        self.max_body_bytes = int(max_body_bytes)
        self.user_agent = user_agent
        self._conns: dict[str, http.client.HTTPConnection] = {}
        self._last_request: dict[str, float] = {}

    # -- connection management -------------------------------------------

    def _addr(self, host: str) -> tuple[str, int]:
        if isinstance(self._resolve, tuple):
            return self._resolve
        if isinstance(self._resolve, dict) and host in self._resolve:
            return tuple(self._resolve[host])
        return (host, 80)

    def _conn(self, host: str) -> http.client.HTTPConnection:
        c = self._conns.get(host)
        if c is None:
            addr, port = self._addr(host)
            c = http.client.HTTPConnection(addr, port,
                                           timeout=self.timeout)
            self._conns[host] = c
        return c

    def _drop_conn(self, host: str) -> None:
        c = self._conns.pop(host, None)
        if c is not None:
            try:
                c.close()
            except Exception:
                pass

    # -- request path ----------------------------------------------------

    def _space(self, host: str, delay: float) -> None:
        if not self.honor_delay or delay <= 0:
            return
        last = self._last_request.get(host)
        if last is not None:
            wait = last + delay - time.monotonic()
            if wait > 0:
                time.sleep(wait)

    def _request_once(self, host: str, target: str
                      ) -> tuple[int, str, bytes, str]:
        c = self._conn(host)
        try:
            c.request("GET", target, headers={
                "Host": host, "User-Agent": self.user_agent,
                "Accept": "*/*"})
            r = c.getresponse()
            body = r.read(self.max_body_bytes + 1)[:self.max_body_bytes]
            return (r.status, r.getheader("Content-Type") or "",
                    body, r.getheader("Location") or "")
        except Exception:
            # dead keep-alive sockets, refused connects, timeouts all
            # land here; the caller decides whether to retry
            self._drop_conn(host)
            raise

    def fetch_one(self, url: str, crawl_delay: float = 0.0
                  ) -> tuple[int, str, bytes, str]:
        parts = urlsplit(url)
        host = parts.hostname or ""
        target = (parts.path or "/") + (f"?{parts.query}"
                                        if parts.query else "")
        self._space(host, crawl_delay * self.delay_scale)
        sleep = self.backoff
        for attempt in range(self.retries + 1):
            self._last_request[host] = time.monotonic()
            try:
                st, ct, body, loc = self._request_once(host, target)
            except Exception:
                if attempt == self.retries:
                    return (NETWORK_ERROR_STATUS, "", b"", "")
                time.sleep(sleep)
                sleep *= 2
                continue
            if st in _RETRYABLE_STATUS and attempt < self.retries:
                time.sleep(sleep)
                sleep *= 2
                continue
            return (st, ct, body, loc)
        return (NETWORK_ERROR_STATUS, "", b"", "")  # pragma: no cover

    # -- batch signature (same as FixtureFetcher) ------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url_canon").to_pylist()
        if "crawl_delay" in batch.column_names and self.honor_delay:
            delays = batch.column("crawl_delay") \
                .to_numpy(zero_copy_only=False)
        else:
            delays = np.zeros(len(urls))
        n = len(urls)
        status = np.empty(n, np.int32)
        ctypes: list[str] = [""] * n
        bodies: list[bytes] = [b""] * n
        locs: list[str] = [""] * n
        for i, u in enumerate(urls):
            st, ct, body, loc = self.fetch_one(u, float(delays[i]))
            status[i], ctypes[i], bodies[i], locs[i] = st, ct, body, loc
        out = batch.append_column("status", pa.array(status, pa.int32()))
        out = out.append_column("content_type",
                                pa.array(ctypes, pa.string()))
        out = out.append_column("body", pa.array(bodies, pa.binary()))
        return out.append_column("location", pa.array(locs, pa.string()))


class HttpRobotsGate:
    """Robots gate (SURVEY.md A2) whose robots.txt bodies come over the
    WIRE: per-actor TTL'd rule cache, lazily fetched with an internal
    ``HttpFetcher`` (connection reuse, retries), parsed by the shared
    ``parse_robots``. Same batch semantics as ``RobotsFilter`` — drop
    disallowed URLs, attach ``crawl_delay``. Hosts whose robots.txt is
    unreachable (network error) or absent (404) crawl unrestricted,
    the standard permissive convention.
    """

    def __init__(self, resolve=None, timeout: float = 10.0,
                 retries: int = 2, backoff: float = 0.1,
                 ttl_seconds: float = float("inf"),
                 max_cached_hosts: int = 100_000, clock=None):
        from ..functions.robots import RobotsRules, parse_robots
        self._parse = parse_robots
        self._default_cls = RobotsRules
        self._http = HttpFetcher(resolve=resolve, timeout=timeout,
                                 retries=retries, backoff=backoff,
                                 honor_delay=False)
        self._rules: dict = {}
        self._expiry: dict[str, float] = {}
        self._ttl = ttl_seconds
        self._max_cached = max_cached_hosts
        self._clock = clock or time.monotonic

    def _rules_for(self, host: str):
        now = self._clock()
        r = self._rules.get(host)
        if r is None or self._expiry.get(host, float("inf")) <= now:
            st, _, body, _ = self._http.fetch_one(
                f"http://{host}/robots.txt")
            r = self._parse(body) if st == 200 else self._default_cls()
            if len(self._rules) >= self._max_cached:
                self._rules.clear()
                self._expiry.clear()
            self._rules[host] = r
            self._expiry[host] = now + self._ttl
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .robots_gate import RobotsFilter
        for host in set(batch.column("host").to_pylist()):
            self._rules_for(host)
        return RobotsFilter(self._rules)(batch)


# ---------------------------------------------------------------------------
# Loopback origin server for e2e tests: serves a fixture-web pa.Table
# over real HTTP, routed by Host header, keep-alive enabled. The handler
# reproduces exactly what the table says (status, content type, body,
# Location), so crawling through it must equal crawling the table.
# ---------------------------------------------------------------------------


class FixtureWebServer:
    """``with FixtureWebServer(web) as srv: ... srv.port ...``

    ``fail_first`` maps url -> k: the first k GETs of that url return
    503 (retry/backoff testing). ``request_log`` records
    ``(host, path, t_monotonic, status)`` per request for politeness
    spacing assertions.
    """

    def __init__(self, web: pa.Table, fail_first: dict[str, int] | None = None):
        index: dict[str, tuple[int, str, bytes, str]] = {}
        for i in range(web.num_rows):
            url = web.column("url_canon")[i].as_py()
            index[url] = (int(web.column("status")[i].as_py()),
                          web.column("content_type")[i].as_py() or "",
                          web.column("body")[i].as_py() or b"",
                          web.column("location")[i].as_py() or "")
        self.request_log: list[tuple[str, str, float, int]] = []
        self.connections_opened = 0
        fails = dict(fail_first or {})
        lock = threading.Lock()
        log = self.request_log
        srv = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"   # keep-alive

            def setup(self):
                with lock:
                    srv.connections_opened += 1
                super().setup()

            def do_GET(self):              # noqa: N802 (stdlib name)
                host = (self.headers.get("Host") or "").split(":")[0]
                url = f"http://{host}{self.path}"
                with lock:
                    remaining = fails.get(url, 0)
                    if remaining > 0:
                        fails[url] = remaining - 1
                if remaining > 0:
                    st, ct, body, loc = 503, "text/plain", b"retry", ""
                else:
                    st, ct, body, loc = index.get(
                        url, (404, "text/plain", b"not found", ""))
                with lock:
                    log.append((host, self.path, time.monotonic(), st))
                self.send_response(st)
                if ct:
                    self.send_header("Content-Type", ct)
                if loc:
                    self.send_header("Location", loc)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):      # silence stderr chatter
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port: int = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "FixtureWebServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)

    @property
    def resolve(self) -> tuple[str, int]:
        """The ``HttpFetcher(resolve=...)`` value routing every host
        here."""
        return ("127.0.0.1", self.port)
