"""Single-threaded pure-Python oracle crawler (SURVEY.md §3.3).

This is the sandbox stand-in for the reference crawler's own test flows
(the reference tree at /root/reference was empty — SURVEY.md §0): it
implements the SAME crawl spec as the distributed engine, independently
(plain dicts/sets/sorts, no Ray), so the end-to-end golden test can check
crawl-ordering equality, final URL-seen-set equality and per-row image
invariants (BASELINE.json:14,15).

Shared spec constants live in ``CrawlConfig``; shared primitives
(canonicalize, hashing, parsing, codecs, phash, robots) are imported from
``functions/`` so both sides agree by construction — the crawl LOOP here
is written from scratch.
"""

from __future__ import annotations

import unicodedata
import re
from dataclasses import dataclass, field

import numpy as np

from .functions.codec import decode, sniff_format
from .functions.htmlparse import parse_page
from .functions.phash import hamming64, phash64
from .functions.robots import parse_robots, RobotsRules
from .functions.urlnorm import canonicalize, extract_host, url_hash64

_WS_RE = re.compile(r"\s+")


def normalize_caption(s: str) -> str:
    """M11: unicode NFC + whitespace collapse + strip (part of the spec)."""
    return _WS_RE.sub(" ", unicodedata.normalize("NFC", s)).strip()


def score_priority(depth: int) -> float:
    """M12: deterministic priority for a newly discovered URL."""
    return 1.0 / (1.0 + depth)


@dataclass(frozen=True)
class CrawlConfig:
    max_depth: int = 3
    host_budget: int = 8          # URLs admitted per host per wave
    wave_seconds: float = 8.0     # virtual-clock wave length for crawl-delay
    defer_decay: float = 0.9      # priority decay for deferred rows
    host_suffix: str = ".example"  # scope allowlist
    neardup_hamming: int = 2      # U3 suppression threshold
    max_waves: int = 8

    def host_wave_budget(self, crawl_delay: float) -> int:
        if crawl_delay <= 0:
            return self.host_budget
        return min(self.host_budget, max(1, int(self.wave_seconds / crawl_delay)))


@dataclass
class OracleResult:
    admitted_per_wave: list[list[str]] = field(default_factory=list)
    seen_hashes: set[int] = field(default_factory=set)
    image_rows: list[dict] = field(default_factory=list)
    counters: dict = field(default_factory=dict)


def dedup_winner_key(depth: int, parent_hash: int, priority: float) -> tuple:
    """U2 deterministic winner order: min (depth, parent_hash, -priority)."""
    return (depth, parent_hash, -priority)


def _dedup_wave(rows: list[dict]) -> list[dict]:
    """U2: exact within-wave dedup by url_hash, deterministic winner."""
    best: dict[int, dict] = {}
    for r in rows:
        cur = best.get(r["url_hash"])
        if cur is None or dedup_winner_key(r["depth"], r["parent_hash"], r["priority"]) < \
                dedup_winner_key(cur["depth"], cur["parent_hash"], cur["priority"]):
            best[r["url_hash"]] = r
    return list(best.values())


def crawl_oracle(web: dict[str, dict], seeds: list[tuple[str, int, float]],
                 cfg: CrawlConfig = CrawlConfig()) -> OracleResult:
    """Run the full crawl spec single-threaded over a fixture web.

    ``web`` maps canonical URL -> {status, content_type, body, location}.
    ``seeds`` is a list of (url, seed_id, priority).
    """
    res = OracleResult()
    robots_cache: dict[str, RobotsRules] = {}
    img_seen: set[int] = set()
    counters = {"discovered": 0, "deduped": 0, "seen_dropped": 0,
                "robots_dropped": 0, "admitted": 0, "deferred": 0,
                "fetched": 0, "errors": 0, "images_landed": 0,
                "neardup_suppressed": 0}

    def robots_for(host: str) -> RobotsRules:
        if host not in robots_cache:
            row = web.get(f"http://{host}/robots.txt")
            robots_cache[host] = parse_robots(row["body"]) if row else RobotsRules()
        return robots_cache[host]

    frontier: list[dict] = []
    for url, seed_id, priority in seeds:
        frontier.append({"url": url, "depth": 0, "priority": priority,
                         "parent_hash": 0, "seed_id": seed_id})

    for wave in range(cfg.max_waves):
        if not frontier:
            break
        # M1-M3 + M7 scope
        rows = []
        for r in frontier:
            canon = canonicalize(r["url"])
            if not canon.startswith(("http://", "https://")):
                continue
            host = extract_host(canon)
            if not host.endswith(cfg.host_suffix) or r["depth"] > cfg.max_depth:
                continue
            rows.append({**r, "url_canon": canon, "url_hash": url_hash64(canon),
                         "host": host})
        counters["discovered"] += len(frontier)
        deduped = _dedup_wave(rows)
        counters["deduped"] += len(rows) - len(deduped)
        # seen filter (contains only; insert happens at admission)
        unseen = [r for r in deduped if r["url_hash"] not in res.seen_hashes]
        counters["seen_dropped"] += len(deduped) - len(unseen)
        # robots gate
        gated = []
        for r in unseen:
            rb = robots_for(r["host"])
            path = "/" + r["url_canon"].split("://", 1)[-1].split("/", 1)[-1] \
                if "/" in r["url_canon"].split("://", 1)[-1] else "/"
            if rb.allowed(path):
                r["crawl_delay"] = rb.crawl_delay
                gated.append(r)
        counters["robots_dropped"] += len(unseen) - len(gated)
        # A3 politeness: per-host total order + budget
        by_host: dict[str, list[dict]] = {}
        for r in gated:
            by_host.setdefault(r["host"], []).append(r)
        admitted, deferred = [], []
        for host, hrows in by_host.items():
            hrows.sort(key=lambda r: (-r["priority"], r["depth"], r["url_hash"]))
            budget = cfg.host_wave_budget(hrows[0]["crawl_delay"])
            admitted.extend(hrows[:budget])
            for r in hrows[budget:]:
                r = dict(r)
                r["priority"] *= cfg.defer_decay
                deferred.append(r)
        counters["admitted"] += len(admitted)
        counters["deferred"] += len(deferred)
        admitted.sort(key=lambda r: (-r["priority"], r["depth"], r["url_hash"]))
        res.admitted_per_wave.append([r["url_canon"] for r in admitted])
        for r in admitted:
            res.seen_hashes.add(r["url_hash"])
        # A4 fetch + M4 parse
        next_frontier: list[dict] = list(deferred)
        wave_images: list[dict] = []
        for r in admitted:
            row = web.get(r["url_canon"])
            if row is None or row["status"] == 404:
                counters["errors"] += 1
                continue
            counters["fetched"] += 1
            if row["status"] == 301 and row["location"]:
                next_frontier.append({"url": row["location"], "depth": r["depth"],
                                      "priority": r["priority"],
                                      "parent_hash": r["url_hash"], "seed_id": r["seed_id"]})
                continue
            if not row["content_type"].startswith("text/html"):
                continue
            page = parse_page(row["body"], r["url_canon"])
            for link in page.outlinks:
                next_frontier.append({"url": link, "depth": r["depth"] + 1,
                                      "priority": score_priority(r["depth"] + 1),
                                      "parent_hash": r["url_hash"], "seed_id": r["seed_id"]})
            for src, caption in page.images:
                src_canon = canonicalize(src)
                ih = url_hash64("img:" + src_canon)
                if ih in img_seen:
                    continue
                img_seen.add(ih)
                irow = web.get(src_canon)
                if irow is None or irow["status"] != 200 or \
                        not irow["content_type"].startswith("image/"):
                    counters["errors"] += 1
                    continue
                data = irow["body"]
                fmt = sniff_format(data)
                if not fmt or fmt == "gif":
                    continue  # gif unsupported
                px = decode(data, fmt)
                wave_images.append({
                    "image_id": src_canon, "bytes": data,
                    "w": px.shape[1], "h": px.shape[0], "fmt": fmt,
                    "caption": normalize_caption(caption),
                    "phash": phash64(px),
                })
        # U3 near-dup suppression within the wave, per phash-prefix bucket
        wave_images.sort(key=lambda d: d["image_id"])
        kept: list[dict] = []
        by_bucket: dict[int, list[dict]] = {}
        for d in wave_images:
            b = int(np.int64(d["phash"]).view(np.uint64) >> np.uint64(48))
            bucket = by_bucket.setdefault(b, [])
            dup = any(
                int(hamming64(np.array([d["phash"]]), np.array([k["phash"]]))[0])
                <= cfg.neardup_hamming for k in bucket
            )
            if dup:
                counters["neardup_suppressed"] += 1
            else:
                bucket.append(d)
                kept.append(d)
        counters["images_landed"] += len(kept)
        res.image_rows.extend(kept)
        frontier = next_frontier
    res.counters = counters
    return res


def web_table_to_dict(table) -> dict[str, dict]:
    """pa.Table (WEB_FIXTURE schema) -> dict keyed by url_canon."""
    cols = table.to_pydict()
    return {
        u: {"status": s, "content_type": c, "body": b, "location": l}
        for u, s, c, b, l in zip(cols["url_canon"], cols["status"],
                                 cols["content_type"], cols["body"], cols["location"])
    }
