"""paperchase_crawler_ray — a Ray-Data-native crawl / data-processing engine.

A from-scratch rebuild of the capabilities of scrappergus/paperchase-crawler
(reference tree at /root/reference was empty at survey time; the functional
spec is SURVEY.md + BASELINE.json's north rule): a URL-frontier + fetch
scheduler (sharded cuckoo-filter URL-seen set with bloom fallback, per-host
politeness-aware priority queue, robots.txt gating) expressed as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, with actor pools / shard actors for stateful stages, landing
image + caption rows into a columnar sink.

Library code NEVER calls ``ray.init()`` / ``ray.shutdown()`` — the session
is owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

