"""CLI entry point — the `ray job submit` surface (SURVEY.md §3.1):

    ray job submit -- python -m paperchase_crawler_ray \\
        --seeds seeds.parquet --web web.parquet --out /data/crawl \\
        --waves 8 --host-budget 8

In this sandbox there is no network, so the "web" is a fixture parquet
table (WEB_FIXTURE schema) or the built-in deterministic generator
(``--web fixture:<hosts>:<pages>``); in production the fetch stage would
be swapped for an HTTP client (stages/fetch.py docstring).

Owns the Ray session (guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .fixtures import make_web
from .oracle import CrawlConfig
from .pipelines.crawl import RunConfig, crawl
from .sources import read_seeds


def _load_web(spec: str) -> pa.Table:
    if spec.startswith("fixture:"):
        parts = spec.split(":")
        return make_web(n_hosts=int(parts[1]), total_pages=int(parts[2]),
                        materialize_images=len(parts) < 4 or parts[3] != "lazy")
    return pq.read_table(spec)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="paperchase_crawler_ray")
    ap.add_argument("--pipeline", choices=("crawl", "prep", "image-prep"),
                    default="crawl",
                    help="crawl = frontier/fetch loop; prep = document "
                         "filter->dedup->chunk through the resumable sink")
    ap.add_argument("--seeds",
                    help="parquet/text seed list, or fixture:<n>:<hosts>")
    ap.add_argument("--web",
                    help="WEB_FIXTURE parquet, or fixture:<hosts>:<pages>[:lazy]")
    ap.add_argument("--docs", help="documents parquet (--pipeline prep)")
    ap.add_argument("--images",
                    help="image_caption parquet (--pipeline image-prep)")
    ap.add_argument("--out", required=True, help="checkpointed output dir")
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--host-budget", type=int, default=8)
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--scope-suffix", default=".example")
    ap.add_argument("--nshards", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--lazy-images", action="store_true",
                    help="synthesize image bytes in the fetch stage")
    args = ap.parse_args(argv)

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False)

    if args.pipeline == "prep":
        if not args.docs:
            ap.error("--pipeline prep requires --docs")
        from .pipelines.prep import prep_documents
        res = prep_documents(args.docs, args.out, num_shards=args.nshards)
        print(json.dumps({"out_dir": args.out, **res}))
    elif args.pipeline == "image-prep":
        if not args.images:
            ap.error("--pipeline image-prep requires --images")
        from .pipelines.prep import prep_images
        res = prep_images(args.images, args.out, num_shards=args.nshards)
        print(json.dumps({"out_dir": args.out, **res}))
    else:
        if not (args.seeds and args.web):
            ap.error("--pipeline crawl requires --seeds and --web")
        cfg = CrawlConfig(max_waves=args.waves, host_budget=args.host_budget,
                          max_depth=args.max_depth,
                          host_suffix=args.scope_suffix)
        run = RunConfig(nshards=args.nshards, lazy_images=args.lazy_images)
        res = crawl(_load_web(args.web), read_seeds(args.seeds), args.out,
                    cfg, run, resume=not args.no_resume)
        print(json.dumps({"waves_run": res.waves_run, "out_dir": res.out_dir,
                          "counters": {k: v for k, v in res.counters.items()
                                       if k != "hot_hosts"}}))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
