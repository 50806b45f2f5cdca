"""Skew-stressed scaling protocol (VERDICT r4 next #5): the sustained
crawl on an ADVERSARIAL frontier — 80% of all URLs on ONE host — run at
2 and 8 pinned CPUs in fresh processes on the same cached input.

The politeness/dedup exchange is the crawl's one mandatory host-keyed
shuffle, so an 80%-hot-host frontier is its worst key distribution:
one partition receives 80% of the rows. The mitigations under test are
(a) the block-local pre-dedup combiner ahead of the shuffle, (b) the
budget cap bounding the hot partition's output, and (c) the unkeyed
rebalance fanning the post-admission payload chain (fetch/parse/
decode) back out to full width — the hot host must not serialize the
wide stages, only its own (vectorized) schedule sort.

Prints one JSON line: {"efficiency": ..., "hot_share": 0.8, "runs":
{2: {...}, 8: {...}}} — same shape as bench.py's scaling block.

Usage: python tools/skew_scaling.py            (protocol, both sides)
       python tools/skew_scaling.py --child --cpus N   (one side)
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SHARE = 0.8
HOSTS = 64
PAGES = int(os.environ.get("GRAFT_SKEW_PAGES", "96000"))
IMG_SCALE = 3
CPUS = (2, 8)
CACHE = "/tmp/pc_bench_cache"


def _skewed_web():
    import pyarrow.parquet as pq
    from paperchase_crawler_ray.fixtures import make_web
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(
        CACHE, f"web_skew_h{HOSTS}_p{PAGES}_s{IMG_SCALE}_hot80.parquet")
    if os.path.exists(path):
        return pq.read_table(path)
    web = make_web(n_hosts=HOSTS, total_pages=PAGES,
                   materialize_images=False, img_scale=IMG_SCALE,
                   hot_share=HOT_SHARE)
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(web, tmp)
    os.replace(tmp, path)
    return web


def run_side(num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from bench import _mem_evidence, _sustained_seeds, _warmup
    from paperchase_crawler_ray.fixtures import _pages_per_host, host_name
    from paperchase_crawler_ray.oracle import CrawlConfig
    from paperchase_crawler_ray.pipelines.crawl import RunConfig, crawl
    import numpy as np
    import pyarrow as pa

    _warmup(num_cpus)
    web = _skewed_web()
    # skewed seeds: every page URL of the skewed distribution
    per_host = _pages_per_host(HOSTS, PAGES, HOT_SHARE)
    urls = [f"http://{host_name(i)}/p/{j}"
            for i in range(HOSTS) for j in range(per_host[i])]
    urls += [u + "#dup" for u in urls[::3]]   # U2 dedup load rides along
    seeds = pa.table({
        "url": pa.array(urls, pa.string()),
        "seed_id": pa.array((np.arange(len(urls)) % 2**31)
                            .astype(np.int32), pa.int32()),
        "priority": pa.array(np.ones(len(urls)), pa.float64())})

    out_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = tempfile.mkdtemp(prefix="pc_skew_", dir=out_base)
    cfg = CrawlConfig(max_waves=1, host_budget=1 << 30, wave_seconds=1e12)
    run = RunConfig(nshards=8, lazy_images=True, img_scale=IMG_SCALE,
                    host_partitions=max(4, num_cpus // 2),
                    neardup_partitions=max(4, num_cpus // 2),
                    neardup_driver_max=20_000,
                    fetch_parallelism=num_cpus * 2,
                    image_parallelism=num_cpus * 16,
                    fetch_concurrency=max(2, num_cpus // 2),
                    fetch_batch_size=128, image_batch_size=32,
                    sched_mode=os.environ.get("GRAFT_SCHED_MODE",
                                              "salted"))
    t0 = time.monotonic()
    res = crawl(web, seeds, out, cfg, run, resume=False)
    wall = time.monotonic() - t0
    c = res.counters
    mem = _mem_evidence()
    shutil.rmtree(out, ignore_errors=True)
    hot = c.get("hot_hosts", {}).get(0, [])
    return {
        "wall_sec": round(wall, 3),
        "frontier_rows": c["frontier_rows"],
        "admitted": c["admitted"],
        "images_landed": c["images_landed"],
        "urls_per_sec": round(c["frontier_rows"] / wall, 1),
        "images_per_sec": round(c["images_landed"] / wall, 1),
        "hot_host_top1": hot[0] if hot else None,
        **mem,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--runs-per-side", type=int, default=int(
        os.environ.get("GRAFT_SCALING_RUNS", "3")))
    args = ap.parse_args()
    if args.child:
        print(json.dumps(run_side(args.cpus)))
        return
    _skewed_web()   # build the cache once, outside the timed children
    runs = {}
    for n in CPUS:
        best = None
        for _ in range(args.runs_per_side):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", "--cpus", str(n)]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
            p = subprocess.run(cmd, capture_output=True, text=True,
                               check=True,
                               cwd=os.path.dirname(os.path.dirname(
                                   os.path.abspath(__file__))))
            r = json.loads(p.stdout.strip().splitlines()[-1])
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        runs[n] = best
    n1, n2 = CPUS
    eff = runs[n2]["urls_per_sec"] / (4 * runs[n1]["urls_per_sec"])
    print(json.dumps({
        "metric": f"skew-stressed crawl scaling ({int(HOT_SHARE*100)}% "
                  f"of URLs on one host, {n1} vs {n2} pinned CPUs)",
        "efficiency": round(eff, 3),
        "hot_share": HOT_SHARE, "pages": PAGES,
        "runs_per_side": args.runs_per_side,
        "cpus": list(CPUS), "runs": runs,
    }))


if __name__ == "__main__":
    main()
