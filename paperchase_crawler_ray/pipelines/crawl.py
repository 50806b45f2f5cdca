"""The crawl lifecycle (SURVEY.md §3.1): a driver-side wave loop where each
wave is one bounded Ray Data streaming job.

Per wave:
  frontier.parquet -> canonicalize/hash/host/scope -> U2 exact dedup
  (groupby url_hash) -> seen-filter (shard actors) -> robots gate (actor
  pool) -> politeness schedule (groupby host) -> [admitted | deferred]
  admitted -> seen-insert -> fetch (actor pool) -> parse -> parsed.parquet
  parsed -> links + redirects -> (∪ deferred) -> next frontier.parquet
  parsed -> images -> img-seen -> fetch -> decode/phash -> near-dup ->
           images/ sink (wave-partitioned parquet)

Durability (BASELINE.json:14 "resumes exactly from checkpoint"): every
wave directory is committed atomically — frontier for the NEXT wave,
parsed rows, landed images, per-stage lineage counters and the seen-set
shard dumps are all written, then a ``_COMMITTED`` marker. Resume scans
for the last committed wave, restores the shard actors and continues;
a partially-written wave is simply rerun (sink writes are per-wave
directories, seen inserts are idempotent).

Scale notes: the frontier lives in parquet between waves (at 10^10 URLs
it cannot live on the driver); bodies never cross a wave boundary —
parsed rows are compact. The only all-to-all shuffles are the U2 dedup
(key: url_hash, uniform by construction) and the politeness groupby
(key: host — hot hosts are capped by budget on output; their input skew
is bounded by the dedup ahead). The seen set is NOT a shuffle: batches
RPC compact int64 arrays to shard actors (stages/seen.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..fixtures import make_seeds, make_web
from ..oracle import CrawlConfig
from ..schemas import LINEAGE
from ..stages.fetch import FixtureFetcher
from ..stages.frontier import CanonicalizeBatch, dedup_wave_group
from ..stages.image import DecodeImages, canonicalize_image_refs, neardup_suppress_group
from ..stages.parse import explode_images, explode_links, explode_redirects, parse_pages
from ..stages.politeness import PolitenessScheduler
from ..stages.robots_gate import RobotsGate
from ..stages.seen import (SeenCheckAndInsert, SeenInsert, SeenLookup,
                           checkpoint_seen, make_seen_actors, restore_seen,
                           seen_counts)

FRONTIER_FILE_COLS = ["url", "depth", "priority", "parent_hash", "seed_id"]


@dataclass
class RunConfig:
    """Physical knobs, sized per node; logical semantics live in CrawlConfig."""

    nshards: int = 8
    canon_concurrency: int = 2
    robots_concurrency: int = 2
    fetch_concurrency: int = 4
    decode_concurrency: int = 4
    fetch_batch_size: int = 256
    image_batch_size: int = 64
    frontier_batch_size: int = 4096


@dataclass
class CrawlResult:
    out_dir: str
    waves_run: int = 0
    counters: dict = field(default_factory=dict)
    lineage: list[dict] = field(default_factory=list)

    def images_dataset(self) -> "ray.data.Dataset":
        dirs = sorted(
            os.path.join(self.out_dir, d, "images")
            for d in os.listdir(self.out_dir)
            if d.startswith("wave=") and os.path.isdir(os.path.join(self.out_dir, d, "images"))
        )
        files = [os.path.join(d, f) for d in dirs
                 for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not files:
            return ray.data.from_arrow(
                pa.table({"image_id": pa.array([], pa.string())}))
        return ray.data.read_parquet(files)

    def admitted_per_wave(self) -> list[list[str]]:
        out = []
        for k in range(self.waves_run):
            path = os.path.join(self.out_dir, f"wave={k}", "admitted")
            if not os.path.isdir(path) or not os.listdir(path):
                out.append([])
                continue
            t = pq.read_table(path)
            idx = np.lexsort((t.column("url_hash").to_numpy(),
                              t.column("depth").to_numpy(zero_copy_only=False),
                              -t.column("priority").to_numpy()))
            out.append([t.column("url_canon").to_pylist()[i] for i in idx])
        return out

    def seen_hashes(self) -> set[int]:
        """U4 seen-set export: exact page-URL seen set = union of admitted
        url_hash across waves (the shard dumps are approximate structures
        for resume; the admitted logs are the exact lineage)."""
        out: set[int] = set()
        for k in range(self.waves_run):
            path = os.path.join(self.out_dir, f"wave={k}", "admitted")
            if os.path.isdir(path) and os.listdir(path):
                t = pq.read_table(path, columns=["url_hash"])
                out.update(t.column("url_hash").to_pylist())
        return out


def _wave_dir(out_dir: str, wave: int) -> str:
    return os.path.join(out_dir, f"wave={wave}")


def _committed(out_dir: str, wave: int) -> bool:
    return os.path.exists(os.path.join(_wave_dir(out_dir, wave), "_COMMITTED"))


def _write_frontier(table: pa.Table, out_dir: str, wave: int) -> None:
    d = os.path.join(_wave_dir(out_dir, wave), "frontier")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table.select(FRONTIER_FILE_COLS), os.path.join(d, "part-0.parquet"))


def _save_seen(handles: list, out_dir: str, wave: int) -> None:
    d = os.path.join(_wave_dir(out_dir, wave), "seen")
    os.makedirs(d, exist_ok=True)
    for i, state in enumerate(checkpoint_seen(handles)):
        np.savez(os.path.join(d, f"shard-{i:03d}.npz"), **state)


def _load_seen(handles: list, out_dir: str, wave: int) -> None:
    d = os.path.join(_wave_dir(out_dir, wave), "seen")
    states = []
    for i in range(len(handles)):
        raw = np.load(os.path.join(d, f"shard-{i:03d}.npz"), allow_pickle=True)
        st = {k: raw[k] for k in raw.files}
        st["mode"] = str(st["mode"])
        st["capacity"] = int(st["capacity"])
        st["promote_at"] = int(st["promote_at"])
        if "size" in st:
            st["size"] = int(st["size"])
        states.append(st)
    restore_seen(handles, states)


def seeds_to_frontier(seeds: pa.Table) -> pa.Table:
    n = seeds.num_rows
    return pa.table(
        {
            "url": seeds.column("url"),
            "depth": pa.array(np.zeros(n, np.int32), pa.int32()),
            "priority": seeds.column("priority"),
            "parent_hash": pa.array(np.zeros(n, np.int64), pa.int64()),
            "seed_id": seeds.column("seed_id"),
        }
    )


def crawl(web: pa.Table, seeds: pa.Table, out_dir: str,
          cfg: CrawlConfig = CrawlConfig(), run: RunConfig = RunConfig(),
          resume: bool = True) -> CrawlResult:
    """Run the full crawl over a fixture web. Ray must already be
    initialised by the caller (driver contract — never ray.init here)."""
    os.makedirs(out_dir, exist_ok=True)
    web_ref = ray.put(web)
    handles = make_seen_actors(run.nshards)
    res = CrawlResult(out_dir=out_dir)

    start_wave = 0
    if resume:
        committed = [k for k in range(cfg.max_waves) if _committed(out_dir, k)]
        if committed:
            last = max(committed)
            _load_seen(handles, out_dir, last)
            start_wave = last + 1
            res.waves_run = start_wave
    if start_wave == 0:
        _write_frontier(seeds_to_frontier(seeds), out_dir, 0)

    counters = {"admitted": 0, "deferred": 0, "fetched_pages": 0,
                "images_landed": 0, "frontier_rows": 0}
    t0 = time.monotonic()
    for wave in range(start_wave, cfg.max_waves):
        wd = _wave_dir(out_dir, wave)
        frontier_dir = os.path.join(wd, "frontier")
        if not os.path.isdir(frontier_dir):
            break
        fr = ray.data.read_parquet(frontier_dir)
        n_frontier = fr.count()
        if n_frontier == 0:
            break
        counters["frontier_rows"] += n_frontier

        prep = fr.map_batches(CanonicalizeBatch, fn_constructor_args=(cfg,),
                              batch_format="pyarrow",
                              batch_size=run.frontier_batch_size,
                              concurrency=(1, run.canon_concurrency))
        ded = prep.groupby("url_hash").map_groups(dedup_wave_group,
                                                  batch_format="pandas")
        unseen = ded.map_batches(SeenLookup(handles), batch_format="pyarrow")
        gated = unseen.map_batches(RobotsGate, fn_constructor_args=(web_ref,),
                                   batch_format="pyarrow",
                                   concurrency=(1, run.robots_concurrency))
        sched_fn = PolitenessScheduler(cfg)
        sched = gated.groupby("host").map_groups(lambda g: sched_fn(g),
                                                 batch_format="pandas")
        sched = sched.materialize()  # wave working set (compact rows, no bodies)

        admitted = sched.map_batches(
            lambda t: t.filter(t.column("admitted")), batch_format="pyarrow")
        deferred = sched.map_batches(
            lambda t: t.filter(pc.invert(t.column("admitted"))).select(
                ["url_canon", "depth", "priority", "parent_hash", "seed_id"]
            ).rename_columns(FRONTIER_FILE_COLS),
            batch_format="pyarrow")

        admitted_dir = os.path.join(wd, "admitted")
        admitted.select_columns(
            ["url_canon", "url_hash", "host", "depth", "priority", "seed_id"]
        ).write_parquet(admitted_dir)
        admitted_w = ray.data.read_parquet(admitted_dir)
        n_admitted = admitted_w.count()
        counters["admitted"] += n_admitted

        # fetch + parse, stream to compact parsed rows
        parsed_dir = os.path.join(wd, "parsed")
        (admitted_w
         .map_batches(SeenInsert(handles), batch_format="pyarrow")
         .map_batches(FixtureFetcher, fn_constructor_args=(web_ref,),
                      batch_format="pyarrow", batch_size=run.fetch_batch_size,
                      concurrency=(1, run.fetch_concurrency), num_cpus=0.5)
         .map_batches(parse_pages, batch_format="pyarrow",
                      batch_size=run.fetch_batch_size)
         .write_parquet(parsed_dir))
        parsed = ray.data.read_parquet(parsed_dir)
        n_parsed = parsed.count()
        counters["fetched_pages"] += n_parsed

        # image branch
        images_dir = os.path.join(wd, "images")
        imgs = (parsed
                .map_batches(explode_images, batch_format="pyarrow")
                .map_batches(canonicalize_image_refs, batch_format="pyarrow")
                .map_batches(SeenCheckAndInsert(handles), batch_format="pyarrow")
                .map_batches(FixtureFetcher, fn_constructor_args=(web_ref,),
                             batch_format="pyarrow",
                             batch_size=run.image_batch_size,
                             concurrency=(1, run.fetch_concurrency), num_cpus=0.5)
                .map_batches(DecodeImages, batch_format="pyarrow",
                             batch_size=run.image_batch_size,
                             concurrency=(1, run.decode_concurrency)))
        imgs = imgs.groupby("bucket").map_groups(
            lambda g: neardup_suppress_group(g, cfg.neardup_hamming),
            batch_format="pandas")
        imgs.write_parquet(images_dir)
        n_images = (ray.data.read_parquet(images_dir).count()
                    if os.path.isdir(images_dir) and os.listdir(images_dir) else 0)
        counters["images_landed"] += n_images

        # links branch -> next frontier (streamed union, parquet-to-parquet)
        links = parsed.map_batches(explode_links, batch_format="pyarrow")
        redirects = parsed.map_batches(explode_redirects, batch_format="pyarrow")
        nxt = (links.select_columns(FRONTIER_FILE_COLS)
               .union(redirects.select_columns(FRONTIER_FILE_COLS))
               .union(deferred.select_columns(FRONTIER_FILE_COLS))
               .materialize())
        n_next = nxt.count()
        counters["deferred"] += int(deferred.count())
        # Always persist the residual frontier — even past max_waves — so a
        # resume with a larger wave budget continues instead of stopping.
        if n_next > 0:
            nxt.write_parquet(os.path.join(_wave_dir(out_dir, wave + 1), "frontier"))

        # lineage + checkpoint + commit marker
        lineage_rows = [
            {"run_id": "r0", "wave": wave, "stage": s, "rows_in": ri,
             "rows_out": ro, "bytes": 0}
            for s, ri, ro in (
                ("frontier", n_frontier, n_frontier),
                ("schedule", n_frontier, n_admitted),
                ("fetch_parse", n_admitted, n_parsed),
                ("images", n_parsed, n_images),
            )
        ]
        res.lineage.extend(lineage_rows)
        pq.write_table(
            pa.Table.from_pylist(lineage_rows, schema=LINEAGE),
            os.path.join(wd, "lineage.parquet"))
        _save_seen(handles, out_dir, wave)
        with open(os.path.join(wd, "_COMMITTED"), "w") as f:
            f.write("ok")
        res.waves_run = wave + 1

    counters["seen_urls"] = seen_counts(handles)
    counters["wall_sec"] = time.monotonic() - t0
    res.counters = counters
    return res


def demo_crawl(out_dir: str, n_hosts: int = 8, total_pages: int = 60,
               n_seeds: int = 4, max_waves: int = 4) -> CrawlResult:
    """Small self-contained crawl over the deterministic fixture web."""
    web = make_web(n_hosts=n_hosts, total_pages=total_pages)
    seeds = make_seeds(n_seeds, n_hosts)
    return crawl(web, seeds, out_dir, CrawlConfig(max_waves=max_waves))
