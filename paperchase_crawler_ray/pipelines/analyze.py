"""Post-crawl analysis over a crawl output directory.

``host_link_graph`` distills the landed frontier + admitted logs into a
host-level weighted edge list — the input the graph operators
(``ops/graph.pagerank`` / ``connected_components``) consume, closing
the crawl -> graph-analytics loop: rank which hosts the crawl's link
structure points at, entirely from the checkpointed on-disk artifacts
(no re-crawl, no driver materialization of the frontier).

Shape: both logs are read column-pruned; child hosts come from the
vectorized canonicalizer; the parent side is resolved with the
broadcast lookup join on ``parent_hash -> admitted.url_hash`` (the
admitted log's narrow (hash, host) projection is the SMALL side by
construction — one row per fetched page), then ONE hash aggregate
counts (src_host, dst_host) pairs.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray.data

from ..functions.urlnorm import canonicalize, extract_host
from ..ops.relational import broadcast_lookup_join, exact_dedup


def _wave_files(out_dir: str, sub: str) -> list[str]:
    files = []
    for wd in sorted(glob.glob(os.path.join(out_dir, "wave=*"))):
        if not os.path.exists(os.path.join(wd, "_COMMITTED")):
            continue  # ignore a torn wave — same rule as crawl resume
        files.extend(sorted(glob.glob(os.path.join(wd, sub, "*.parquet"))))
    return files


def host_link_graph(out_dir: str) -> ray.data.Dataset:
    """(src_host, dst_host, n_links) from a committed crawl output.

    Every frontier row is one discovered link (child url, parent_hash);
    seed rows (parent_hash == 0) carry no source host and are dropped.
    """
    fr_files = _wave_files(out_dir, "frontier")
    adm_files = _wave_files(out_dir, "admitted")
    if not fr_files or not adm_files:
        raise FileNotFoundError(f"no committed crawl waves in {out_dir}")
    frontier = ray.data.read_parquet(fr_files,
                                     columns=["url", "parent_hash"])
    admitted = ray.data.read_parquet(adm_files,
                                     columns=["url_hash", "host"])
    # the admitted log can contain a hash at most once per crawl, but
    # dedup defensively so the lookup join's unique-key contract holds
    parents = exact_dedup(admitted, ["url_hash"], [("url_hash", False)])

    def child_host(b: pa.Table) -> pa.Table:
        hosts = [extract_host(canonicalize(u))
                 for u in b.column("url").to_pylist()]
        return pa.table({"dst_host": pa.array(hosts, pa.string()),
                         "parent_hash": b.column("parent_hash")})

    links = frontier.map_batches(child_host, batch_format="pyarrow") \
        .filter(expr="parent_hash != 0")
    joined = broadcast_lookup_join(links, "parent_hash", parents,
                                   "url_hash", ["host"])

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"src_host": b.column("host"),
                         "dst_host": b.column("dst_host")})

    pairs = joined.map_batches(project, batch_format="pyarrow")
    counts = pairs.groupby(["src_host", "dst_host"]).count()
    return counts.map_batches(
        lambda b: b.rename_columns(
            ["src_host", "dst_host", "n_links"]),
        batch_format="pyarrow")


def host_pagerank(out_dir: str, iters: int = 8) -> ray.data.Dataset:
    """PageRank over the crawl's host link graph (weights collapsed to
    simple edges — repeated links between the same hosts count once,
    matching the unweighted fixed-point op)."""
    from ..ops.graph import pagerank
    edges = host_link_graph(out_dir).map_batches(
        lambda b: pa.table({"a": b.column("src_host"),
                            "b": b.column("dst_host")}),
        batch_format="pyarrow")
    return pagerank(edges, iters=iters)
