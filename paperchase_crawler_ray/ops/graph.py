"""Iterative distributed graph operators: connected components (min-label
propagation) and PageRank (fixed-point integer arithmetic).

Both are the classic bulk-synchronous iteration expressed Ray-Data-first:
the EDGE LIST is the big table and every superstep streams over it once
with ``map_batches`` doing per-block PARTIAL aggregation (groupby-min /
groupby-sum inside the block), so only pre-shrunk (node, value) partials
ever leave a block.  The node-side table (labels / scores, O(V)) is the
small side and rides the standard size-based switch the dedup and
anti-join ops use:

- ``mode="broadcast"`` (default): the node table lives in a ``ray.put``
  object; per-block partials are collected and merged on the driver
  (O(V) driver memory — the broadcast-side assumption).  One distributed
  edge scan + one tiny merge per superstep; no shuffle, no join.
- ``mode="join"``: the node table stays a Dataset and each superstep is
  a keyed ``Dataset.join`` + hash aggregate — the path for a node table
  beyond driver memory (V ~ 10^9 at the 10^10-edge scale target).  Same
  results, bit-for-bit, at ~10x the per-superstep cost on a small
  cluster (aggregator-actor spin-up dominates), which is why it is not
  the default below the threshold.

Determinism: PageRank runs in integer micro-units (int64 scores, floor
division for share splitting) so results are bit-identical across block
orders and match the single-threaded naive twin exactly — the same
policy the driver contract uses for float-sensitive aggregates
(``__ray_entry__`` float policy).  Connected components propagates
min-labels, order-independent by construction.  Both modes therefore
agree exactly, which the tests assert.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from .relational import cap_join_partitions
from .relational import scrub_empty_blocks as _scrub

__all__ = ["connected_components", "pagerank"]


def _damped(sc: "np.ndarray", damping_ppm: int) -> "np.ndarray":
    """floor(sc * damping_ppm / 1e6) WITHOUT int64 overflow: splitting
    sc = a*1e6 + b gives the exact identity a*d + (b*d)//1e6 (the first
    term's product was divisible by 1e6), so hub scores can hold the
    whole graph's mass (~9e18 micro-units) before wrapping — a plain
    sc*d would wrap at ~1e13 (found in review; silently corrupted
    scores on >1e7-node mass concentrations)."""
    a, b = np.divmod(sc, np.int64(1_000_000))
    return a * np.int64(damping_ppm) + (b * np.int64(damping_ppm)) \
        // np.int64(1_000_000)


def _undirect(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    """(a,b) -> both directions, columns (src, dst)."""
    fwd = edges.map_batches(
        lambda b: pa.table({"src": b.column(src), "dst": b.column(dst)}),
        batch_format="pyarrow")
    rev = edges.map_batches(
        lambda b: pa.table({"src": b.column(dst), "dst": b.column(src)}),
        batch_format="pyarrow")
    return fwd.union(rev)


def _labels_table(labels: dict) -> ray.data.Dataset:
    nodes = sorted(labels)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes),
        "component": pa.array([labels[n] for n in nodes])}))


def connected_components(edges: ray.data.Dataset, src: str = "a",
                         dst: str = "b", max_iters: int = 50,
                         mode: str = "broadcast") -> ray.data.Dataset:
    """Undirected connected components by min-label propagation.

    Returns (node, component) where component is the smallest node id in
    the node's component.  Each superstep proposes
    ``min(own label, neighbors' labels)`` for every node; broadcast mode
    additionally applies full path compression on the driver's O(V)
    label map each round (the pointer-jumping analog), so convergence is
    O(log diameter) supersteps.  Join mode applies one pointer-jumping
    shortcut per round (label <- label(label)) via a self-join.
    """
    if mode == "join":
        return _components_join(edges, src, dst, max_iters)
    und = _undirect(edges, src, dst).materialize()

    def block_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(b.column("src"))})

    labels: dict = {}
    for t in und.map_batches(block_nodes, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        for n in t.column("node").to_pylist():
            labels[n] = n

    for _ in range(max_iters):
        ref = ray.put(labels)

        def propose(b: pa.Table) -> pa.Table:
            m = ray.get(ref)
            d = pd.DataFrame({
                "node": b.column("dst").to_pandas(),
                "lab": b.column("src").to_pandas().map(m)})
            part = d.groupby("node", sort=False)["lab"].min()
            return pa.table({"node": pa.array(part.index),
                             "lab": pa.array(part.values)})

        changed = False
        for t in und.map_batches(propose, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow", batch_size=None):
            for n, lab in zip(t.column("node").to_pylist(),
                              t.column("lab").to_pylist()):
                if lab < labels[n]:
                    labels[n] = lab
                    changed = True
        if not changed:
            break
        # full path compression on the driver map (pointer jumping):
        # chains collapse to their round-min root before the next scan
        for n in labels:
            r = labels[n]
            while labels[r] != r:
                r = labels[r]
            labels[n] = r
    return _labels_table(labels)


def _components_join(edges: ray.data.Dataset, src: str, dst: str,
                     max_iters: int) -> ray.data.Dataset:
    """Keyed-join scale path: node table stays distributed end to end."""
    und = _undirect(edges, src, dst).materialize()
    labels = und.map_batches(
        lambda b: pa.table({"node": b.column("src")}), batch_format="pyarrow"
    ).groupby("node").aggregate(Min("node", alias_name="label"))
    labels = _scrub(labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "label": b.column("node")}),
        batch_format="pyarrow"))

    for _ in range(max_iters):
        # message passing: each edge forwards src's label to dst
        msgs = und.join(labels, join_type="inner",
                        num_partitions=cap_join_partitions(8),
                        on=("src",), right_on=("node",))
        inbox = msgs.map_batches(
            lambda b: pa.table({"node": b.column("dst"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        proposed = _scrub(inbox.union(labels).groupby("node").aggregate(
            Min("label", alias_name="new_label")))
        joined = _scrub(proposed.join(
            labels, join_type="inner",
            num_partitions=cap_join_partitions(8),
            on=("node",), right_on=("node",)))
        changed = joined.map_batches(
            lambda b: pa.table({"c": pc.cast(
                pc.not_equal(b.column("new_label"), b.column("label")),
                pa.int64())}),
            batch_format="pyarrow").sum("c")
        labels = _scrub(joined.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "label": b.column("new_label")}),
            batch_format="pyarrow"))
        if not changed:
            break
        # pointer jumping: label <- label(label); doubles the distance
        # collapsed per round, so chains converge in O(log diameter)
        jump = labels.join(labels, join_type="left_outer",
                           num_partitions=cap_join_partitions(8),
                           on=("label",), right_on=("node",),
                           right_suffix="_r")
        labels = _scrub(jump.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "label": pc.min_element_wise(
                    b.column("label"),
                    pc.fill_null(b.column("label_r"), b.column("label")))}),
            batch_format="pyarrow"))
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "component": b.column("label")}),
        batch_format="pyarrow")


def pagerank(edges: ray.data.Dataset, src: str = "a", dst: str = "b",
             iters: int = 10, damping_ppm: int = 850_000,
             scale: int = 1_000_000, mode: str = "broadcast"
             ) -> ray.data.Dataset:
    """Directed PageRank in fixed-point integer arithmetic.

    Scores are int64 micro-units (``scale`` = one unit of probability
    mass per node at init).  Each iteration: every node splits
    ``damping_ppm``-per-million of its score equally over its out-edges
    with FLOOR division (the dropped remainder, like the dangling-node
    mass, is implicitly lost rather than redistributed — documented
    determinism > exact stochasticity), then adds the ``(1 - damping)``
    teleport base.  Integer ops make the result independent of
    block/summation order — bit-identical to the single-threaded twin,
    across any parallelism and across both modes.

    Returns (node, score) with score in micro-units.
    """
    if mode == "join":
        return _pagerank_join(edges, src, dst, iters, damping_ppm, scale)
    e = edges.map_batches(
        lambda b: pa.table({"src": b.column(src), "dst": b.column(dst)}),
        batch_format="pyarrow").materialize()

    def block_deg(b: pa.Table) -> pa.Table:
        part = pd.Series(b.column("src").to_pylist()) \
                 .value_counts(sort=False)
        return pa.table({"node": pa.array(part.index),
                         "n": pa.array(part.values, pa.int64())})

    outdeg: dict = {}
    nodes: set = set()
    for t in e.map_batches(block_deg, batch_format="pyarrow") \
             .iter_batches(batch_format="pyarrow", batch_size=None):
        for n, c in zip(t.column("node").to_pylist(),
                        t.column("n").to_pylist()):
            outdeg[n] = outdeg.get(n, 0) + c
    for t in e.map_batches(
            lambda b: pa.table({"node": pc.unique(b.column("dst"))}),
            batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        nodes.update(t.column("node").to_pylist())
    nodes.update(outdeg)
    base = scale - scale * damping_ppm // 1_000_000
    deg_ref = ray.put(outdeg)
    scores = {n: scale for n in nodes}

    for _ in range(iters):
        sref = ray.put(scores)

        def share(b: pa.Table) -> pa.Table:
            s, dgs = ray.get(sref), ray.get(deg_ref)
            srcs = b.column("src").to_pandas()
            sc = srcs.map(s).to_numpy(np.int64)
            dg = srcs.map(dgs).to_numpy(np.int64)
            out = _damped(sc, damping_ppm) // dg
            part = pd.DataFrame({"node": b.column("dst").to_pandas(),
                                 "g": out}).groupby("node", sort=False)[
                                     "g"].sum()
            return pa.table({"node": pa.array(part.index),
                             "g": pa.array(part.values, pa.int64())})

        gain: dict = {}
        for t in e.map_batches(share, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow", batch_size=None):
            for n, g in zip(t.column("node").to_pylist(),
                            t.column("g").to_pylist()):
                gain[n] = gain.get(n, 0) + g
        scores = {n: gain.get(n, 0) + base for n in nodes}
    srt = sorted(scores)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(srt),
        "score": pa.array([scores[n] for n in srt], pa.int64())}))


def _pagerank_join(edges: ray.data.Dataset, src: str, dst: str, iters: int,
                   damping_ppm: int, scale: int) -> ray.data.Dataset:
    """Keyed-join scale path: scores stay a distributed Dataset."""
    e = edges.map_batches(
        lambda b: pa.table({"src": b.column(src), "dst": b.column(dst)}),
        batch_format="pyarrow").materialize()
    # out-degrees ride along every superstep join (computed once)
    deg = e.map_batches(
        lambda b: pa.table({"src": b.column("src"),
                            "one": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow").groupby("src").aggregate(
            Sum("one", alias_name="outdeg"))
    deg = _scrub(deg)
    # node universe: every endpoint
    nodes = _undirect(e, "src", "dst").map_batches(
        lambda b: pa.table({"node": b.column("src")}), batch_format="pyarrow"
    ).groupby("node").aggregate(Min("node", alias_name="_"))
    nodes = _scrub(nodes.select_columns(["node"]))
    base = scale - scale * damping_ppm // 1_000_000

    scores = _scrub(nodes.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "score": pa.array(
                                np.full(b.num_rows, scale, np.int64))}),
        batch_format="pyarrow"))

    e_deg = _scrub(e.join(deg, join_type="inner",
                          num_partitions=cap_join_partitions(8),
                          on=("src",), right_on=("src",)))

    for _ in range(iters):
        contrib = e_deg.join(scores, join_type="inner",
                             num_partitions=cap_join_partitions(8),
                             on=("src",), right_on=("node",))

        def share(b: pa.Table) -> pa.Table:
            s = b.column("score").to_numpy(zero_copy_only=False)
            d = b.column("outdeg").to_numpy(zero_copy_only=False)
            out = _damped(s, damping_ppm) // d
            return pa.table({"node": b.column("dst"),
                             "in_share": pa.array(out, pa.int64())})

        inbox = _scrub(contrib.map_batches(share, batch_format="pyarrow")
                       .groupby("node").aggregate(
                           Sum("in_share", alias_name="gain")))
        joined = nodes.join(inbox, join_type="left_outer",
                            num_partitions=cap_join_partitions(8),
                            on=("node",), right_on=("node",))

        def apply(b: pa.Table) -> pa.Table:
            g = pc.fill_null(b.column("gain"), 0)
            return pa.table({"node": b.column("node"),
                             "score": pc.add(g, base)})

        scores = _scrub(joined.map_batches(apply, batch_format="pyarrow"))
    return scores
